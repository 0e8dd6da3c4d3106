"""Attribute cameraLens balanced-wavefront time: shadow rays, sort, lanes."""
import time, sys
import numpy as np, jax, jax.numpy as jnp
import nart_tpu.integrators.path as P
from nart_tpu.scene import load_scene
from nart_tpu import render as render_mod, rng, sampling

scene = load_scene("/root/reference/input/scenes/cameraLens.json", asset_root="/root/reference")
import dataclasses

def run(tag, skip_shadow=False, sort=None, lanes=0):
    P._DEBUG_SKIP_SHADOW = skip_shadow
    params = render_mod.RenderParams(image_width=256, image_height=256, spp=4,
                                     bounces=10, filter_width=2.0,
                                     sort_rays=sort, lanes=lanes)
    sess = render_mod.RenderSession(scene, params)
    film, rays = sess.render(with_stats=True)
    t0=time.time(); film, rays = sess.render(with_stats=True); dt=time.time()-t0
    print(f"{tag}: {dt:.2f}s rays {rays:.0f} -> {rays/dt/1e6:.3f} Mrays/s", flush=True)

run("base (sort=auto, lanes=auto)")
run("skip_shadow", skip_shadow=True)
run("no_sort", sort=False)
run("lanes=64k", lanes=65536)
run("lanes=64k skip_shadow", skip_shadow=True, lanes=65536)
