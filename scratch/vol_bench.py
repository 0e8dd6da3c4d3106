import time, dataclasses
import numpy as np, jax
from nart_tpu.scene import load_scene
from nart_tpu import render as render_mod

scene = load_scene("tests/golden/volume_blob.json", asset_root="tests/golden")
base = render_mod.RenderParams(
    image_width=96, image_height=96, spp=32, bounces=64,
    integrator="volume", filter_width=1.0)
for wf in ("spp", "balanced"):
    params = dataclasses.replace(base, wavefront=wf)
    sess = render_mod.RenderSession(scene, params)
    film, rays = sess.render(with_stats=True)
    t0=time.time(); film, rays = sess.render(with_stats=True); dt=time.time()-t0
    print(f"{wf}: {dt:.2f}s rays {rays:.0f} mean={np.asarray(film)[...,:3].mean():.4f}", flush=True)
