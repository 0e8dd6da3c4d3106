import time
import numpy as np, jax, jax.numpy as jnp
from nart_tpu.scene import load_scene
from nart_tpu import render as render_mod
from nart_tpu.render import _setup_jit
import nart_tpu.integrators.path as P

scene = load_scene("/root/reference/input/scenes/cameraLens.json", asset_root="/root/reference")
base = dict(image_width=256, image_height=256, spp=4, bounces=10, filter_width=2.0)
sess0 = render_mod.RenderSession(scene, render_mod.RenderParams(**base))
scene_j = sess0.scene_dev
bvh = sess0.bvh
n = sess0.render_w * sess0.render_h
idx = jnp.arange(n, dtype=jnp.int32)
px, py = idx % sess0.render_w, idx // sess0.render_w
samples, state = _setup_jit(px, py, sess0.total_w, 4)

def run(tag, skip_shadow=False, **kw):
    P._DEBUG_SKIP_SHADOW = skip_shadow
    params = render_mod.RenderParams(**{**base, **kw})
    f = jax.jit(lambda s: P.trace_balanced(scene_j, bvh, s, params,
                                           sess0.render_w, sess0.render_h,
                                           n_lanes=params.lanes))
    la, rays, rounds = f(samples); jax.block_until_ready(la)
    best = 1e9
    for i in range(2):
        s = samples * (1.0 - 0.001*i)
        t0=time.time(); la, rays, rounds = f(s); jax.block_until_ready(la)
        best = min(best, time.time()-t0)
    print(f"{tag}: {best:.2f}s rounds={int(rounds)} -> {float(rays)/best/1e6:.3f} Mrays/s", flush=True)

run("base16k")
run("skip_shadow", skip_shadow=True)
run("nosort", sort_rays=False)
run("lanes32k", lanes=32768)
run("lanes64k", lanes=65536)
