import time
import numpy as np, jax, jax.numpy as jnp
from nart_tpu import render as render_mod, rng, sampling
from nart_tpu.scene import load_scene
from nart_tpu.integrators import path as P

scene = load_scene("/root/reference/input/scenes/glassSphere.json", asset_root="/root/reference")
size, spp = 512, 16
params = render_mod.RenderParams(image_width=size, image_height=size, spp=spp, bounces=10,
                                 filter_width=2.0, roughening_factor=0.2)
sess = render_mod.RenderSession(scene, params)
scn = jax.tree_util.tree_map(jnp.asarray, sess.scene)
n = size*size
idx = jnp.arange(n, dtype=jnp.int32); px, py = idx % size, idx // size
samples, state = render_mod._setup_jit(px, py, sess.total_w, spp)
for lanes in (1<<14, 1<<15):
    f = jax.jit(lambda s: P.trace_balanced(scn, sess.bvh, s, params, size, size, n_lanes=lanes))
    la, rays, rounds = f(samples); jax.block_until_ready(la)
    t0=time.time(); la, rays, rounds = f(samples); jax.block_until_ready(la)
    t = time.time()-t0
    print(f"lanes={lanes}: {t:.2f}s rounds={int(rounds)} -> {t/int(rounds)*1000:.1f} ms/round, rays={float(rays):.0f}", flush=True)
