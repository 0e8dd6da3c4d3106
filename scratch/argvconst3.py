import time
import numpy as np, jax, jax.numpy as jnp
from nart_tpu.scene import load_scene
from nart_tpu import render as render_mod
from nart_tpu.render import _setup_jit, _trace_balanced_jit

scene = load_scene("/root/reference/input/scenes/cameraLens.json", asset_root="/root/reference")
params = render_mod.RenderParams(image_width=256, image_height=256, spp=4, bounces=10, filter_width=2.0)
sess = render_mod.RenderSession(scene, params)
scene_j = jax.tree_util.tree_map(jnp.asarray, sess.scene)
bvh = sess.bvh
n = sess.render_w * sess.render_h
idx = jnp.arange(n, dtype=jnp.int32)
px, py = idx % sess.render_w, idx // sess.render_w
samples, state = _setup_jit(px, py, sess.total_w, 4)

for i in range(4):
    s = samples[0:4] * (1.0 - 0.01 * i)
    jax.block_until_ready(s)
    t0=time.time()
    la, rays = _trace_balanced_jit(s, scene_j, bvh, sess.params,
                                   sess.render_w, sess.render_h, jnp.int32(0))
    v = float(la.sum())
    print(f"call {i}: {time.time()-t0:.2f}s la.sum={v:.4f}", flush=True)
