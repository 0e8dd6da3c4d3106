import time
import numpy as np, jax, jax.numpy as jnp
from nart_tpu.scene import load_scene
from nart_tpu import render as render_mod
from nart_tpu.render import _setup_jit, _trace_balanced_jit
import nart_tpu.integrators.path as P

scene = load_scene("/root/reference/input/scenes/cameraLens.json", asset_root="/root/reference")
params = render_mod.RenderParams(image_width=256, image_height=256, spp=4, bounces=10, filter_width=2.0)
sess = render_mod.RenderSession(scene, params)
scene_j = jax.tree_util.tree_map(jnp.asarray, sess.scene)
bvh = sess.bvh
n = sess.render_w * sess.render_h
idx = jnp.arange(n, dtype=jnp.int32)
px, py = idx % sess.render_w, idx // sess.render_w
samples, state = _setup_jit(px, py, sess.total_w, 4)

def timeit(name, call, k=4):
    jax.block_until_ready(call(0))
    t0=time.time()
    for i in range(1, k+1): jax.block_until_ready(call(i))
    print(f"{name}: {(time.time()-t0)/k:.2f}s", flush=True)

timeit("args-version", lambda i: _trace_balanced_jit(
    samples[0:4].at[0,0,0].add(i*1e-7), scene_j, bvh, sess.params,
    sess.render_w, sess.render_h, jnp.int32(0))[0])

f = jax.jit(lambda s: P.trace_balanced(scene_j, bvh, s, sess.params,
                                       sess.render_w, sess.render_h)[0])
timeit("closure-version", lambda i: f(samples.at[0,0,0].add(i*1e-7)))
