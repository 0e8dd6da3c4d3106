import time
import numpy as np, jax, jax.numpy as jnp
from nart_tpu.scene import load_scene
from nart_tpu import render as render_mod
from nart_tpu.render import _setup_jit, _trace_balanced_jit
import nart_tpu.integrators.path as P

scene = load_scene("/root/reference/input/scenes/cameraLens.json", asset_root="/root/reference")
base = dict(image_width=256, image_height=256, spp=4, bounces=10, filter_width=2.0)
params = render_mod.RenderParams(**base)
sess = render_mod.RenderSession(scene, params)
scene_j = jax.tree_util.tree_map(jnp.asarray, sess.scene)
bvh = sess.bvh
n = sess.render_w * sess.render_h
idx = jnp.arange(n, dtype=jnp.int32)
px, py = idx % sess.render_w, idx // sess.render_w
samples, state = _setup_jit(px, py, sess.total_w, 4)

# A: args version (render.py's actual jit)
la, rays = _trace_balanced_jit(samples[0:4], scene_j, bvh, sess.params,
                               sess.render_w, sess.render_h, jnp.int32(0))
jax.block_until_ready(la)
t0=time.time()
la, rays = _trace_balanced_jit(samples[0:4], scene_j, bvh, sess.params,
                               sess.render_w, sess.render_h, jnp.int32(0))
jax.block_until_ready(la)
print(f"args-version: {time.time()-t0:.2f}s", flush=True)

# B: closure version (scratch style)
f = jax.jit(lambda s: P.trace_balanced(scene_j, bvh, s, sess.params,
                                       sess.render_w, sess.render_h))
la2, rays2, rounds = f(samples); jax.block_until_ready(la2)
t0=time.time(); la2, rays2, rounds = f(samples); jax.block_until_ready(la2)
print(f"closure-version: {time.time()-t0:.2f}s", flush=True)
print("la match:", bool(jnp.allclose(la, la2.reshape(la.shape), atol=1e-6)))
