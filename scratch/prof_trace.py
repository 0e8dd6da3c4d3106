import time, glob, os
import numpy as np, jax, jax.numpy as jnp
from nart_tpu.scene import load_scene
from nart_tpu import render as render_mod
from nart_tpu.render import _setup_jit
import nart_tpu.integrators.path as P

scene = load_scene("/root/reference/input/scenes/cameraLens.json", asset_root="/root/reference")
params = render_mod.RenderParams(image_width=256, image_height=256, spp=4,
                                 bounces=10, filter_width=2.0)
sess = render_mod.RenderSession(scene, params)
scene_j = jax.tree_util.tree_map(jnp.asarray, sess.scene)
bvh = sess.bvh
n = sess.render_w * sess.render_h
idx = jnp.arange(n, dtype=jnp.int32)
px, py = idx % sess.render_w, idx // sess.render_w
samples, state = _setup_jit(px, py, sess.total_w, params.spp)
trace = jax.jit(lambda s: P.trace_balanced(scene_j, bvh, s, params, sess.render_w, sess.render_h))
la, rays, rounds = trace(samples); jax.block_until_ready(la)
with jax.profiler.trace("/tmp/jaxprof"):
    la, rays, rounds = trace(samples); jax.block_until_ready(la)
print("done", glob.glob("/tmp/jaxprof/**/*", recursive=True)[:10])
