import time
import numpy as np, jax, jax.numpy as jnp
from nart_tpu.scene import load_scene
from nart_tpu import render as render_mod, film
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
table = jnp.asarray(film.filter_table())

trace = jax.jit(lambda s: P.trace_balanced(scene_j, bvh, s, params, sess.render_w, sess.render_h))
def splat_only(buf, samples, la):
    return film.splat_grid(buf, samples, la, params.filter_width, table,
                           sess.render_w, sess.render_h, sess.filter_bounds)
sp = jax.jit(splat_only)

buf = jnp.zeros((sess.total_h, sess.total_w, 5), jnp.float32)
t0=time.time()
la, rays, rounds = trace(samples); b = sp(buf, samples, la); jax.block_until_ready(b)
print(f"two-jit compile+run {time.time()-t0:.1f}s", flush=True)
t0=time.time()
la, rays, rounds = trace(samples); b = sp(buf, samples, la); jax.block_until_ready(b)
print(f"two-jit run {time.time()-t0:.2f}s", flush=True)
