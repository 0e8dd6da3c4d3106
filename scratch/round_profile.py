import time
import numpy as np, jax, jax.numpy as jnp
from nart_tpu.scene import load_scene
from nart_tpu import render as render_mod, camera
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
from nart_tpu.render import _setup_jit
samples, state = _setup_jit(px, py, sess.total_w, params.spp)

fn = jax.jit(lambda s: P.trace_balanced(scene_j, bvh, s, params, sess.render_w, sess.render_h)[2])
r = fn(samples)
print("rounds:", int(r))
jax.block_until_ready(fn(samples))
t0=time.time(); jax.block_until_ready(fn(samples)); dt=time.time()-t0
print(f"trace_balanced: {dt:.2f}s -> {dt/int(r)*1e3:.1f} ms/round")

# full balanced step (trace + splats)
from nart_tpu.render import _balanced_step_jit
from nart_tpu import film
buf = jnp.zeros((sess.total_h, sess.total_w, 5), jnp.float32)
args = lambda: (buf, state, samples[0:4], scene_j, bvh, px, py, params,
                sess.total_w, sess.total_h, sess.filter_bounds)
b2, st2, rays = _balanced_step_jit(*args(), render_w=sess.render_w, render_h=sess.render_h, chunk_base=jnp.int32(0))
jax.block_until_ready(b2)
t0=time.time()
b2, st2, rays = _balanced_step_jit(*args(), render_w=sess.render_w, render_h=sess.render_h, chunk_base=jnp.int32(0))
jax.block_until_ready(b2)
print(f"_balanced_step_jit: {time.time()-t0:.2f}s")

# splat alone
table = jnp.asarray(film.filter_table())
la = jnp.zeros((n, 4), jnp.float32)
sp = jax.jit(lambda buf, s, la: film.splat_grid(buf, s, la, params.filter_width, table, sess.render_w, sess.render_h, sess.filter_bounds))
b3 = sp(buf, samples[0], la); jax.block_until_ready(b3)
t0=time.time()
for _ in range(4): b3 = sp(b3, samples[0], la)
jax.block_until_ready(b3)
print(f"splat_grid x4: {time.time()-t0:.2f}s")
