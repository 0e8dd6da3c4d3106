import time
t00=time.time()
import numpy as np, jax, jax.numpy as jnp
from nart_tpu.scene import load_scene
from nart_tpu import render as render_mod, film
from nart_tpu.render import _setup_jit
print(f"imports {time.time()-t00:.1f}s", flush=True)

scene = load_scene("/root/reference/input/scenes/cameraLens.json", asset_root="/root/reference")
params = render_mod.RenderParams(image_width=256, image_height=256, spp=4,
                                 bounces=10, filter_width=2.0)
sess = render_mod.RenderSession(scene, params)
print(f"scene+session {time.time()-t00:.1f}s", flush=True)
n = sess.render_w * sess.render_h
idx = jnp.arange(n, dtype=jnp.int32)
px, py = idx % sess.render_w, idx // sess.render_w
samples, state = _setup_jit(px, py, sess.total_w, params.spp)
jax.block_until_ready(samples)
print(f"setup {time.time()-t00:.1f}s", flush=True)

table = jnp.asarray(film.filter_table())
la = jnp.zeros((n, 4), jnp.float32)
buf = jnp.zeros((sess.total_h, sess.total_w, 5), jnp.float32)

def four(buf, samples, la):
    for s in range(4):
        buf = film.splat_grid(buf, samples[s], la, params.filter_width, table,
                              sess.render_w, sess.render_h, sess.filter_bounds)
    return buf
sp = jax.jit(four)
t0=time.time(); b3 = sp(buf, samples, la); jax.block_until_ready(b3)
print(f"splat compile+run {time.time()-t0:.1f}s", flush=True)
t0=time.time(); b3 = sp(buf, samples, la); jax.block_until_ready(b3)
print(f"splat_grid x4 (one jit): {time.time()-t0:.3f}s", flush=True)
