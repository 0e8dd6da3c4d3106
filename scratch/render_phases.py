import time
import numpy as np, jax, jax.numpy as jnp
from nart_tpu.scene import load_scene
from nart_tpu import render as render_mod, film
from nart_tpu.render import _setup_jit, _trace_balanced_jit, _splat_chunk_jit

scene = load_scene("/root/reference/input/scenes/cameraLens.json", asset_root="/root/reference")
params = render_mod.RenderParams(image_width=256, image_height=256, spp=4, bounces=10, filter_width=2.0)
sess = render_mod.RenderSession(scene, params)

def render_instrumented():
    t = {}
    t0=time.time()
    n = sess.render_w * sess.render_h
    idx = jnp.arange(n, dtype=jnp.int32)
    px = idx % sess.render_w; py = idx // sess.render_w
    scene_j = jax.tree_util.tree_map(jnp.asarray, sess.scene)
    jax.block_until_ready(jax.tree_util.tree_leaves(scene_j)[0])
    t['scene_xfer'] = time.time()-t0; t0=time.time()
    samples, state = _setup_jit(px, py, sess.total_w, 4)
    jax.block_until_ready(samples)
    t['setup'] = time.time()-t0; t0=time.time()
    la, rays = _trace_balanced_jit(samples[0:4], scene_j, sess.bvh, sess.params,
                                   sess.render_w, sess.render_h, jnp.int32(0))
    jax.block_until_ready(la)
    t['trace'] = time.time()-t0; t0=time.time()
    buf = jnp.zeros((sess.total_h, sess.total_w, 5), jnp.float32)
    buf = _splat_chunk_jit(buf, samples[0:4], la, sess.params,
                           sess.render_w, sess.render_h, sess.filter_bounds)
    jax.block_until_ready(buf)
    t['splat'] = time.time()-t0; t0=time.time()
    out = np.asarray(buf)
    t['download'] = time.time()-t0
    return t, float(rays)

for k in range(3):
    t, rays = render_instrumented()
    print({kk: round(v,2) for kk,v in t.items()}, flush=True)
