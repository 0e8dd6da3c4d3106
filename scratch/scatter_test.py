import time
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

def variant(kind):
    spp_chunk, n_pix = samples.shape[0], samples.shape[1]
    total = spp_chunk * n_pix
    core0, step = P._balanced_machine(scene_j, bvh, samples, params,
                                      sess.render_w, sess.render_h, 0, 0)
    la0 = jnp.zeros((total, 4), jnp.float32)
    def cond(c): return jnp.any(c[0][0].alive)
    def body(c):
        core, la_out, acc = c
        core, dying, la, item = step(core)
        if kind == "scatter":
            tgt = jnp.where(dying, item, total)
            la_out = la_out.at[tgt].add(jnp.where(dying[:,None], la, 0.0),
                                        mode="drop", unique_indices=True)
        else:
            acc = acc + jnp.sum(jnp.where(dying[:,None], la, 0.0))
        return core, la_out, acc
    (pths, *_), la_out, acc = jax.lax.while_loop(cond, body, (core0, la0, jnp.float32(0)))
    return la_out.sum() + acc

for kind in ["noscatter", "scatter"]:
    f = jax.jit(lambda k=kind: variant(k))
    r = f(); jax.block_until_ready(r)
    t0=time.time(); r=f(); jax.block_until_ready(r)
    print(f"{kind}: {time.time()-t0:.2f}s", flush=True)
