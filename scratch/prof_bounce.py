"""Microbench the non-traversal pieces of the bounce body at 32k lanes."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from nart_tpu import bxdf, camera, rng
from nart_tpu.geometry import surface_at, Hit
from nart_tpu.integrators.path import (
    _nearest_light, _select_light_eval, _select_light_sample, _sort_key,
    isect_list_init, isect_list_query, isect_list_apply,
)
from nart_tpu.materials import make_bsdf
from nart_tpu.scene import load_scene

scene_path = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/input/scenes/cameraLens.json"
scene = load_scene(scene_path, asset_root="/root/reference")
scene = jax.tree_util.tree_map(jnp.asarray, scene)

n = 32768
key = jax.random.PRNGKey(1)
o = jax.random.uniform(key, (n, 3)) * 2 - 1
d = jax.random.normal(key, (n, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
state = rng.seed(jnp.arange(n, dtype=jnp.int32))
nt = scene.tri_mesh.shape[0]
tri = jax.random.randint(key, (n,), 0, nt)
hit = Hit(t=jnp.ones((n,)), tri=tri,
          u=jnp.full((n,), 0.3), v=jnp.full((n,), 0.3))
tri_v, tri_n, tri_uv, tri_mesh = (scene.tri_v, scene.tri_n, scene.tri_uv,
                                  scene.tri_mesh)


def clock(label, fn, reps=30):
    jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    print(f"[{label}] {(time.time()-t0)/reps*1000:.2f} ms", flush=True)


surf_j = jax.jit(lambda h: surface_at(h, tri_v, tri_n, tri_uv, tri_mesh))
clock("surface_at", lambda: surf_j(hit))
surf = surf_j(hit)

mb_j = jax.jit(lambda s: make_bsdf(scene, s.mesh, s.st, s.sn, s.dpds,
                                   jnp.ones((n,))))
clock("make_bsdf", lambda: mb_j(surf))
frame, desc = mb_j(surf)

wo = bxdf.to_local(frame, -d)
u2 = jax.random.uniform(key, (n, 2))
ul = jax.random.uniform(key, (n,))
eta_o = jnp.ones((n,))
fl0 = jnp.zeros((n,), jnp.int32)

samp_j = jax.jit(lambda: bxdf.bsdf_sample_f(desc, wo, ul, u2,
                                            jnp.ones((n,), bool), eta_o, fl0))
clock("bsdf_sample_f", lambda: samp_j())
pdf_j = jax.jit(lambda: bxdf.bsdf_pdf(desc, wo, wo, jnp.ones((n,), bool), eta_o))
clock("bsdf_pdf", lambda: pdf_j())
f_j = jax.jit(lambda: bxdf.bsdf_f(desc, wo, wo, jnp.ones((n,), bool), eta_o))
clock("bsdf_f", lambda: f_j())

nl_j = jax.jit(lambda: _nearest_light(scene.lights, o, d, jnp.full((n,), jnp.inf)))
clock("nearest_light", lambda: nl_j())
li = jax.random.randint(key, (n,), 0, len(scene.lights))
le_j = jax.jit(lambda: _select_light_eval(scene.lights, li, o, d))
clock("select_light_eval", lambda: le_j())
ls_j = jax.jit(lambda: _select_light_sample(scene.lights, li, o, u2))
clock("select_light_sample", lambda: ls_j())

lst = isect_list_init(n)
q_j = jax.jit(lambda: isect_list_query(lst, surf.mesh, tri_mesh[tri]))
clock("isect_list_query", lambda: q_j())
a_j = jax.jit(lambda: isect_list_apply(lst, surf.mesh, tri_mesh[tri],
                                       eta_o, jnp.ones((n,), bool)))
clock("isect_list_apply", lambda: a_j())


def rng8(state):
    for _ in range(8):
        _, state = rng.masked_next_float(state, jnp.ones((n,), bool))
    return state


r_j = jax.jit(rng8)
clock("rng x8", lambda: r_j(state))

tv = jnp.reshape(tri_v, (-1, 3))
lo = jnp.min(tv, axis=0)
inv = 1.0 / jnp.maximum(jnp.max(tv, axis=0) - lo, 1e-12)
sort_j = jax.jit(
    lambda o, d: jnp.argsort(_sort_key(lo, inv, o, d, jnp.ones((n,), bool)))
)
clock("sort_key+argsort", lambda: sort_j(o, d))

# permute a Paths-sized pytree
paths = [jax.random.normal(key, (n, 3)) for _ in range(6)] + \
        [jax.random.normal(key, (n,)) for _ in range(8)] + \
        [jnp.zeros((n, 8), jnp.int32), jnp.zeros((n, 8))]
perm = sort_j(o, d)
perm_j = jax.jit(lambda p: jax.tree_util.tree_map(lambda x: x[perm], p))
clock("paths permute", lambda: perm_j(paths))

cast_j = jax.jit(lambda: camera.cast_rays(
    scene.cam_to_world, scene.fov, 256, 256,
    jnp.arange(n, dtype=jnp.int32) % 256,
    (jnp.arange(n, dtype=jnp.int32) // 256) % 256, u2))
clock("cast_rays", lambda: cast_j())
print("DONE", flush=True)
