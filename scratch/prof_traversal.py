"""Isolate per-call costs: build_block_lists vs main kernel vs any-hit.

Times each piece on 32k cameraLens camera rays (coherent, sorted order) on
the real TPU.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from nart_tpu import camera
from nart_tpu.pallas_accel import (
    build_block_lists, build_clusters, intersect_clusters,
    intersect_clusters_any,
)
from nart_tpu.scene import load_scene

scene = load_scene("/root/reference/input/scenes/cameraLens.json",
                   asset_root="/root/reference")
acc = build_clusters(np.asarray(scene.tri_v))
print(f"n_tris={acc.n_tris} n_cl={acc.n_clusters} n_sc={acc.n_sc} "
      f"sc_size={acc.sc_size} csize={acc.csize}", flush=True)

n = 32768
idx = jnp.arange(n, dtype=jnp.int32)
px, py = idx % 256, idx // 256
jit_ = jnp.zeros((n, 2))
o, d = camera.cast_rays(scene.cam_to_world, scene.fov, 256, 256,
                        px % 256, py % 128, jit_)
t_min = jnp.zeros((n,))
t_max = jnp.full((n,), np.inf)

# incoherent variant: shuffle directions
key = jax.random.PRNGKey(0)
d_inc = jax.random.normal(key, (n, 3))
d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)
o_inc = o + jax.random.uniform(key, (n, 3)) * 0.5


def clock(label, fn, reps=20):
    fn()  # compile
    jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"[{label}] {dt*1000:.2f} ms", flush=True)


bbl = jax.jit(lambda o, d, tm: build_block_lists(o, d, tm, acc, 512))
clock("build_block_lists", lambda: bbl(o, d, t_max))

ic = jax.jit(lambda o, d: intersect_clusters(o, d, t_min, t_max, acc))
clock("intersect coherent", lambda: ic(o, d))
clock("intersect incoherent", lambda: ic(o_inc, d_inc))

ia = jax.jit(lambda o, d: intersect_clusters_any(o, d, t_min, t_max, acc))
clock("anyhit coherent", lambda: ia(o, d))
clock("anyhit incoherent", lambda: ia(o_inc, d_inc))
print("DONE", flush=True)
