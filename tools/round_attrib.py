"""Attribute per-round cost of the balanced wavefront on a scene.

Runs the balanced step round by round (step jitted alone), capturing the
wavefront state, then times the individual components on the REAL mid-trace
ray distributions: main closest-hit kernel, block-list build, lane sort,
and the whole step.  Usage:

    python tools/round_attrib.py [scene.json [W [SPP]]]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from nart_tpu import render as render_mod
from nart_tpu.pallas_accel import (
    build_block_lists, intersect_clusters, intersect_clusters_any,
)
from nart_tpu.render import _setup_jit
from nart_tpu.integrators.path import _balanced_machine, _sort_key
from nart_tpu.scene import load_scene

scene_path = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/input/scenes/cameraLens.json"
W = int(sys.argv[2]) if len(sys.argv) > 2 else 256
SPP = int(sys.argv[3]) if len(sys.argv) > 3 else 4

scene = load_scene(scene_path, asset_root="/root/reference")
params = render_mod.RenderParams(
    image_width=W, image_height=W, spp=SPP, bounces=10,
    filter_width=2.0, roughening_factor=0.2,
)
sess = render_mod.RenderSession(scene, params)
n = sess.render_w * sess.render_h
idx = jnp.arange(n, dtype=jnp.int32)
px, py = idx % sess.render_w, idx // sess.render_w
samples, _ = _setup_jit(px, py, sess.total_w, SPP)
chunk = min(SPP, 32)

core0, step = _balanced_machine(
    sess.scene_dev, sess.bvh, samples[0:chunk], sess.params,
    sess.render_w, sess.render_h, 0, 0,
)
step_j = jax.jit(step)
core = jax.block_until_ready(step_j(core0))[0]  # compile + 1 round


def timeit(f, *a, reps=5):
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


isect_j = jax.jit(lambda o, d, tmax: intersect_clusters(
    o, d, jnp.zeros(o.shape[0]), tmax, sess.bvh))
any_j = jax.jit(lambda o, d, tmax: intersect_clusters_any(
    o, d, jnp.zeros(o.shape[0]), tmax, sess.bvh))
bll_j = jax.jit(lambda o, d, tmax: build_block_lists(
    o, d, tmax, sess.bvh, sess.bvh.block))


def sortfn(paths, bounce, item):
    tv = jnp.reshape(jnp.asarray(sess.scene_dev.tri_v), (-1, 3))
    lo = jnp.min(tv, axis=0)
    inv = 1.0 / jnp.maximum(jnp.max(tv, axis=0) - lo, 1e-12)
    key = _sort_key(lo, inv, paths.o, paths.d, paths.alive)
    perm = jnp.argsort(key)
    paths = jax.tree_util.tree_map(
        lambda x: x if x.ndim == 0 else x[perm], paths)
    return paths, bounce[perm], item[perm]


sort_j = jax.jit(sortfn)

print(f"lanes={core[0].o.shape[0]}")
rounds = [1, 3, 6, 10, 14]
for r_target in rounds:
    while True:
        paths = core[0]
        r = int(core[4])
        if r >= r_target:
            break
        core = step_j(core)[0]
    paths, bounce, item = core[0], core[1], core[2]
    alive = np.asarray(paths.alive)
    o = paths.o
    d = paths.d
    tmax = jnp.where(paths.alive, jnp.float32(np.inf), 0.0)
    t_step = timeit(step_j, core)
    t_isect = timeit(isect_j, o, d, tmax)
    t_any = timeit(any_j, jnp.concatenate([o, o]), jnp.concatenate([d, d]),
                   jnp.concatenate([tmax, tmax]))
    t_bll = timeit(bll_j, o, d, tmax)
    t_sort = timeit(sort_j, paths, bounce, item)
    print(f"round {r:2d} alive={alive.mean():5.1%}  step={t_step*1e3:6.1f}ms"
          f"  isect={t_isect*1e3:6.1f}  any2n={t_any*1e3:6.1f}"
          f"  blocklists={t_bll*1e3:6.1f}  sort={t_sort*1e3:6.1f}",
          flush=True)
