"""In-kernel visit counters for the cluster traversal on cameraLens.

Clones _kernel with three extra (1, R) int32 outputs: superclusters
visited, member clusters slab-tested, clusters triangle-tested (stored in
lane 0 of each block's row; we read one value per block).
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nart_tpu import camera
from nart_tpu.pallas_accel import (
    _cluster_slab, _inv_dir, _pad_rays, _ray_rows, _ray_vectors,
    _watertight, build_block_lists, build_clusters, INF,
)
from nart_tpu.scene import load_scene


def _kernel_stats(
    count_ref, aabb_ref, sc_aabb_ref, ray_ref, sel_ref, list_ref, entry_ref,
    planes_ref, t_out, sc_cnt, slab_cnt, tri_cnt, *, n_sc, sc_size, csize,
):
    blk = pl.program_id(0)
    rv = _ray_vectors(ray_ref, sel_ref)
    t_min = rv[6]
    inv_x, inv_y, inv_z = _inv_dir(rv[3], rv[4], rv[5])
    t_out[:] = rv[7]
    sc_cnt[:] = jnp.zeros(t_out.shape, jnp.int32)
    slab_cnt[:] = jnp.zeros(t_out.shape, jnp.int32)
    tri_cnt[:] = jnp.zeros(t_out.shape, jnp.int32)
    cnt = count_ref[blk]

    def visit_cluster(c):
        slab_cnt[:] = slab_cnt[0, :][None, :] + 1
        t_best = t_out[0, :][None, :]
        live = _cluster_slab(aabb_ref, c, rv, inv_x, inv_y, inv_z,
                             t_min, t_best)

        @pl.when(jnp.any(live))
        def _():
            tri_cnt[:] = tri_cnt[0, :][None, :] + 1
            # live-ray census: lane 1 accumulates live count; lanes 2-5 the
            # number of live 128-ray quarters
            lane = jax.lax.broadcasted_iota(jnp.int32, live.shape, 1)
            liv = live.astype(jnp.int32)
            nlive = jnp.sum(liv)
            q = jnp.zeros((), jnp.int32)
            for qq in range(4):
                q = q + (jnp.sum(jnp.where((lane >= qq*128) & (lane < (qq+1)*128), liv, 0)) > 0).astype(jnp.int32)
            slab_cnt[:] = slab_cnt[0, :][None, :] + jnp.where(lane == 1, nlive, 0) + jnp.where(lane == 2, q, 0)
            hit, t, e0, e1, esum = _watertight(planes_ref[:, c, :], rv)
            t_best = t_out[0, :][None, :]
            hit = hit & (t > t_min) & (t < t_best)
            t_hit = jnp.where(hit, t, INF)
            t_sel = jnp.min(t_hit, axis=0, keepdims=True)
            t_out[:] = jnp.minimum(t_best, t_sel)

    def cond(carry):
        k, stop = carry
        return (k < cnt) & jnp.logical_not(stop)

    def body(carry):
        k, _ = carry
        sc = list_ref[0, 0, k]
        t_best = t_out[0, :][None, :]
        live_sc = _cluster_slab(sc_aabb_ref, sc, rv, inv_x, inv_y, inv_z,
                                t_min, t_best)

        @pl.when(jnp.any(live_sc))
        def _():
            sc_cnt[:] = sc_cnt[0, :][None, :] + 1

            def inner(j, _):
                visit_cluster(sc * sc_size + j)
                return 0

            jax.lax.fori_loop(0, sc_size, inner, 0)

        nk = jnp.minimum(k + 1, n_sc - 1)
        stop = entry_ref[0, 0, nk] > jnp.max(t_out[0, :])
        return k + 1, stop

    jax.lax.while_loop(cond, body, (jnp.int32(0), False))


def run(o, d, t_min, t_max, accel, block=512):
    o, d, t_min, t_max, n, pad = _pad_rays(o, d, t_min, t_max, block)
    rays, sel = _ray_rows(o, d, t_min, t_max)
    sc_list, sc_entry, sc_count = build_block_lists(o, d, t_max, accel, block)
    nsc = accel.n_sc
    grid = ((n + pad) // block,)
    row_blk = lambda h: pl.BlockSpec((h, block), lambda i, c, a, s: (0, i),
                                     memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((1, block), lambda i, c, a, s: (0, i),
                           memory_space=pltpu.VMEM)
    smem_row = pl.BlockSpec((1, 1, nsc), lambda i, c, a, s: (i, 0, 0),
                            memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel_stats, n_sc=nsc, sc_size=accel.sc_size,
                          csize=accel.csize),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                row_blk(8), row_blk(5), smem_row, smem_row,
                pl.BlockSpec(accel.planes.shape,
                             lambda i, c, a, s: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[out_blk, out_blk, out_blk, out_blk],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, n + pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n + pad), jnp.int32),
            jax.ShapeDtypeStruct((1, n + pad), jnp.int32),
            jax.ShapeDtypeStruct((1, n + pad), jnp.int32),
        ],
        interpret=False,
    )(sc_count, accel.aabb, accel.sc_aabb, rays, sel, sc_list, sc_entry,
      accel.planes)
    t, scs, slabs, tris = outs
    nb = (n + pad) // block
    sl = slabs[0].reshape(nb, block)
    return (scs[0].reshape(nb, block)[:, 0], sl[:, 0],
            tris[0].reshape(nb, block)[:, 0], sc_count, sl[:, 1], sl[:, 2])


scene = load_scene("/root/reference/input/scenes/cameraLens.json",
                   asset_root="/root/reference")
acc = build_clusters(np.asarray(scene.tri_v))
print(f"n_cl={acc.n_clusters} n_sc={acc.n_sc} sc_size={acc.sc_size}")

n = 32768
idx = jnp.arange(n, dtype=jnp.int32)
o, d = camera.cast_rays(scene.cam_to_world, scene.fov, 256, 256,
                        idx % 256, (idx // 256) % 128, jnp.zeros((n, 2)))
t_min = jnp.zeros((n,))
t_max = jnp.full((n,), np.inf)

key = jax.random.PRNGKey(0)
d_inc = jax.random.normal(key, (n, 3))
d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)

for label, oo, dd in [("coherent", o, d), ("incoherent", o, d_inc)]:
    scs, slabs, tris, sc_count, nlive, nquart = jax.block_until_ready(
        run(oo, dd, t_min, t_max, acc)
    )
    tr = np.maximum(np.asarray(tris).astype(np.float64), 1)
    print(f"[{label}] visible_sc/blk mean={np.mean(np.asarray(sc_count)):.1f} "
          f"visited_sc mean={np.mean(np.asarray(scs)):.1f} "
          f"slabs mean={np.mean(np.asarray(slabs) - np.asarray(nlive) - np.asarray(nquart)):.1f} "
          f"tri_tests mean={np.mean(np.asarray(tris)):.1f} "
          f"live/test={np.mean(np.asarray(nlive)/tr):.1f}/512 "
          f"quarters/test={np.mean(np.asarray(nquart)/tr):.2f}/4", flush=True)
