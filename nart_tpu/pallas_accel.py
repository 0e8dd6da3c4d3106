"""Pallas TPU intersection kernel: Morton-clustered culling traversal.

Role parity: the BVH acceleration structure (reference src/core/bvh.cpp)
re-designed for the TPU execution model.  Pointer-chasing per-ray traversal
is hostile to the VPU; instead:

  * triangles are Morton-sorted into clusters of 128 (the LBVH leaf level)
    and stored as LANE-ALIGNED coordinate planes — 13 arrays of shape
    (n_clusters, 128): the 9 corner coordinates plus the precomputed
    unnormalised geometric normal and v0.n (hoisting the cross product out
    of the kernel).  Every in-kernel tensor is then a natural (R, 128) tile;
  * ray *blocks* are tested against cluster AABBs with conservative
    interval arithmetic, vectorised in XLA as a (n_blocks, n_clusters)
    `may_hit` mask before the kernel launches;
  * the kernel handles one ray block per grid step, loops over clusters,
    and `@pl.when(may_hit[c])` skips the watertight test for culled
    clusters: per-block work scales with what the block can see, not with
    scene size.  Control flow stays block-uniform — the TPU-friendly
    traversal shape — and triangle loads are contiguous row slices.

The watertight test matches geometry.intersect_chunk (geometry.cpp:32-115
parity, including the FMA-noise snap in the edge functions).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .accel import morton3
from .geometry import Hit, ray_shear
from .tree import pytree_dataclass

INF = np.float32(np.inf)
CLUSTER = 128  # triangles per cluster == VPU lane width


@pytree_dataclass(meta_fields=("n_clusters", "n_tris"))
@dataclass
class ClusterAccel:
    """Morton-ordered triangle clusters, lane-aligned coordinate planes."""

    planes: Any  # (13, n_clusters, CLUSTER): v0x v0y v0z v1x..v2z nx ny nz v0n
    order: Any  # (n_clusters * CLUSTER,) int32 original tri id (-1 padding)
    cl_lo: Any  # (n_clusters, 3)
    cl_hi: Any  # (n_clusters, 3)
    n_clusters: int
    n_tris: int


def build_clusters(tri_v: np.ndarray) -> ClusterAccel:
    tri_v = np.asarray(tri_v, np.float32)
    t = len(tri_v)
    lo = tri_v.min(axis=1)
    hi = tri_v.max(axis=1)
    centroid = 0.5 * (lo + hi)
    scene_lo = lo.min(axis=0)
    extent = np.maximum(hi.max(axis=0) - scene_lo, 1e-12)
    codes = morton3(*((centroid - scene_lo) / extent).T)
    order = np.argsort(codes, kind="stable").astype(np.int32)

    n_cl = max(1, -(-t // CLUSTER))
    t_pad = n_cl * CLUSTER
    order_p = np.full(t_pad, -1, np.int32)
    order_p[:t] = order
    tv = np.zeros((t_pad, 3, 3), np.float32)
    tv[:t] = tri_v[order]
    n = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
    v0n = np.sum(tv[:, 0] * n, axis=-1)
    planes = np.stack(
        [
            tv[:, 0, 0], tv[:, 0, 1], tv[:, 0, 2],
            tv[:, 1, 0], tv[:, 1, 1], tv[:, 1, 2],
            tv[:, 2, 0], tv[:, 2, 1], tv[:, 2, 2],
            n[:, 0], n[:, 1], n[:, 2],
            v0n,
        ]
    ).reshape(13, n_cl, CLUSTER)

    lo_p = np.full((t_pad, 3), INF, np.float32)
    hi_p = np.full((t_pad, 3), -INF, np.float32)
    lo_p[:t] = lo[order]
    hi_p[:t] = hi[order]
    return ClusterAccel(
        planes=jnp.asarray(planes.astype(np.float32)),
        order=jnp.asarray(order_p),
        cl_lo=jnp.asarray(lo_p.reshape(n_cl, CLUSTER, 3).min(axis=1)),
        cl_hi=jnp.asarray(hi_p.reshape(n_cl, CLUSTER, 3).max(axis=1)),
        n_clusters=n_cl,
        n_tris=t,
    )


def block_cluster_mask(o, d, t_max, cl_lo, cl_hi, block):
    """Conservative (n_blocks, n_clusters) visibility mask, vectorised.

    Interval-arithmetic slab test between each ray block's bounds and each
    cluster AABB; axes whose direction interval spans zero give no
    constraint.
    """
    nb = o.shape[0] // block
    ob = o.reshape(nb, block, 3)
    db = d.reshape(nb, block, 3)
    o_lo = ob.min(axis=1)
    o_hi = ob.max(axis=1)
    d_lo = db.min(axis=1)
    d_hi = db.max(axis=1)
    tmax_ub = t_max.reshape(nb, block).max(axis=1)

    spans0 = (d_lo <= 0.0) & (d_hi >= 0.0)
    il = 1.0 / jnp.where(spans0, 1.0, d_hi)
    ih = 1.0 / jnp.where(spans0, 1.0, d_lo)

    a_lo = cl_lo[None] - o_hi[:, None]
    a_hi = cl_lo[None] - o_lo[:, None]
    b_lo = cl_hi[None] - o_hi[:, None]
    b_hi = cl_hi[None] - o_lo[:, None]
    cands = jnp.stack(
        [
            a_lo * il[:, None], a_lo * ih[:, None],
            a_hi * il[:, None], a_hi * ih[:, None],
            b_lo * il[:, None], b_lo * ih[:, None],
            b_hi * il[:, None], b_hi * ih[:, None],
        ]
    )
    t_lo = jnp.where(spans0[:, None], -INF, cands.min(axis=0))
    t_hi = jnp.where(spans0[:, None], INF, cands.max(axis=0))
    enter_lb = t_lo.max(axis=-1)
    exit_ub = t_hi.min(axis=-1)
    return (
        (enter_lb <= exit_ub)
        & (exit_ub >= 0.0)
        & (enter_lb <= tmax_ub[:, None])
        # a block whose every ray has t_max <= 0 can never record a hit
        # (in_range needs t_min < t < t_max); this also catches culled
        # lanes whose direction intervals span zero on every axis
        & (tmax_ub[:, None] > 0.0)
    )


def _kernel(
    mask_ref,  # (ceil(n_clusters/32), n_blocks) uint32, scalar-prefetched
    # to SMEM.  Bit c%32 of word [c//32, blk] = cluster c visible to block
    # blk.  Bit-packed over clusters so the SMEM footprint stays ~blocks *
    # clusters/32 bytes (a flat i32 mask blew v5e's 1 MB SMEM at ~100k
    # triangles).
    ray_ref,  # (8, R): ox oy oz dx dy dz tmin tmax
    sel_ref,  # (5, R): onehot-free per-ray selection data (see below)
    planes_ref,  # (13, n_clusters, CLUSTER)
    t_out,  # (1, R)
    idx_out,  # (1, R) int32
    u_out,
    v_out,
    *,
    n_clusters,
):
    blk = pl.program_id(0)
    ox = ray_ref[0, :][None, :]  # (1, R)
    oy = ray_ref[1, :][None, :]
    oz = ray_ref[2, :][None, :]
    dx = ray_ref[3, :][None, :]
    dy = ray_ref[4, :][None, :]
    dz = ray_ref[5, :][None, :]
    t_min = ray_ref[6, :][None, :]
    perm0 = sel_ref[0, :][None, :]
    perm1 = sel_ref[1, :][None, :]
    perm2 = sel_ref[2, :][None, :]
    sx = sel_ref[3, :][None, :]
    sy = sel_ref[4, :][None, :]

    def sel(x, y, z, axis):  # components (1,R), axis (1,R) -> (1,R)
        return jnp.where(axis == 0.0, x, jnp.where(axis == 1.0, y, z))

    o_a = sel(ox, oy, oz, perm0)
    o_b = sel(ox, oy, oz, perm1)
    o_c = sel(ox, oy, oz, perm2)

    t_out[:] = ray_ref[7, :][None, :]
    idx_out[:] = jnp.full(t_out.shape, -1, jnp.int32)
    u_out[:] = jnp.zeros(t_out.shape, jnp.float32)
    v_out[:] = jnp.zeros(t_out.shape, jnp.float32)

    r = ox.shape[1]

    def cluster_body(c, _):
        word = mask_ref[c >> 5, blk]
        bit = (word >> (c & 31).astype(jnp.uint32)) & jnp.uint32(1)

        @pl.when(bit != 0)
        def _():
            # triangle planes for this cluster: (CLUSTER,) rows -> (C, 1)
            pcl = planes_ref[:, c, :]  # (13, CLUSTER)
            v0x = pcl[0, :][:, None]  # (C, 1)
            v0y = pcl[1, :][:, None]
            v0z = pcl[2, :][:, None]
            v1x = pcl[3, :][:, None]
            v1y = pcl[4, :][:, None]
            v1z = pcl[5, :][:, None]
            v2x = pcl[6, :][:, None]
            v2y = pcl[7, :][:, None]
            v2z = pcl[8, :][:, None]
            nx = pcl[9, :][:, None]
            ny = pcl[10, :][:, None]
            nz = pcl[11, :][:, None]
            v0n = pcl[12, :][:, None]

            # (C, R) tiles from here on
            d_dot_n = dx * nx + dy * ny + dz * nz
            o_dot_n = ox * nx + oy * ny + oz * nz
            t = (v0n - o_dot_n) / d_dot_n

            t_best = t_out[0, :][None, :]  # (1, R)
            in_range = (t > t_min) & (t < t_best)

            def corner_xy(vx, vy, vz):
                ca = sel(vx, vy, vz, perm0) - o_a
                cb = sel(vx, vy, vz, perm1) - o_b
                cc = sel(vx, vy, vz, perm2) - o_c
                return ca + cc * sx, cb + cc * sy

            p0x, p0y = corner_xy(v0x, v0y, v0z)
            p1x, p1y = corner_xy(v1x, v1y, v1z)
            p2x, p2y = corner_xy(v2x, v2y, v2z)

            def edge(ax, ay, bx, by):
                pa = ax * by
                pb = ay * bx
                e = pa - pb
                noise = (jnp.abs(pa) + jnp.abs(pb)) * np.float32(2.0**-22)
                return jnp.where(jnp.abs(e) <= noise, 0.0, e)

            e0 = edge(p1x, p1y, p2x, p2y)
            e1 = edge(p2x, p2y, p0x, p0y)
            e2 = edge(p0x, p0y, p1x, p1y)
            neg = (e0 < 0) | (e1 < 0) | (e2 < 0)
            pos = (e0 > 0) | (e1 > 0) | (e2 > 0)
            hit = (
                in_range
                & ~(neg & pos)
                & (jnp.abs(e0) + jnp.abs(e1) + jnp.abs(e2) != 0.0)
            )

            # reduction argmin over the C (sublane) axis
            t_hit = jnp.where(hit, t, INF)
            t_sel = jnp.min(t_hit, axis=0, keepdims=True)  # (1, R)
            rows = jax.lax.broadcasted_iota(jnp.int32, t_hit.shape, 0)
            best = jnp.min(
                jnp.where(t_hit == t_sel, rows, jnp.int32(CLUSTER + 1)),
                axis=0,
                keepdims=True,
            )
            onehot = (rows == best) & (t_hit == t_sel)
            esum = jnp.sum(jnp.where(onehot, e0 + e1 + e2, 0.0), 0, keepdims=True)
            e0s = jnp.sum(jnp.where(onehot, e0, 0.0), 0, keepdims=True)
            e1s = jnp.sum(jnp.where(onehot, e1, 0.0), 0, keepdims=True)
            better = t_sel < t_best
            inv_det = 1.0 / jnp.where(esum == 0.0, 1.0, esum)
            t_out[:] = jnp.where(better, t_sel, t_best)
            idx_out[:] = jnp.where(
                better,
                c * CLUSTER + best,
                idx_out[0, :][None, :],
            )
            u_out[:] = jnp.where(better, e0s * inv_det, u_out[0, :][None, :])
            v_out[:] = jnp.where(better, e1s * inv_det, v_out[0, :][None, :])

    jax.lax.fori_loop(0, n_clusters, cluster_body, None)


def _kernel_any(
    mask_ref,  # (ceil(n_clusters/32), n_blocks) uint32, scalar-prefetched
    ray_ref,  # (8, R): ox oy oz dx dy dz tmin tmax
    sel_ref,  # (5, R): watertight permute/shear selection data
    planes_ref,  # (13, n_clusters, CLUSTER)
    occ_out,  # (1, R) int32: 1 iff any hit with t in (tmin, tmax)
    *,
    n_clusters,
):
    """Any-hit (occlusion) variant of _kernel.

    Shadow rays only need a boolean, so the per-cluster argmin/barycentric
    bookkeeping of the closest-hit kernel is dropped (one any-reduce per
    cluster), and the cluster loop early-outs once every ray in the block
    is occluded — shadow rays toward the same light saturate fast.
    Occlusion predicate matches the closest-hit kernel's hit.valid exactly:
    any watertight hit with t strictly inside (t_min, t_max).
    """
    blk = pl.program_id(0)
    ox = ray_ref[0, :][None, :]
    oy = ray_ref[1, :][None, :]
    oz = ray_ref[2, :][None, :]
    dx = ray_ref[3, :][None, :]
    dy = ray_ref[4, :][None, :]
    dz = ray_ref[5, :][None, :]
    t_min = ray_ref[6, :][None, :]
    t_max = ray_ref[7, :][None, :]
    perm0 = sel_ref[0, :][None, :]
    perm1 = sel_ref[1, :][None, :]
    perm2 = sel_ref[2, :][None, :]
    sx = sel_ref[3, :][None, :]
    sy = sel_ref[4, :][None, :]

    def sel(x, y, z, axis):
        return jnp.where(axis == 0.0, x, jnp.where(axis == 1.0, y, z))

    o_a = sel(ox, oy, oz, perm0)
    o_b = sel(ox, oy, oz, perm1)
    o_c = sel(ox, oy, oz, perm2)

    # parked/culled lanes (t_max <= 0) can never record a hit: seed them as
    # "occluded" so they count as decided for the early-out, and strip them
    # in the epilogue
    occ_out[:] = (t_max <= 0.0).astype(jnp.int32)

    def cluster_body(c, done):
        word = mask_ref[c >> 5, blk]
        bit = (word >> (c & 31).astype(jnp.uint32)) & jnp.uint32(1)

        @pl.when((bit != 0) & jnp.logical_not(done))
        def _():
            pcl = planes_ref[:, c, :]  # (13, CLUSTER)
            v0x = pcl[0, :][:, None]
            v0y = pcl[1, :][:, None]
            v0z = pcl[2, :][:, None]
            v1x = pcl[3, :][:, None]
            v1y = pcl[4, :][:, None]
            v1z = pcl[5, :][:, None]
            v2x = pcl[6, :][:, None]
            v2y = pcl[7, :][:, None]
            v2z = pcl[8, :][:, None]
            nx = pcl[9, :][:, None]
            ny = pcl[10, :][:, None]
            nz = pcl[11, :][:, None]
            v0n = pcl[12, :][:, None]

            d_dot_n = dx * nx + dy * ny + dz * nz
            o_dot_n = ox * nx + oy * ny + oz * nz
            t = (v0n - o_dot_n) / d_dot_n
            in_range = (t > t_min) & (t < t_max)

            def corner_xy(vx, vy, vz):
                ca = sel(vx, vy, vz, perm0) - o_a
                cb = sel(vx, vy, vz, perm1) - o_b
                cc = sel(vx, vy, vz, perm2) - o_c
                return ca + cc * sx, cb + cc * sy

            p0x, p0y = corner_xy(v0x, v0y, v0z)
            p1x, p1y = corner_xy(v1x, v1y, v1z)
            p2x, p2y = corner_xy(v2x, v2y, v2z)

            def edge(ax, ay, bx, by):
                pa = ax * by
                pb = ay * bx
                e = pa - pb
                noise = (jnp.abs(pa) + jnp.abs(pb)) * np.float32(2.0**-22)
                return jnp.where(jnp.abs(e) <= noise, 0.0, e)

            e0 = edge(p1x, p1y, p2x, p2y)
            e1 = edge(p2x, p2y, p0x, p0y)
            e2 = edge(p0x, p0y, p1x, p1y)
            neg = (e0 < 0) | (e1 < 0) | (e2 < 0)
            pos = (e0 > 0) | (e1 > 0) | (e2 > 0)
            hit = (
                in_range
                & ~(neg & pos)
                & (jnp.abs(e0) + jnp.abs(e1) + jnp.abs(e2) != 0.0)
            )
            occ_out[:] = jnp.maximum(
                occ_out[0, :][None, :],
                jnp.max(hit.astype(jnp.int32), axis=0, keepdims=True),
            )

        # early-out: the whole block decided => skip remaining clusters
        return done | (jnp.min(occ_out[0, :]) > 0)

    jax.lax.fori_loop(0, n_clusters, cluster_body, False)
    occ_out[:] = jnp.where(t_max <= 0.0, 0, occ_out[0, :][None, :])


def intersect_clusters_any(o, d, t_min, t_max, accel: ClusterAccel,
                           block=512, interpret=None):
    """Boolean occlusion query: any hit with t in (t_min, t_max)?

    Same predicate as intersect_clusters(...).tri >= 0, but ~2x cheaper per
    cluster and with whole-block early-out — the shadow-ray fast path.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = o.shape[0]
    pad = (-n) % block
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3))])
        d = jnp.concatenate([d, jnp.ones((pad, 3))])
        t_min = jnp.concatenate([t_min, jnp.zeros(pad)])
        t_max = jnp.concatenate([t_max, jnp.zeros(pad)])
    shear = ray_shear(d)

    rays = jnp.stack(
        [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t_min, t_max]
    )
    sel = jnp.stack(
        [
            shear.perm[:, 0].astype(jnp.float32),
            shear.perm[:, 1].astype(jnp.float32),
            shear.perm[:, 2].astype(jnp.float32),
            shear.sx,
            shear.sy,
        ]
    )

    mask = block_cluster_mask(o, d, t_max, accel.cl_lo, accel.cl_hi, block)
    n_words = -(-accel.n_clusters // 32)
    pad_c = n_words * 32 - accel.n_clusters
    if pad_c:
        mask = jnp.concatenate(
            [mask, jnp.zeros((mask.shape[0], pad_c), bool)], axis=1
        )
    bits = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    packed = jnp.sum(
        mask.reshape(mask.shape[0], n_words, 32).astype(jnp.uint32) * bits,
        axis=-1,
        dtype=jnp.uint32,
    ).T

    grid = ((n + pad) // block,)
    row_blk = lambda h: pl.BlockSpec((h, block), lambda i, m: (0, i),
                                     memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((1, block), lambda i, m: (0, i),
                           memory_space=pltpu.VMEM)

    occ = pl.pallas_call(
        functools.partial(_kernel_any, n_clusters=accel.n_clusters),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                row_blk(8),
                row_blk(5),
                pl.BlockSpec(accel.planes.shape, lambda i, m: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[out_blk],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        out_shape=[jax.ShapeDtypeStruct((1, n + pad), jnp.int32)],
        interpret=interpret,
    )(packed, rays, sel, accel.planes)[0]
    return occ[0, :n] != 0


def intersect_clusters(o, d, t_min, t_max, accel: ClusterAccel,
                       block=512, interpret=None):
    """Nearest-hit over the clustered scene.  Returns a Hit (original ids).

    interpret=None auto-selects: Mosaic on TPU backends, interpreter
    elsewhere (the CPU test mesh), so the same call site works everywhere.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = o.shape[0]
    pad = (-n) % block
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3))])
        d = jnp.concatenate([d, jnp.ones((pad, 3))])
        t_min = jnp.concatenate([t_min, jnp.zeros(pad)])
        t_max = jnp.concatenate([t_max, jnp.zeros(pad)])
    shear = ray_shear(d)

    rays = jnp.stack(
        [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t_min, t_max]
    )  # (8, N)
    sel = jnp.stack(
        [
            shear.perm[:, 0].astype(jnp.float32),
            shear.perm[:, 1].astype(jnp.float32),
            shear.perm[:, 2].astype(jnp.float32),
            shear.sx,
            shear.sy,
        ]
    )  # (5, N)

    mask = block_cluster_mask(
        o, d, t_max, accel.cl_lo, accel.cl_hi, block
    )  # (n_blocks, n_clusters) bool
    n_words = -(-accel.n_clusters // 32)
    pad_c = n_words * 32 - accel.n_clusters
    if pad_c:
        mask = jnp.concatenate(
            [mask, jnp.zeros((mask.shape[0], pad_c), bool)], axis=1
        )
    bits = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    packed = jnp.sum(
        mask.reshape(mask.shape[0], n_words, 32).astype(jnp.uint32) * bits,
        axis=-1,
        dtype=jnp.uint32,
    ).T  # (n_words, n_blocks)

    grid = ((n + pad) // block,)
    row_blk = lambda h: pl.BlockSpec((h, block), lambda i, m: (0, i),
                                     memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((1, block), lambda i, m: (0, i),
                           memory_space=pltpu.VMEM)

    t, idx, u, v = pl.pallas_call(
        functools.partial(_kernel, n_clusters=accel.n_clusters),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # the (n_clusters, n_blocks) mask -> SMEM
            grid=grid,
            in_specs=[
                row_blk(8),
                row_blk(5),
                pl.BlockSpec(accel.planes.shape, lambda i, m: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[out_blk, out_blk, out_blk, out_blk],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),  # pipeline ray blocks
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, n + pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n + pad), jnp.int32),
            jax.ShapeDtypeStruct((1, n + pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n + pad), jnp.float32),
        ],
        interpret=interpret,
    )(packed, rays, sel, accel.planes)
    t = t[0, :n]
    idx = idx[0, :n]
    tri = jnp.where(idx >= 0, accel.order[jnp.maximum(idx, 0)], -1)
    t = jnp.where(tri >= 0, t, INF)
    return Hit(t=t, tri=tri, u=u[0, :n], v=v[0, :n])
