"""Pallas TPU intersection kernel: Morton-clustered culling traversal.

Role parity: the BVH acceleration structure (reference src/core/bvh.cpp)
re-designed for the TPU execution model.  Pointer-chasing per-ray traversal
is hostile to the VPU; instead:

  * triangles are Morton-sorted into clusters of 128 with AABBs (the LBVH
    leaf level, accel.py's morton ordering);
  * ray *blocks* are tested against cluster AABBs with conservative
    interval arithmetic — computed vectorised in XLA as a
    (n_blocks, n_clusters) `may_hit` mask *outside* the kernel;
  * the kernel processes one ray block per grid step, loops over clusters,
    and uses `@pl.when(may_hit[c])` to skip the vectorised watertight test
    for culled clusters.  Skipped clusters cost one scalar load + branch,
    so per-block work scales with what the block can see, not scene size.

Control flow stays block-uniform (the TPU-friendly traversal shape); tri
data is read with contiguous dynamic slices from VMEM — no per-lane gathers.
The in-kernel watertight test is the same permute-shear formulation as
geometry.intersect_chunk (geometry.cpp:32-115 parity, including the
FMA-noise snap in the edge functions).
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
    """Morton-ordered triangle clusters with AABBs."""

    tri_v0: Any  # (Tpad, 3)
    tri_v1: Any  # (Tpad, 3)
    tri_v2: Any  # (Tpad, 3)
    order: Any  # (Tpad,) int32 original tri id (-1 padding)
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
    lo_p = np.full((t_pad, 3), INF, np.float32)
    hi_p = np.full((t_pad, 3), -INF, np.float32)
    lo_p[:t] = lo[order]
    hi_p[:t] = hi[order]
    cl_lo = lo_p.reshape(n_cl, CLUSTER, 3).min(axis=1)
    cl_hi = hi_p.reshape(n_cl, CLUSTER, 3).max(axis=1)
    return ClusterAccel(
        tri_v0=jnp.asarray(tv[:, 0]),
        tri_v1=jnp.asarray(tv[:, 1]),
        tri_v2=jnp.asarray(tv[:, 2]),
        order=jnp.asarray(order_p),
        cl_lo=jnp.asarray(cl_lo),
        cl_hi=jnp.asarray(cl_hi),
        n_clusters=n_cl,
        n_tris=t,
    )


def block_cluster_mask(o, d, t_max, cl_lo, cl_hi, block):
    """Conservative (n_blocks, n_clusters) visibility mask, vectorised.

    Interval-arithmetic slab test between each ray block's bounds
    (origin box, direction box, tmax upper bound) and each cluster AABB.
    Axes whose direction interval spans zero give no constraint.
    """
    nb = o.shape[0] // block
    ob = o.reshape(nb, block, 3)
    db = d.reshape(nb, block, 3)
    o_lo = ob.min(axis=1)  # (nb, 3)
    o_hi = ob.max(axis=1)
    d_lo = db.min(axis=1)
    d_hi = db.max(axis=1)
    tmax_ub = t_max.reshape(nb, block).max(axis=1)  # (nb,)

    spans0 = (d_lo <= 0.0) & (d_hi >= 0.0)  # (nb, 3)
    il = 1.0 / jnp.where(spans0, 1.0, d_hi)
    ih = 1.0 / jnp.where(spans0, 1.0, d_lo)

    # (nb, 1, 3) vs (1, nc, 3)
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
    )  # (8, nb, nc, 3)
    t_lo = jnp.where(spans0[:, None], -INF, cands.min(axis=0))
    t_hi = jnp.where(spans0[:, None], INF, cands.max(axis=0))
    enter_lb = t_lo.max(axis=-1)  # (nb, nc)
    exit_ub = t_hi.min(axis=-1)
    return (
        (enter_lb <= exit_ub)
        & (exit_ub >= 0.0)
        & (enter_lb <= tmax_ub[:, None])
    )


def _kernel(
    mask_ref,  # (1, n_clusters) int32 — this block's cluster visibility
    o_ref,
    d_ref,
    tmin_ref,
    tmax_ref,
    shear_ref,  # (R, 8): perm0..2 (f32), sx, sy, sz, pad, pad
    v0_ref,
    v1_ref,
    v2_ref,
    t_out,
    idx_out,
    u_out,
    v_out,
    *,
    n_clusters,
):
    r = o_ref.shape[0]
    o = o_ref[:]
    d = d_ref[:]
    t_min = tmin_ref[:]
    perm0 = shear_ref[:, 0:1]
    perm1 = shear_ref[:, 1:2]
    perm2 = shear_ref[:, 2:3]
    sx = shear_ref[:, 3:4]
    sy = shear_ref[:, 4:5]

    def sel_ray(vec, axis):
        return jnp.where(
            axis == 0.0,
            vec[:, 0:1],
            jnp.where(axis == 1.0, vec[:, 1:2], vec[:, 2:3]),
        )

    o_a = sel_ray(o, perm0)
    o_b = sel_ray(o, perm1)
    o_c = sel_ray(o, perm2)

    t_out[:] = tmax_ref[:]
    idx_out[:] = jnp.full((r, 1), -1, jnp.int32)
    u_out[:] = jnp.zeros((r, 1), jnp.float32)
    v_out[:] = jnp.zeros((r, 1), jnp.float32)

    def cluster_body(c, _):
        @pl.when(mask_ref[0, c] != 0)
        def _():
            base = c * CLUSTER
            v0 = v0_ref[pl.ds(base, CLUSTER), :]
            v1 = v1_ref[pl.ds(base, CLUSTER), :]
            v2 = v2_ref[pl.ds(base, CLUSTER), :]
            n = jnp.cross(v1 - v0, v2 - v0)

            d_dot_n = (
                d[:, 0:1] * n[None, :, 0]
                + d[:, 1:2] * n[None, :, 1]
                + d[:, 2:3] * n[None, :, 2]
            )
            o_dot_n = (
                o[:, 0:1] * n[None, :, 0]
                + o[:, 1:2] * n[None, :, 1]
                + o[:, 2:3] * n[None, :, 2]
            )
            v0n = jnp.sum(v0 * n, axis=-1)
            t = (v0n[None, :] - o_dot_n) / d_dot_n

            t_best = t_out[:]
            in_range = (t > t_min) & (t < t_best)

            def sel_tri(vc, axis):
                return jnp.where(
                    axis == 0.0,
                    vc[None, :, 0],
                    jnp.where(axis == 1.0, vc[None, :, 1], vc[None, :, 2]),
                )

            def corner_xy(vc):
                ca = sel_tri(vc, perm0) - o_a
                cb = sel_tri(vc, perm1) - o_b
                cc = sel_tri(vc, perm2) - o_c
                return ca + cc * sx, cb + cc * sy

            p0x, p0y = corner_xy(v0)
            p1x, p1y = corner_xy(v1)
            p2x, p2y = corner_xy(v2)

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

            # reduction-based argmin/select (per-lane gathers don't lower)
            t_hit = jnp.where(hit, t, INF)
            t_sel = jnp.min(t_hit, axis=-1, keepdims=True)
            cols = jax.lax.broadcasted_iota(jnp.int32, (r, CLUSTER), 1)
            best = jnp.min(
                jnp.where(t_hit == t_sel, cols, jnp.int32(CLUSTER + 1)),
                axis=-1,
                keepdims=True,
            )
            onehot = (cols == best) & (t_hit == t_sel)
            esum = jnp.sum(jnp.where(onehot, e0 + e1 + e2, 0.0), -1, keepdims=True)
            e0s = jnp.sum(jnp.where(onehot, e0, 0.0), -1, keepdims=True)
            e1s = jnp.sum(jnp.where(onehot, e1, 0.0), -1, keepdims=True)
            better = t_sel < t_best
            inv_det = 1.0 / jnp.where(esum == 0.0, 1.0, esum)
            t_out[:] = jnp.where(better, t_sel, t_best)
            idx_out[:] = jnp.where(
                better, (base + best).astype(jnp.int32), idx_out[:]
            )
            u_out[:] = jnp.where(better, e0s * inv_det, u_out[:])
            v_out[:] = jnp.where(better, e1s * inv_det, v_out[:])

    jax.lax.fori_loop(0, n_clusters, cluster_body, None)


def intersect_clusters(o, d, t_min, t_max, accel: ClusterAccel,
                       block=512, interpret=False):
    """Nearest-hit over the clustered scene.  Returns a Hit (original ids)."""
    n = o.shape[0]
    pad = (-n) % block
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3))])
        d = jnp.concatenate([d, jnp.ones((pad, 3))])
        t_min = jnp.concatenate([t_min, jnp.zeros(pad)])
        t_max = jnp.concatenate([t_max, jnp.zeros(pad)])
    shear = ray_shear(d)
    shear_pack = jnp.concatenate(
        [
            shear.perm.astype(jnp.float32),
            shear.sx[:, None],
            shear.sy[:, None],
            shear.sz[:, None],
            jnp.zeros((n + pad, 2), jnp.float32),
        ],
        axis=-1,
    )  # (N, 8)

    mask = block_cluster_mask(
        o, d, t_max, accel.cl_lo, accel.cl_hi, block
    ).astype(jnp.int32)  # (nb, nc)

    grid = ((n + pad) // block,)
    blk = lambda w: pl.BlockSpec((block, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, accel.n_clusters), lambda i: (i, 0),
                             memory_space=pltpu.SMEM)

    t, idx, u, v = pl.pallas_call(
        functools.partial(_kernel, n_clusters=accel.n_clusters),
        grid=grid,
        in_specs=[
            mask_spec,
            blk(3),
            blk(3),
            blk(1),
            blk(1),
            blk(8),
            full(accel.tri_v0),
            full(accel.tri_v1),
            full(accel.tri_v2),
        ],
        out_specs=[blk(1), blk(1), blk(1), blk(1)],
        out_shape=[
            jax.ShapeDtypeStruct((n + pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n + pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n + pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n + pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        mask,
        o,
        d,
        t_min[:, None],
        t_max[:, None],
        shear_pack,
        accel.tri_v0,
        accel.tri_v1,
        accel.tri_v2,
    )
    t = t[:n, 0]
    idx = idx[:n, 0]
    tri = jnp.where(idx >= 0, accel.order[jnp.maximum(idx, 0)], -1)
    t = jnp.where(tri >= 0, t, INF)
    return Hit(t=t, tri=tri, u=u[:n, 0], v=v[:n, 0])
