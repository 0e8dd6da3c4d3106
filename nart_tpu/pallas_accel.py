"""Pallas TPU intersection kernel: Morton-clustered culling traversal.

Role parity: the BVH acceleration structure (reference src/core/bvh.cpp)
re-designed for the TPU execution model.  Pointer-chasing per-ray traversal
is hostile to the VPU; instead:

  * triangles are Morton-sorted and grouped into clusters of 128 with
    precomputed AABBs (the LBVH leaf level);
  * the kernel processes one *block* of rays per grid step, keeping the
    block's rays and running best-hit state in VMEM;
  * for every cluster, a SCALAR conservative interval-arithmetic slab test
    (block ray bounds vs cluster AABB) decides — via `@pl.when` — whether
    the block runs the vectorised watertight test on that cluster's
    triangles at all.  Skipped clusters cost ~a dozen scalar ops, so work
    scales with what the block can actually see, not with scene size.

This is the "stackless traversal" shape that fits the hardware: uniform
control flow per block, dense (R, 128) vector math on the VPU, contiguous
dynamic slices instead of per-lane gathers.  Ray blocks inherit raster /
bounce coherence; incoherent blocks degrade gracefully to brute force.

The watertight triangle test inside the kernel is the same permute-shear
formulation as geometry.intersect_chunk (geometry.cpp:32-115 parity,
including the FMA-noise snap in the edge functions).
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
from .geometry import Hit
from .tree import pytree_dataclass

INF = np.float32(np.inf)
CLUSTER = 128  # triangles per cluster == VPU lane width


@pytree_dataclass(meta_fields=("n_clusters", "n_tris"))
@dataclass
class ClusterAccel:
    """Morton-ordered triangle clusters with AABBs."""

    tri_v0: Any  # (Tpad, 3)  reordered corner 0
    tri_e1: Any  # (Tpad, 3)  v1 (not edge; kept as corners)
    tri_e2: Any  # (Tpad, 3)  v2
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
        tri_e1=jnp.asarray(tv[:, 1]),
        tri_e2=jnp.asarray(tv[:, 2]),
        order=jnp.asarray(order_p),
        cl_lo=jnp.asarray(cl_lo),
        cl_hi=jnp.asarray(cl_hi),
        n_clusters=n_cl,
        n_tris=t,
    )


def _kernel(
    o_ref,
    d_ref,
    tmin_ref,
    tmax_ref,
    shear_ref,  # (R, 6): perm0, perm1, perm2 (as f32), sx, sy, sz
    v0_ref,
    v1_ref,
    v2_ref,
    cl_lo_ref,
    cl_hi_ref,
    t_out,
    idx_out,
    u_out,
    v_out,
    *,
    n_clusters,
):
    r = o_ref.shape[0]
    o = o_ref[:]  # (R, 3)
    d = d_ref[:]
    t_min = tmin_ref[:]  # (R, 1)
    perm0 = shear_ref[:, 0:1]
    perm1 = shear_ref[:, 1:2]
    perm2 = shear_ref[:, 2:3]
    sx = shear_ref[:, 3:4]
    sy = shear_ref[:, 4:5]

    # block ray bounds for the conservative cluster test (scalars)
    o_lo = jnp.min(o, axis=0)  # (3,)
    o_hi = jnp.max(o, axis=0)
    d_lo = jnp.min(d, axis=0)
    d_hi = jnp.max(d, axis=0)
    tmax_ub = jnp.max(tmax_ref[:])

    def sel_ray(vec, axis):  # (R,3), (R,1) -> (R,1)
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
        lo_n = cl_lo_ref[pl.ds(c, 1), :][0]  # (3,)
        hi_n = cl_hi_ref[pl.ds(c, 1), :][0]

        # conservative interval slab test (per axis, scalar)
        def axis_bounds(k):
            a_lo = lo_n[k] - o_hi[k]
            a_hi = lo_n[k] - o_lo[k]
            b_lo = hi_n[k] - o_hi[k]
            b_hi = hi_n[k] - o_lo[k]
            dl, dh = d_lo[k], d_hi[k]
            spans0 = (dl <= 0.0) & (dh >= 0.0)
            il = 1.0 / jnp.where(spans0, 1.0, dh)
            ih = 1.0 / jnp.where(spans0, 1.0, dl)
            # interval products for both planes
            cands = jnp.stack(
                [a_lo * il, a_lo * ih, a_hi * il, a_hi * ih,
                 b_lo * il, b_lo * ih, b_hi * il, b_hi * ih]
            )
            t_lo = jnp.where(spans0, -INF, jnp.min(cands))
            t_hi = jnp.where(spans0, INF, jnp.max(cands))
            return t_lo, t_hi

        l0, h0 = axis_bounds(0)
        l1, h1 = axis_bounds(1)
        l2, h2 = axis_bounds(2)
        enter_lb = jnp.maximum(jnp.maximum(l0, l1), l2)
        exit_ub = jnp.minimum(jnp.minimum(h0, h1), h2)
        may_hit = (enter_lb <= exit_ub) & (exit_ub >= 0.0) & (
            enter_lb <= tmax_ub
        )

        @pl.when(may_hit)
        def _():
            base = c * CLUSTER
            v0 = v0_ref[pl.ds(base, CLUSTER), :]  # (C, 3)
            v1 = v1_ref[pl.ds(base, CLUSTER), :]
            v2 = v2_ref[pl.ds(base, CLUSTER), :]
            n = jnp.cross(v1 - v0, v2 - v0)  # (C, 3)

            d_dot_n = (
                d[:, 0:1] * n[None, :, 0]
                + d[:, 1:2] * n[None, :, 1]
                + d[:, 2:3] * n[None, :, 2]
            )  # (R, C)
            o_dot_n = (
                o[:, 0:1] * n[None, :, 0]
                + o[:, 1:2] * n[None, :, 1]
                + o[:, 2:3] * n[None, :, 2]
            )
            v0n = jnp.sum(v0 * n, axis=-1)  # (C,)
            t = (v0n[None, :] - o_dot_n) / d_dot_n

            t_best = t_out[:]  # (R, 1)
            in_range = (t > t_min) & (t < t_best)

            def sel_tri(vc, axis):  # (C,3), (R,1) -> (R,C)
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

            # reduction-based argmin/select (per-lane gathers don't lower
            # to Mosaic): first-wins ties via column-iota keying
            t_hit = jnp.where(hit, t, INF)
            t_sel = jnp.min(t_hit, axis=-1, keepdims=True)  # (R, 1)
            cols = jax.lax.broadcasted_iota(jnp.int32, (r, CLUSTER), 1)
            big = jnp.int32(CLUSTER + 1)
            best = jnp.min(
                jnp.where(t_hit == t_sel, cols, big), axis=-1, keepdims=True
            )
            onehot = (cols == best) & (t_hit == t_sel)
            esum = jnp.sum(jnp.where(onehot, e0 + e1 + e2, 0.0), -1,
                           keepdims=True)
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
    from .geometry import ray_shear

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
        ],
        axis=-1,
    )  # (N, 6)

    grid = ((n + pad) // block,)
    blk = lambda w: pl.BlockSpec((block, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)

    t, idx, u, v = pl.pallas_call(
        functools.partial(_kernel, n_clusters=accel.n_clusters),
        grid=grid,
        in_specs=[
            blk(3),  # o
            blk(3),  # d
            blk(1),  # tmin
            blk(1),  # tmax
            blk(6),  # shear
            full(accel.tri_v0),
            full(accel.tri_e1),
            full(accel.tri_e2),
            full(accel.cl_lo),
            full(accel.cl_hi),
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
        o,
        d,
        t_min[:, None],
        t_max[:, None],
        shear_pack,
        accel.tri_v0,
        accel.tri_e1,
        accel.tri_e2,
        accel.cl_lo,
        accel.cl_hi,
    )
    t = t[:n, 0]
    idx = idx[:n, 0]
    tri = jnp.where(idx >= 0, accel.order[jnp.maximum(idx, 0)], -1)
    t = jnp.where(tri >= 0, t, INF)
    return Hit(t=t, tri=tri, u=u[:n, 0], v=v[:n, 0])
