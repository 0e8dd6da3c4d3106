"""Pallas TPU intersection kernel: clustered front-to-back traversal.

Role parity: the BVH acceleration structure (reference src/core/bvh.cpp)
re-designed for the TPU execution model.  Pointer-chasing per-ray traversal
is hostile to the VPU; instead:

  * triangles are spatially clustered (recursive median split on large
    meshes — disjoint half-space clusters; Morton sort on small ones) into
    runs of csize (128 small / 64 large) and stored as LANE-ALIGNED
    coordinate planes — 13 arrays of shape (n_clusters, csize): the 9
    corner coordinates plus the precomputed unnormalised geometric normal
    and v0.n (hoisting the cross product out of the kernel).  Every
    in-kernel tensor is then a natural (csize, R) tile;
  * ray *blocks* are tested against cluster AABBs with conservative
    interval arithmetic, vectorised in XLA before the kernel launches, and
    compacted into a per-block visit list SORTED by the block's entry-t
    lower bound (front-to-back) — the data-parallel analog of the
    reference's priority-queue BV walk (bvh.cpp:132-176);
  * the kernel handles one ray block per grid step and loops over ONLY the
    visible clusters (`while k < count[blk]`).  Each visited cluster is
    first slab-tested per ray against the current t_best window (~1/100 the
    cost of the triangle test); the 128-triangle watertight test runs only
    when some ray can still be improved, and the loop exits outright once
    the next cluster's entry lower bound exceeds every ray's t_best — the
    early-exit of a priority-queue traversal, block-uniform.

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
# default triangles per cluster.  The watertight test runs a (csize, BLOCK)
# tile per visited cluster with triangles on the SUBLANE axis, so any
# multiple of 8 works; smaller clusters have tighter AABBs (fewer wasted
# triangle tests on large meshes) at more slab tests.  Per-accel static
# (ClusterAccel.csize); env-overridable for tuning.
CLUSTER = 128
# rays per kernel block (grid step).  Smaller blocks see tighter interval
# bounds (better culling on incoherent wavefronts) at more grid steps;
# 512 measured best on the reference scenes.  Env-overridable for tuning.
import os as _os

BLOCK = 512


# target size of the SUPERCLUSTER visit list: the per-block XLA prefilter
# (interval test + argsort) runs at this granularity, so its cost stops
# scaling with triangle count — 738-cluster cameraLens paid an
# argsort(nb x 738) per bounce before the second level.  128 measured
# faster than 64 on cameraLens (1.13 vs 1.07 Mrays/s): finer
# front-to-back entries cull more member clusters.
SUPER_TARGET = 128


@pytree_dataclass(
    meta_fields=("n_clusters", "n_tris", "n_sc", "sc_size", "csize",
                 "block")
)
@dataclass
class ClusterAccel:
    """Two-level spatially-ordered triangle clusters.

    Level 0: clusters of csize triangles (median-split or Morton order —
    see build_clusters), lane-aligned coordinate planes.  Level 1:
    superclusters of sc_size consecutive clusters — the granularity of
    the per-block visit lists.  sc_size is 1 for scenes under the
    supercluster target (the second level degenerates to the first: zero
    overhead), else ceil(n_clusters / target).
    """

    planes: Any  # (13, n_clusters, csize): v0x v0y v0z v1x..v2z nx ny nz v0n
    order: Any  # (n_clusters * csize,) int32 original tri id (-1 padding)
    aabb: Any  # (6, n_clusters): lox loy loz hix hiy hiz (lane-major layout)
    sc_aabb: Any  # (6, n_sc): supercluster AABBs, same layout
    morder: Any  # (8, n_sc * sc_size) int32: per-direction-octant member
    # visit order (ascending centroid projection along the octant
    # diagonal) — approximate front-to-back WITHIN a supercluster, so
    # t_best tightens early and later members fail their slab gates
    cl_lo: Any  # (n_clusters, 3) — kept for oracle/mask tests
    cl_hi: Any  # (n_clusters, 3)
    n_clusters: int
    n_tris: int
    n_sc: int
    sc_size: int
    csize: int
    block: int  # default rays-per-kernel-block for this accel


def _median_split_order(centroid: np.ndarray, csize: int) -> np.ndarray:
    """Recursive largest-axis median split; returns a triangle order.

    Consecutive runs of csize triangles (the clusters) are spatially
    DISJOINT half-spaces, unlike a Morton sort whose clusters overlap
    badly on ring/shell geometry (a lens barrel's concentric elements put
    distant triangles in one cluster, inflating every cluster AABB).  DFS
    order keeps sibling leaves adjacent, so supercluster AABBs (groups of
    consecutive clusters) inherit the same tightness."""
    n = centroid.shape[0]
    order = np.empty(n, np.int32)
    pos = [0]
    stack = [np.arange(n, dtype=np.int32)]
    while stack:
        idx = stack.pop()
        if len(idx) <= csize:
            order[pos[0]:pos[0] + len(idx)] = idx
            pos[0] += len(idx)
            continue
        c = centroid[idx]
        ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        # split at a cluster-size multiple so every leaf but the last is
        # exactly csize (keeps the padded grid dense)
        half = ((len(idx) // 2 + csize - 1) // csize) * csize
        part = np.argpartition(c[:, ax], min(half, len(idx) - 1))
        stack.append(idx[part[half:]])
        stack.append(idx[part[:half]])
    return order


def build_clusters(tri_v: np.ndarray, super_target=SUPER_TARGET,
                   csize=None, block=None) -> ClusterAccel:
    tri_v = np.asarray(tri_v, np.float32)
    # size policy (measured on TPU v5e): small scenes run fastest with
    # 128-tri clusters and 512-ray blocks (glassSphere 4.0 Mrays/s vs 3.5
    # at 64/256); large meshes flip (cameraLens 94k tris: 1.00 Mrays/s at
    # 64/256 vs 0.92 at 128/512 — tighter AABBs cull more wasted triangle
    # tests, finer blocks see tighter interval bounds)
    large = len(tri_v) >= 32768
    super_target = (int(_os.environ.get("NART_SUPER_TARGET", "0"))
                    or (256 if large else super_target))
    if csize is None:
        # large meshes: 64-tri clusters (half the per-visit tile at
        # ~1.05 us per (csize,128) watertight — the VPU is compute-bound
        # there, so smaller+tighter wins: cameraLens 48.3 -> 45.3
        # ms/round with super_target 256); small scenes keep 128
        csize = (int(_os.environ.get("NART_CLUSTER_SIZE", "0"))
                 or (64 if large else CLUSTER))
    if block is None:
        # large meshes: big blocks + per-128-lane chunk gating (see
        # _kernel) amortize the visit-list walk over 4096 rays while the
        # triangle test still runs at 128-lane granularity — measured
        # 57.5 -> 48.4 ms/round on cameraLens vs the round-4 256-ungated
        # default.  Small scenes keep 512 ungated (every chunk is live on
        # a 10-cluster scene; gating is pure branch overhead: glassSphere
        # 7.1 -> 5.4 Mrays/s if gated).
        block = (int(_os.environ.get("NART_PALLAS_BLOCK", "0"))
                 or (4096 if large else BLOCK))
    t = len(tri_v)
    lo = tri_v.min(axis=1)
    hi = tri_v.max(axis=1)
    centroid = 0.5 * (lo + hi)
    scene_lo = lo.min(axis=0)
    extent = np.maximum(hi.max(axis=0) - scene_lo, 1e-12)
    method = _os.environ.get("NART_CLUSTER_METHOD",
                             "median" if large else "morton")
    if method == "median":
        # disjoint half-space clusters: tighter AABBs on shell/ring
        # geometry (cameraLens 52.2 -> 48.4 ms/round vs morton); morton
        # measured better on small scenes (glassSphere 7.1 vs 6.6)
        order = _median_split_order(centroid, csize)
    else:
        codes = morton3(*((centroid - scene_lo) / extent).T)
        order = np.argsort(codes, kind="stable").astype(np.int32)

    n_cl = max(1, -(-t // csize))
    sc_size = max(1, -(-n_cl // super_target))
    n_cl = -(-n_cl // sc_size) * sc_size  # pad to a whole supercluster grid
    n_sc = n_cl // sc_size
    t_pad = n_cl * csize
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
    ).reshape(13, n_cl, csize)

    lo_p = np.full((t_pad, 3), INF, np.float32)
    hi_p = np.full((t_pad, 3), -INF, np.float32)
    lo_p[:t] = lo[order]
    hi_p[:t] = hi[order]
    cl_lo = lo_p.reshape(n_cl, csize, 3).min(axis=1)
    cl_hi = hi_p.reshape(n_cl, csize, 3).max(axis=1)
    # empty (all-padding) clusters keep (+inf, -inf) bounds: every slab /
    # interval test rejects them, and their zeroed planes cannot hit
    sc_lo = cl_lo.reshape(n_sc, sc_size, 3).min(axis=1)
    sc_hi = cl_hi.reshape(n_sc, sc_size, 3).max(axis=1)
    # per-octant member visit orders: octant o's diagonal is
    # (±1, ±1, ±1); order each supercluster's members by ascending
    # projection of the cluster centroid onto it (empty clusters last —
    # their (+inf,-inf) bounds give centroid NaN -> pushed to the end)
    cl_cent = 0.5 * (cl_lo + cl_hi)  # (n_cl, 3)
    morder = np.zeros((8, n_sc, sc_size), np.int32)
    base = np.arange(n_cl, dtype=np.int32).reshape(n_sc, sc_size)
    for o in range(8):
        sgn = np.array(
            [1.0 if o & 4 else -1.0,
             1.0 if o & 2 else -1.0,
             1.0 if o & 1 else -1.0], np.float32)
        proj = cl_cent @ sgn
        proj = np.where(np.isfinite(proj), proj, np.float32(np.inf))
        rank = np.argsort(proj.reshape(n_sc, sc_size), axis=1,
                          kind="stable")
        morder[o] = np.take_along_axis(base, rank, axis=1)
    return ClusterAccel(
        planes=jnp.asarray(planes.astype(np.float32)),
        order=jnp.asarray(order_p),
        aabb=jnp.asarray(
            np.concatenate([cl_lo.T, cl_hi.T], axis=0).astype(np.float32)
        ),
        sc_aabb=jnp.asarray(
            np.concatenate([sc_lo.T, sc_hi.T], axis=0).astype(np.float32)
        ),
        morder=jnp.asarray(morder.reshape(8, n_cl)),
        cl_lo=jnp.asarray(cl_lo),
        cl_hi=jnp.asarray(cl_hi),
        n_clusters=n_cl,
        n_tris=t,
        n_sc=n_sc,
        sc_size=sc_size,
        csize=csize,
        block=block,
    )


def _block_cluster_bounds(o, d, t_max, aabb, block):
    """Conservative per-(block, cluster) visibility + entry-t lower bound.

    Interval-arithmetic slab test between each ray block's bounds and each
    cluster AABB; axes whose direction interval spans zero give no
    constraint.  All arrays are laid out with the cluster axis minor
    (lane dimension) — a (..., 3) minor axis wastes 125/128 lanes per tile
    on TPU and measured 26 ms where this version is ~1 ms.

    Returns (visible (nb, nc) bool, entry_lb (nb, nc) f32).
    """
    nb = o.shape[0] // block
    oT = o.T.reshape(3, nb, block)
    dT = d.T.reshape(3, nb, block)
    o_lo = oT.min(axis=2)  # (3, nb)
    o_hi = oT.max(axis=2)
    d_lo = dT.min(axis=2)
    d_hi = dT.max(axis=2)
    tmax_ub = t_max.reshape(nb, block).max(axis=1)  # (nb,)

    enter_lb = jnp.full((nb, aabb.shape[1]), -INF, jnp.float32)
    exit_ub = jnp.full((nb, aabb.shape[1]), INF, jnp.float32)
    for k in range(3):
        spans0 = (d_lo[k] <= 0.0) & (d_hi[k] >= 0.0)  # (nb,)
        il = (1.0 / jnp.where(spans0, 1.0, d_hi[k]))[:, None]
        ih = (1.0 / jnp.where(spans0, 1.0, d_lo[k]))[:, None]
        a_lo = aabb[k][None, :] - o_hi[k][:, None]  # (nb, nc)
        a_hi = aabb[k][None, :] - o_lo[k][:, None]
        b_lo = aabb[k + 3][None, :] - o_hi[k][:, None]
        b_hi = aabb[k + 3][None, :] - o_lo[k][:, None]
        c0, c1 = a_lo * il, a_lo * ih
        c2, c3 = a_hi * il, a_hi * ih
        c4, c5 = b_lo * il, b_lo * ih
        c6, c7 = b_hi * il, b_hi * ih
        t_lo = jnp.minimum(
            jnp.minimum(jnp.minimum(c0, c1), jnp.minimum(c2, c3)),
            jnp.minimum(jnp.minimum(c4, c5), jnp.minimum(c6, c7)),
        )
        t_hi = jnp.maximum(
            jnp.maximum(jnp.maximum(c0, c1), jnp.maximum(c2, c3)),
            jnp.maximum(jnp.maximum(c4, c5), jnp.maximum(c6, c7)),
        )
        sp = spans0[:, None]
        enter_lb = jnp.maximum(enter_lb, jnp.where(sp, -INF, t_lo))
        exit_ub = jnp.minimum(exit_ub, jnp.where(sp, INF, t_hi))

    visible = (
        (enter_lb <= exit_ub)
        & (exit_ub >= 0.0)
        & (enter_lb <= tmax_ub[:, None])
        # a block whose every ray has t_max <= 0 can never record a hit
        # (in_range needs t_min < t < t_max); this also catches culled
        # lanes whose direction intervals span zero on every axis
        & (tmax_ub[:, None] > 0.0)
    )
    return visible, enter_lb


def block_cluster_mask(o, d, t_max, cl_lo, cl_hi, block):
    """Conservative (n_blocks, n_clusters) visibility mask (oracle surface).

    Thin wrapper over _block_cluster_bounds for tests/tools that only need
    the boolean mask; the traversal itself uses build_block_lists.
    """
    aabb = jnp.concatenate([cl_lo.T, cl_hi.T], axis=0)
    visible, _ = _block_cluster_bounds(o, d, t_max, aabb, block)
    return visible


def build_block_lists(o, d, t_max, accel: ClusterAccel, block):
    """Compacted front-to-back per-block SUPERCLUSTER visit lists.

    Returns (sc_list (nb, n_sc) int32 — visible supercluster ids sorted by
    the block's entry-t lower bound, padding after count; sc_entry (nb,
    n_sc) f32 — the sorted entry lower bounds, +inf padding; sc_count
    (nb,) int32).  Working at the supercluster level keeps this prefilter
    (interval test + argsort) O(SUPER_TARGET) per block regardless of the
    scene's cluster count; the kernel refines with per-ray slab tests of
    the member clusters.
    """
    visible, entry_lb = _block_cluster_bounds(
        o, d, t_max, accel.sc_aabb, block
    )
    # clamp visible keys below +inf: near-degenerate direction intervals can
    # overflow entry_lb to +inf, which would tie with invisible padding in
    # the argsort and let a visible supercluster sort past the count cutoff
    key = jnp.where(visible, jnp.minimum(entry_lb, np.float32(3.0e38)), INF)
    sc_list = jnp.argsort(key, axis=1).astype(jnp.int32)
    sc_entry = jnp.take_along_axis(key, sc_list, axis=1)
    sc_count = visible.sum(axis=1).astype(jnp.int32)
    # (nb, 1, n_sc): Mosaic requires the last two block dims be (8, 128)-
    # divisible or span the array, so the per-block SMEM row rides a
    # singleton middle axis
    nb, nsc = sc_list.shape
    return sc_list.reshape(nb, 1, nsc), sc_entry.reshape(nb, 1, nsc), sc_count


def _ray_vectors(ray_ref, sel_ref):
    """Unpack the (8, R)/(5, R) ray rows into (1, R) vectors."""
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
    return ox, oy, oz, dx, dy, dz, t_min, t_max, perm0, perm1, perm2, sx, sy


def _sel(x, y, z, axis):  # components (1,R), axis (1,R) -> (1,R)
    return jnp.where(axis == 0.0, x, jnp.where(axis == 1.0, y, z))


def _block_frame(rv):
    """Block-uniform watertight frame (scalar_perm mode).

    The permute-shear selects are ~half the watertight tile ops when done
    per ray ((C, R) where-chains per corner).  Rays are sorted by
    (major axis, octant, origin) — path._sort_key — so a BLOCK-scalar
    axis choice matches almost every ray: the majority major axis is
    picked by |d|-sum vote over live lanes, the per-ray shear constants
    are recomputed against it, and the corner selects collapse to scalar
    row choices on (C, 1) vectors.  Watertightness needs only a
    CONSISTENT frame per ray (shared edges get identical edge-function
    values), which any fixed axis provides; a minority ray with a small
    (even zero, clamped) component along the block axis only loses
    shear-frame conditioning, the same degradation the reference accepts
    near axis ties (geometry.cpp:3-15)."""
    live = rv[7] > 0.0
    lw = live.astype(jnp.float32)
    ax = jnp.sum(jnp.abs(rv[3]) * lw)
    ay = jnp.sum(jnp.abs(rv[4]) * lw)
    az = jnp.sum(jnp.abs(rv[5]) * lw)
    # C++ tie-break parity (geometry.cpp majorAxis selection)
    major = jnp.where(ax > ay, jnp.where(ax > az, 0, 2),
                      jnp.where(ay > az, 1, 2))
    m0 = (major + 1) % 3
    m1 = (major + 2) % 3
    return _frame_vectors(rv, m0, m1, major)


def _frame_vectors(rv, m0, m1, major):
    """Per-ray shear constants against block-scalar axes (m0, m1, major)."""

    def srow(x, y, z, a):  # scalar axis pick over (1, R) rows
        return jnp.where(a == 0, x, jnp.where(a == 1, y, z))

    d_major = srow(rv[3], rv[4], rv[5], major)
    inv = 1.0 / jnp.where(d_major == 0.0, np.float32(1e-30), d_major)
    sx = -srow(rv[3], rv[4], rv[5], m0) * inv
    sy = -srow(rv[3], rv[4], rv[5], m1) * inv
    o_a = srow(rv[0], rv[1], rv[2], m0)
    o_b = srow(rv[0], rv[1], rv[2], m1)
    o_c = srow(rv[0], rv[1], rv[2], major)
    return m0, m1, major, sx, sy, o_a, o_b, o_c


def _watertight_frame(pcl, rv, frame):
    """Watertight test in the block-scalar frame (see _block_frame).

    Same math as _watertight with the (C, R) permutation selects replaced
    by scalar row choices on (C, 1) vectors."""
    m0, m1, major, sx, sy, o_a, o_b, o_c = frame
    dx, dy, dz = rv[3], rv[4], rv[5]
    ox, oy, oz = rv[0], rv[1], rv[2]
    nx = pcl[9, :][:, None]
    ny = pcl[10, :][:, None]
    nz = pcl[11, :][:, None]
    v0n = pcl[12, :][:, None]

    d_dot_n = dx * nx + dy * ny + dz * nz
    o_dot_n = ox * nx + oy * ny + oz * nz
    t = (v0n - o_dot_n) / d_dot_n

    def vsel(base):
        x = pcl[base + 0, :][:, None]
        y = pcl[base + 1, :][:, None]
        z = pcl[base + 2, :][:, None]

        def pick(a):
            return jnp.where(a == 0, x, jnp.where(a == 1, y, z))

        return pick(m0), pick(m1), pick(major)

    def corner_xy(base):
        va, vb, vc = vsel(base)
        ca = va - o_a
        cb = vb - o_b
        cc = vc - o_c
        return ca + cc * sx, cb + cc * sy

    p0x, p0y = corner_xy(0)
    p1x, p1y = corner_xy(3)
    p2x, p2y = corner_xy(6)

    def edge(ax_, ay_, bx_, by_):
        pa = ax_ * by_
        pb = ay_ * bx_
        e = pa - pb
        noise = (jnp.abs(pa) + jnp.abs(pb)) * np.float32(2.0**-22)
        return jnp.where(jnp.abs(e) <= noise, 0.0, e)

    e0 = edge(p1x, p1y, p2x, p2y)
    e1 = edge(p2x, p2y, p0x, p0y)
    e2 = edge(p0x, p0y, p1x, p1y)
    neg = (e0 < 0) | (e1 < 0) | (e2 < 0)
    pos = (e0 > 0) | (e1 > 0) | (e2 > 0)
    hit = ~(neg & pos) & (jnp.abs(e0) + jnp.abs(e1) + jnp.abs(e2) != 0.0)
    return hit, t, e0, e1, e0 + e1 + e2


def _watertight(pcl, rv):
    """Watertight permute-shear test of one cluster against the ray block.

    pcl: (13, CLUSTER) coordinate planes.  rv: the _ray_vectors tuple.
    Returns (hit (C,R) bool sans t-window, t (C,R), e0, e1, esum).
    The caller applies its own t-range predicate.
    """
    ox, oy, oz, dx, dy, dz, _, _, perm0, perm1, perm2, sx, sy = rv
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

    o_a = _sel(ox, oy, oz, perm0)
    o_b = _sel(ox, oy, oz, perm1)
    o_c = _sel(ox, oy, oz, perm2)

    def corner_xy(vx, vy, vz):
        ca = _sel(vx, vy, vz, perm0) - o_a
        cb = _sel(vx, vy, vz, perm1) - o_b
        cc = _sel(vx, vy, vz, perm2) - o_c
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
    hit = ~(neg & pos) & (jnp.abs(e0) + jnp.abs(e1) + jnp.abs(e2) != 0.0)
    return hit, t, e0, e1, e0 + e1 + e2


def _cluster_slab(aabb_ref, c, rv, inv_x, inv_y, inv_z, t_lo, t_hi):
    """Per-ray slab test of cluster c's AABB against the (t_lo, t_hi) window.

    Scalars come from the prefetched (6, nc) AABB planes; all vector math is
    (1, R).  Conservative: zero direction components use a tiny magnitude
    instead of infinities, so on-slab origins never cull (no 0*inf NaNs).
    """
    ox, oy, oz = rv[0], rv[1], rv[2]
    lox, loy, loz = aabb_ref[0, c], aabb_ref[1, c], aabb_ref[2, c]
    hix, hiy, hiz = aabb_ref[3, c], aabb_ref[4, c], aabb_ref[5, c]
    ax0 = (lox - ox) * inv_x
    ax1 = (hix - ox) * inv_x
    ay0 = (loy - oy) * inv_y
    ay1 = (hiy - oy) * inv_y
    az0 = (loz - oz) * inv_z
    az1 = (hiz - oz) * inv_z
    near = jnp.maximum(
        jnp.maximum(jnp.minimum(ax0, ax1), jnp.minimum(ay0, ay1)),
        jnp.minimum(az0, az1),
    )
    far = jnp.minimum(
        jnp.minimum(jnp.maximum(ax0, ax1), jnp.maximum(ay0, ay1)),
        jnp.maximum(az0, az1),
    )
    return (jnp.maximum(near, t_lo) <= jnp.minimum(far, t_hi))  # (1, R)


def _inv_dir(dx, dy, dz):
    tiny = np.float32(1e-30)
    return (
        1.0 / jnp.where(dx == 0.0, tiny, dx),
        1.0 / jnp.where(dy == 0.0, tiny, dy),
        1.0 / jnp.where(dz == 0.0, tiny, dz),
    )


def _block_octant(rv):
    """Majority direction octant of the block's live rays (scalar int32).

    The caller sorts rays by a key whose leading bits are this same octant
    (path._sort_key), so blocks are octant-uniform away from boundaries;
    a majority vote handles the mixed remainder.  Bit layout matches the
    sort key: 4*(dx>0) + 2*(dy>0) + (dz>0)."""
    live = rv[7] > 0.0

    def maj(c):
        return jnp.sum(jnp.where(live & (c > 0.0), 1.0, 0.0)) > (
            0.5 * jnp.maximum(jnp.sum(live.astype(jnp.float32)), 1.0)
        )

    return (
        maj(rv[3]).astype(jnp.int32) * 4
        + maj(rv[4]).astype(jnp.int32) * 2
        + maj(rv[5]).astype(jnp.int32)
    )


def _ray_vectors_q(ray_ref, sel_ref, qs, qe, with_sel=True):
    """Load lanes [qs, qe) of the ray/sel rows as fresh (1, q) vectors.

    Chunked loads straight from the VMEM refs (NOT slices of the full-width
    vectors: Mosaic cannot broadcast a lane-offset slice, 'Invalid input
    layout')."""
    ox = ray_ref[0, qs:qe][None, :]
    oy = ray_ref[1, qs:qe][None, :]
    oz = ray_ref[2, qs:qe][None, :]
    dx = ray_ref[3, qs:qe][None, :]
    dy = ray_ref[4, qs:qe][None, :]
    dz = ray_ref[5, qs:qe][None, :]
    t_min = ray_ref[6, qs:qe][None, :]
    t_max = ray_ref[7, qs:qe][None, :]
    if with_sel:
        perm0 = sel_ref[0, qs:qe][None, :]
        perm1 = sel_ref[1, qs:qe][None, :]
        perm2 = sel_ref[2, qs:qe][None, :]
        sx = sel_ref[3, qs:qe][None, :]
        sy = sel_ref[4, qs:qe][None, :]
    else:
        perm0 = perm1 = perm2 = sx = sy = jnp.zeros_like(ox)
    return ox, oy, oz, dx, dy, dz, t_min, t_max, perm0, perm1, perm2, sx, sy


def _kernel(
    count_ref,  # (n_blocks,) int32, scalar-prefetched to SMEM
    aabb_ref,  # (6, n_clusters) f32, scalar-prefetched to SMEM
    sc_aabb_ref,  # (6, n_sc) f32, scalar-prefetched to SMEM
    morder_ref,  # (8, n_clusters) int32: per-octant member visit order
    ray_ref,  # (8, R): ox oy oz dx dy dz tmin tmax
    sel_ref,  # (5, R): watertight permute/shear selection data
    list_ref,  # (1, 1, n_sc) int32 SMEM row: this block's sc visit order
    entry_ref,  # (1, 1, n_sc) f32 SMEM row: sorted sc entry lower bounds
    planes_ref,  # (13, n_clusters, CLUSTER)
    t_out,  # (1, R)
    idx_out,  # (1, R) int32
    u_out,
    v_out,
    *,
    n_sc,
    sc_size,
    csize,
    scalar_perm=False,
    gate128=True,
):
    blk = pl.program_id(0)
    rv = _ray_vectors(ray_ref, sel_ref)
    t_min = rv[6]
    r_full = rv[0].shape[1]
    inv_x, inv_y, inv_z = _inv_dir(rv[3], rv[4], rv[5])
    oct_ = _block_octant(rv)
    frame = _block_frame(rv) if scalar_perm else None

    t_out[:] = rv[7]
    idx_out[:] = jnp.full(t_out.shape, -1, jnp.int32)
    u_out[:] = jnp.zeros(t_out.shape, jnp.float32)
    v_out[:] = jnp.zeros(t_out.shape, jnp.float32)

    cnt = count_ref[blk]

    # per-chunk ray vectors/frames, loaded once from the refs (fresh
    # aligned loads — Mosaic cannot re-layout lane-offset slices)
    gate = gate128 and r_full > 128
    if gate:
        chunk_rv = {}
        chunk_fr = {}
        chunk_inv = {}
        for qs in range(0, r_full, 128):
            rvq = _ray_vectors_q(ray_ref, sel_ref, qs, qs + 128,
                                 with_sel=not scalar_perm)
            chunk_rv[qs] = rvq
            chunk_inv[qs] = _inv_dir(rvq[3], rvq[4], rvq[5])
            if scalar_perm:
                chunk_fr[qs] = _frame_vectors(rvq, frame[0], frame[1],
                                              frame[2])
    else:
        chunk_rv = {0: rv}
        chunk_fr = {0: frame}
        chunk_inv = {0: (inv_x, inv_y, inv_z)}

    def test_chunk(c, pcl, qs, qe):
        """Watertight test + argmin hit update on lanes [qs, qe)."""
        rvq = chunk_rv[qs]
        if scalar_perm:
            hit, t, e0, e1, esum = _watertight_frame(pcl, rvq, chunk_fr[qs])
        else:
            hit, t, e0, e1, esum = _watertight(pcl, rvq)
        t_best = t_out[0, qs:qe][None, :]
        hit = hit & (t > rvq[6]) & (t < t_best)

        # reduction argmin over the C (sublane) axis
        t_hit = jnp.where(hit, t, INF)
        t_sel = jnp.min(t_hit, axis=0, keepdims=True)  # (1, q)
        rows = jax.lax.broadcasted_iota(jnp.int32, t_hit.shape, 0)
        best = jnp.min(
            jnp.where(t_hit == t_sel, rows, jnp.int32(csize + 1)),
            axis=0,
            keepdims=True,
        )
        onehot = (rows == best) & (t_hit == t_sel)
        esums = jnp.sum(jnp.where(onehot, esum, 0.0), 0, keepdims=True)
        e0s = jnp.sum(jnp.where(onehot, e0, 0.0), 0, keepdims=True)
        e1s = jnp.sum(jnp.where(onehot, e1, 0.0), 0, keepdims=True)
        better = t_sel < t_best
        inv_det = 1.0 / jnp.where(esums == 0.0, 1.0, esums)
        t_out[0:1, qs:qe] = jnp.where(better, t_sel, t_best)
        idx_out[0:1, qs:qe] = jnp.where(
            better, c * csize + best, idx_out[0, qs:qe][None, :]
        )
        u_out[0:1, qs:qe] = jnp.where(
            better, e0s * inv_det, u_out[0, qs:qe][None, :]
        )
        v_out[0:1, qs:qe] = jnp.where(
            better, e1s * inv_det, v_out[0, qs:qe][None, :]
        )

    def visit_cluster(c):
        """Per-ray slab gate + 128-triangle watertight test of cluster c.

        The slab gate runs per 128-lane CHUNK on the pre-loaded chunk
        vectors (never lane-offset slices of full-width vectors — those
        force Mosaic relayouts), and the triangle test is branched per
        chunk: mid-trace only ~1.3/2 chunks of a 256-ray block have any
        slab-live lane (tools/kernel_stats.py), so dead chunks skip the
        (csize, 128) tile entirely.  Results are bit-identical (a
        slab-failed lane can never record a hit)."""
        if gate:
            conds = {}
            for qs in range(0, r_full, 128):
                rvq = chunk_rv[qs]
                ivq = chunk_inv[qs]
                t_best_q = t_out[0, qs:qs + 128][None, :]
                live_q = _cluster_slab(aabb_ref, c, rvq, ivq[0], ivq[1],
                                       ivq[2], rvq[6], t_best_q)
                conds[qs] = jnp.any(live_q)
            any_live = functools.reduce(jnp.logical_or, conds.values())

            @pl.when(any_live)
            def _():
                pcl = planes_ref[:, c, :]
                for qs in range(0, r_full, 128):

                    @pl.when(conds[qs])
                    def _(qs=qs):
                        test_chunk(c, pcl, qs, qs + 128)

        else:
            t_best = t_out[0, :][None, :]
            live = _cluster_slab(aabb_ref, c, rv, inv_x, inv_y, inv_z,
                                 t_min, t_best)

            @pl.when(jnp.any(live))
            def _():
                test_chunk(c, planes_ref[:, c, :], 0, r_full)

    def cond(carry):
        k, stop = carry
        return (k < cnt) & jnp.logical_not(stop)

    def body(carry):
        k, _ = carry
        sc = list_ref[0, 0, k]
        if sc_size == 1:
            visit_cluster(sc)
        else:
            # supercluster slab gate, then its members in the block
            # octant's approximate front-to-back order (each gated by its
            # own per-ray slab vs the shrinking t-best window — visiting
            # near members first tightens t_best so far members fail)
            t_best = t_out[0, :][None, :]
            live_sc = _cluster_slab(sc_aabb_ref, sc, rv, inv_x, inv_y,
                                    inv_z, t_min, t_best)

            @pl.when(jnp.any(live_sc))
            def _():
                def inner(j, _):
                    visit_cluster(morder_ref[oct_, sc * sc_size + j])
                    return 0

                jax.lax.fori_loop(0, sc_size, inner, 0)

        # front-to-back early exit: superclusters are visited in ascending
        # entry-lower-bound order, so once the NEXT entry exceeds every
        # ray's current t_best, no remaining supercluster can improve any
        # hit (exact at sc granularity; members are window-gated per ray)
        nk = jnp.minimum(k + 1, n_sc - 1)
        stop = entry_ref[0, 0, nk] > jnp.max(t_out[0, :])
        return k + 1, stop

    jax.lax.while_loop(cond, body, (jnp.int32(0), False))


def _kernel_any(
    count_ref,  # (n_blocks,) int32, scalar-prefetched to SMEM
    aabb_ref,  # (6, n_clusters) f32, scalar-prefetched to SMEM
    sc_aabb_ref,  # (6, n_sc) f32, scalar-prefetched to SMEM
    morder_ref,  # (8, n_clusters) int32: per-octant member visit order
    ray_ref,  # (8, R)
    sel_ref,  # (5, R)
    list_ref,  # (1, 1, n_sc) int32 SMEM row
    planes_ref,  # (13, n_clusters, CLUSTER)
    occ_out,  # (1, R) int32: 1 iff any hit with t in (tmin, tmax)
    *,
    n_sc,
    sc_size,
    scalar_perm=False,
    gate128=True,
):
    """Any-hit (occlusion) variant of _kernel.

    Shadow rays only need a boolean, so the per-cluster argmin/barycentric
    bookkeeping of the closest-hit kernel is dropped (one any-reduce per
    cluster), the loop runs only over the block's compacted visit list, and
    it early-outs once every ray in the block is occluded — shadow rays
    toward the same light saturate fast.  Occlusion predicate matches the
    closest-hit kernel's hit.valid exactly: any watertight hit with t
    strictly inside (t_min, t_max).  Like _kernel, the triangle test is
    gated per 128-lane chunk (skipped chunks have no undecided live lane —
    bit-identical results).
    """
    blk = pl.program_id(0)
    rv = _ray_vectors(ray_ref, sel_ref)
    t_min, t_max = rv[6], rv[7]
    r_full = rv[0].shape[1]
    inv_x, inv_y, inv_z = _inv_dir(rv[3], rv[4], rv[5])
    oct_ = _block_octant(rv)
    frame = _block_frame(rv) if scalar_perm else None

    # parked/culled lanes (t_max <= 0) can never record a hit: seed them as
    # "occluded" so they count as decided for the early-out, and strip them
    # in the epilogue
    occ_out[:] = (t_max <= 0.0).astype(jnp.int32)
    cnt = count_ref[blk]

    gate = gate128 and r_full > 128
    if gate:
        chunk_rv = {}
        chunk_fr = {}
        chunk_inv = {}
        for qs in range(0, r_full, 128):
            rvq = _ray_vectors_q(ray_ref, sel_ref, qs, qs + 128,
                                 with_sel=not scalar_perm)
            chunk_rv[qs] = rvq
            chunk_inv[qs] = _inv_dir(rvq[3], rvq[4], rvq[5])
            if scalar_perm:
                chunk_fr[qs] = _frame_vectors(rvq, frame[0], frame[1],
                                              frame[2])
    else:
        chunk_rv = {0: rv}
        chunk_fr = {0: frame}
        chunk_inv = {0: (inv_x, inv_y, inv_z)}

    def test_chunk(pcl, qs, qe):
        rvq = chunk_rv[qs]
        if scalar_perm:
            hit, t, _, _, _ = _watertight_frame(pcl, rvq, chunk_fr[qs])
        else:
            hit, t, _, _, _ = _watertight(pcl, rvq)
        hit = hit & (t > rvq[6]) & (t < rvq[7])
        occ_out[0:1, qs:qe] = jnp.maximum(
            occ_out[0, qs:qe][None, :],
            jnp.max(hit.astype(jnp.int32), axis=0, keepdims=True),
        )

    def visit_cluster(c):
        if gate:
            conds = {}
            for qs in range(0, r_full, 128):
                rvq = chunk_rv[qs]
                ivq = chunk_inv[qs]
                und_q = occ_out[0, qs:qs + 128][None, :] == 0
                live_q = _cluster_slab(aabb_ref, c, rvq, ivq[0], ivq[1],
                                       ivq[2], rvq[6], rvq[7]) & und_q
                conds[qs] = jnp.any(live_q)
            any_live = functools.reduce(jnp.logical_or, conds.values())

            @pl.when(any_live)
            def _():
                pcl = planes_ref[:, c, :]
                for qs in range(0, r_full, 128):

                    @pl.when(conds[qs])
                    def _(qs=qs):
                        test_chunk(pcl, qs, qs + 128)

        else:
            undecided = occ_out[0, :][None, :] == 0
            live = _cluster_slab(aabb_ref, c, rv, inv_x, inv_y, inv_z,
                                 t_min, t_max) & undecided

            @pl.when(jnp.any(live))
            def _():
                test_chunk(planes_ref[:, c, :], 0, r_full)

    def cond(carry):
        k, stop = carry
        return (k < cnt) & jnp.logical_not(stop)

    def body(carry):
        k, _ = carry
        sc = list_ref[0, 0, k]
        if sc_size == 1:
            visit_cluster(sc)
        else:
            undecided = occ_out[0, :][None, :] == 0
            live_sc = _cluster_slab(sc_aabb_ref, sc, rv, inv_x, inv_y,
                                    inv_z, t_min, t_max) & undecided

            @pl.when(jnp.any(live_sc))
            def _():
                # near members first: blockers are usually close to the
                # shadow-ray origin, so rays decide (and the whole block
                # early-outs) sooner
                def inner(j, _):
                    visit_cluster(morder_ref[oct_, sc * sc_size + j])
                    return 0

                jax.lax.fori_loop(0, sc_size, inner, 0)

        # early-out: the whole block decided => skip remaining superclusters
        return k + 1, jnp.min(occ_out[0, :]) > 0

    jax.lax.while_loop(cond, body, (jnp.int32(0), False))
    occ_out[:] = jnp.where(t_max <= 0.0, 0, occ_out[0, :][None, :])


def _pad_rays(o, d, t_min, t_max, block):
    n = o.shape[0]
    pad = (-n) % block
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3))])
        d = jnp.concatenate([d, jnp.ones((pad, 3))])
        t_min = jnp.concatenate([t_min, jnp.zeros(pad)])
        t_max = jnp.concatenate([t_max, jnp.zeros(pad)])
    return o, d, t_min, t_max, n, pad


def _ray_rows(o, d, t_min, t_max, with_sel=True):
    rays = jnp.stack(
        [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t_min, t_max]
    )  # (8, N)
    if not with_sel:  # scalar_perm kernels build their frame in-kernel
        return rays, jnp.zeros((5, rays.shape[1]), jnp.float32)
    shear = ray_shear(d)
    sel = jnp.stack(
        [
            shear.perm[:, 0].astype(jnp.float32),
            shear.perm[:, 1].astype(jnp.float32),
            shear.perm[:, 2].astype(jnp.float32),
            shear.sx,
            shear.sy,
        ]
    )  # (5, N)
    return rays, sel


def intersect_clusters_any(o, d, t_min, t_max, accel: ClusterAccel,
                           block=None, interpret=None, scalar_perm=False,
                           gate128=None):
    """Boolean occlusion query: any hit with t in (t_min, t_max)?

    Same predicate as intersect_clusters(...).tri >= 0, but ~2x cheaper per
    cluster and with whole-block early-out — the shadow-ray fast path.
    scalar_perm: block-uniform watertight frame (see _block_frame) — only
    for callers that sort rays by (axis, octant, origin).
    """
    if block is None:
        block = int(_os.environ.get("NART_SHADOW_BLOCK", "0")) or accel.block
    if gate128 is None:
        # default: gate only the big-block (large-scene) configuration —
        # see the block-size policy note in build_clusters
        g = _os.environ.get("NART_QGATE", "")
        gate128 = (g == "1") if g else block > 512
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    o, d, t_min, t_max, n, pad = _pad_rays(o, d, t_min, t_max, block)
    rays, sel = _ray_rows(o, d, t_min, t_max, with_sel=not scalar_perm)
    sc_list, _, sc_count = build_block_lists(o, d, t_max, accel, block)

    nsc = accel.n_sc
    grid = ((n + pad) // block,)
    row_blk = lambda h: pl.BlockSpec((h, block),
                                     lambda i, c, a, m, s: (0, i),
                                     memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((1, block), lambda i, c, a, m, s: (0, i),
                           memory_space=pltpu.VMEM)
    smem_row = pl.BlockSpec((1, 1, nsc), lambda i, c, a, m, s: (i, 0, 0),
                            memory_space=pltpu.SMEM)

    occ = pl.pallas_call(
        functools.partial(_kernel_any, n_sc=nsc, sc_size=accel.sc_size,
                          scalar_perm=scalar_perm, gate128=gate128),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,  # counts + AABBs + member orders -> SMEM
            grid=grid,
            in_specs=[
                row_blk(8),
                row_blk(5),
                smem_row,
                pl.BlockSpec(accel.planes.shape,
                             lambda i, c, a, m, s: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[out_blk],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),  # pipeline ray blocks
            # the full planes array rides VMEM (constant index map, double
            # buffered); small-cluster builds exceed the 16M default scope
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        out_shape=[jax.ShapeDtypeStruct((1, n + pad), jnp.int32)],
        interpret=interpret,
    )(sc_count, accel.aabb, accel.sc_aabb, accel.morder, rays, sel, sc_list,
      accel.planes)[0]
    return occ[0, :n] != 0


def intersect_clusters(o, d, t_min, t_max, accel: ClusterAccel,
                       block=None, interpret=None, scalar_perm=False,
                       gate128=None):
    """Nearest-hit over the clustered scene.  Returns a Hit (original ids).

    interpret=None auto-selects: Mosaic on TPU backends, interpreter
    elsewhere (the CPU test mesh), so the same call site works everywhere.
    scalar_perm: block-uniform watertight frame (see _block_frame) — only
    for callers that sort rays by (axis, octant, origin).
    """
    if block is None:
        block = accel.block
    if gate128 is None:
        # default: gate only the big-block (large-scene) configuration —
        # see the block-size policy note in build_clusters
        g = _os.environ.get("NART_QGATE", "")
        gate128 = (g == "1") if g else block > 512
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    o, d, t_min, t_max, n, pad = _pad_rays(o, d, t_min, t_max, block)
    rays, sel = _ray_rows(o, d, t_min, t_max, with_sel=not scalar_perm)
    sc_list, sc_entry, sc_count = build_block_lists(o, d, t_max, accel, block)

    nsc = accel.n_sc
    grid = ((n + pad) // block,)
    row_blk = lambda h: pl.BlockSpec((h, block),
                                     lambda i, c, a, m, s: (0, i),
                                     memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((1, block), lambda i, c, a, m, s: (0, i),
                           memory_space=pltpu.VMEM)
    smem_row = pl.BlockSpec((1, 1, nsc), lambda i, c, a, m, s: (i, 0, 0),
                            memory_space=pltpu.SMEM)

    t, idx, u, v = pl.pallas_call(
        functools.partial(_kernel, n_sc=nsc, sc_size=accel.sc_size,
                          csize=accel.csize, scalar_perm=scalar_perm,
                          gate128=gate128),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,  # counts + AABBs + member orders -> SMEM
            grid=grid,
            in_specs=[
                row_blk(8),
                row_blk(5),
                smem_row,
                smem_row,
                pl.BlockSpec(accel.planes.shape,
                             lambda i, c, a, m, s: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[out_blk, out_blk, out_blk, out_blk],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),  # pipeline ray blocks
            # the full planes array rides VMEM (constant index map, double
            # buffered); small-cluster builds exceed the 16M default scope
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, n + pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n + pad), jnp.int32),
            jax.ShapeDtypeStruct((1, n + pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n + pad), jnp.float32),
        ],
        interpret=interpret,
    )(sc_count, accel.aabb, accel.sc_aabb, accel.morder, rays, sel, sc_list,
      sc_entry, accel.planes)
    t = t[0, :n]
    idx = idx[0, :n]
    tri = jnp.where(idx >= 0, accel.order[jnp.maximum(idx, 0)], -1)
    t = jnp.where(tri >= 0, t, INF)
    return Hit(t=t, tri=tri, u=u[0, :n], v=v[0, :n])
