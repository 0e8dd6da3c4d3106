"""Pallas cluster-traversal kernel vs the brute-force oracle.

Runs in interpret mode on the CPU test mesh (the same kernel lowers to
Mosaic on TPU; interpret mode executes identical semantics), validating the
lane-aligned watertight test, the conservative block-cluster culling mask,
and the reduction argmin hit selection against geometry.intersect_brute.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nart_tpu.geometry import intersect_brute
from nart_tpu.pallas_accel import (
    CLUSTER,
    block_cluster_mask,
    build_clusters,
    intersect_clusters,
)


def _random_tris(n, rng, spread=3.0, size=0.5):
    tri = rng.normal(size=(n, 3, 3)).astype(np.float32) * size
    tri += rng.normal(size=(n, 1, 3)).astype(np.float32) * spread
    return tri


def _random_rays(n, rng, spread=4.0):
    o = rng.normal(size=(n, 3)).astype(np.float32) * spread
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


@pytest.mark.parametrize("n_tris", [5, 200, 700])
def test_intersect_clusters_matches_brute(n_tris):
    rng = np.random.default_rng(n_tris)
    tri_v = _random_tris(n_tris, rng)
    acc = build_clusters(tri_v)
    n = 640
    o, d = _random_rays(n, rng)
    t_min = np.full(n, 1e-4, np.float32)
    t_max = np.full(n, np.inf, np.float32)

    hp = intersect_clusters(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_min),
        jnp.asarray(t_max), acc, block=256, interpret=True,
    )
    hb = intersect_brute(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_min),
        jnp.asarray(t_max), jnp.asarray(tri_v),
    )
    trip, trib = np.asarray(hp.tri), np.asarray(hb.tri)
    tp, tb = np.asarray(hp.t), np.asarray(hb.t)
    assert (trip >= 0).sum() == (trib >= 0).sum()
    assert (trip == trib).all()
    hit = trib >= 0
    np.testing.assert_allclose(tp[hit], tb[hit], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(hp.u)[hit], np.asarray(hb.u)[hit], rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(hp.v)[hit], np.asarray(hb.v)[hit], rtol=1e-3, atol=1e-4
    )


def test_finite_tmax_respected():
    rng = np.random.default_rng(7)
    tri_v = _random_tris(300, rng)
    acc = build_clusters(tri_v)
    n = 256
    o, d = _random_rays(n, rng)
    t_min = np.full(n, 1e-4, np.float32)
    far = intersect_clusters(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_min),
        jnp.full(n, np.inf, np.float32), acc, block=256, interpret=True,
    )
    # clamp each ray's tmax just below its own nearest hit -> all miss
    t_far = np.asarray(far.t)
    t_clip = np.where(np.isfinite(t_far), t_far * 0.99, 1e-3).astype(np.float32)
    near = intersect_clusters(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_min),
        jnp.asarray(t_clip), acc, block=256, interpret=True,
    )
    assert (np.asarray(near.tri) == -1).all()


@pytest.mark.parametrize("n_tris", [5, 700])
def test_anyhit_matches_closest_hit_validity(n_tris):
    """The occlusion kernel's boolean == closest-hit validity, including
    finite per-ray t_max (the shadow-ray use: t_max = light distance) and
    culled lanes parked with t_max = 0."""
    from nart_tpu.pallas_accel import intersect_clusters_any

    rng = np.random.default_rng(n_tris + 1)
    tri_v = _random_tris(n_tris, rng)
    acc = build_clusters(tri_v)
    n = 512
    o, d = _random_rays(n, rng)
    t_min = np.full(n, 1e-4, np.float32)
    t_max = np.where(
        rng.random(n) < 0.25,
        0.0,  # culled/parked shadow lanes
        rng.exponential(5.0, n),
    ).astype(np.float32)

    hp = intersect_clusters(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_min),
        jnp.asarray(t_max), acc, block=128, interpret=True,
    )
    occ = intersect_clusters_any(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_min),
        jnp.asarray(t_max), acc, block=128, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(occ), np.asarray(hp.tri) >= 0
    )


@pytest.mark.parametrize("gate", [False, True])
def test_median_split_matches_brute(gate, monkeypatch):
    """The median-split cluster order (large-mesh default) + 128-lane chunk
    gating agree with the brute oracle (block=256 -> two gated chunks)."""
    monkeypatch.setenv("NART_CLUSTER_METHOD", "median")
    rng = np.random.default_rng(11)
    tri_v = _random_tris(700, rng)
    acc = build_clusters(tri_v)
    n = 640
    o, d = _random_rays(n, rng)
    t_min = np.full(n, 1e-4, np.float32)
    t_max = np.full(n, np.inf, np.float32)
    hp = intersect_clusters(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_min),
        jnp.asarray(t_max), acc, block=256, interpret=True, gate128=gate,
    )
    hb = intersect_brute(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_min),
        jnp.asarray(t_max), jnp.asarray(tri_v),
    )
    np.testing.assert_array_equal(np.asarray(hp.tri), np.asarray(hb.tri))
    hit = np.asarray(hb.tri) >= 0
    np.testing.assert_allclose(
        np.asarray(hp.t)[hit], np.asarray(hb.t)[hit], rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("super_target", [1, 2])
def test_two_level_matches_brute(super_target):
    """Supercluster walk (sc_size > 1) agrees with the brute oracle.

    super_target=2 on a 6-cluster mesh gives sc_size=3 (two superclusters
    of three member clusters) — the exact two-level kernel path cameraLens-
    scale scenes take with the default SUPER_TARGET."""
    rng = np.random.default_rng(42 + super_target)
    tri_v = _random_tris(700, rng)
    acc = build_clusters(tri_v, super_target=super_target)
    assert acc.sc_size > 1 and acc.n_sc == super_target
    n = 512
    o, d = _random_rays(n, rng)
    t_min = np.full(n, 1e-4, np.float32)
    t_max = np.full(n, np.inf, np.float32)
    hp = intersect_clusters(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_min),
        jnp.asarray(t_max), acc, block=128, interpret=True,
    )
    hb = intersect_brute(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_min),
        jnp.asarray(t_max), jnp.asarray(tri_v),
    )
    np.testing.assert_array_equal(np.asarray(hp.tri), np.asarray(hb.tri))
    hit = np.asarray(hb.tri) >= 0
    np.testing.assert_allclose(
        np.asarray(hp.t)[hit], np.asarray(hb.t)[hit], rtol=1e-4, atol=1e-5
    )

    from nart_tpu.pallas_accel import intersect_clusters_any

    t_shadow = np.where(
        rng.random(n) < 0.25, 0.0, rng.exponential(5.0, n)
    ).astype(np.float32)
    occ = intersect_clusters_any(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_min),
        jnp.asarray(t_shadow), acc, block=128, interpret=True,
    )
    hp2 = intersect_clusters(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_min),
        jnp.asarray(t_shadow), acc, block=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(hp2.tri) >= 0)


def test_block_mask_is_conservative():
    """Every actual hit's cluster must be visible in its ray's block mask."""
    rng = np.random.default_rng(3)
    tri_v = _random_tris(500, rng)
    acc = build_clusters(tri_v)
    n, block = 512, 128
    o, d = _random_rays(n, rng)
    t_min = np.full(n, 1e-4, np.float32)
    t_max = np.full(n, np.inf, np.float32)
    mask = np.asarray(
        block_cluster_mask(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max),
            acc.cl_lo, acc.cl_hi, block,
        )
    )
    hb = intersect_brute(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_min),
        jnp.asarray(t_max), jnp.asarray(tri_v),
    )
    # map original tri id -> cluster index in morton order
    order = np.asarray(acc.order)
    pos_of_tri = np.full(order.max() + 2, -1, np.int64)
    pos_of_tri[order[order >= 0]] = np.nonzero(order >= 0)[0]
    tri = np.asarray(hb.tri)
    for i in np.nonzero(tri >= 0)[0]:
        cl = pos_of_tri[tri[i]] // acc.csize
        assert mask[i // block, cl], (i, tri[i], cl)


def test_scalar_perm_matches_per_ray_frame_on_sorted_rays():
    """The block-scalar watertight frame (scalar_perm=True, used by the
    integrator's sorted traversal path) agrees with the per-ray frame on
    axis/octant-sorted rays: identical hit set on >=99.8% of rays (the
    remainder are frame-conditioning edge ties), and matching t where the
    triangle agrees."""
    import jax.numpy as jnp

    from nart_tpu.integrators.path import _sort_key

    rng = np.random.default_rng(42)
    tri_v = _random_tris(400, rng)
    acc = build_clusters(tri_v)
    n = 1024
    o, d = _random_rays(n, rng)
    lo = tri_v.reshape(-1, 3).min(0)
    inv = 1.0 / np.maximum(tri_v.reshape(-1, 3).max(0) - lo, 1e-12)
    key = _sort_key(jnp.asarray(lo), jnp.asarray(inv), jnp.asarray(o),
                    jnp.asarray(d), jnp.ones((n,), bool))
    perm = np.asarray(jnp.argsort(key))
    o, d = o[perm], d[perm]
    t_min = jnp.zeros((n,))
    t_max = jnp.full((n,), np.inf)
    h_ref = intersect_clusters(o, d, t_min, t_max, acc, scalar_perm=False)
    h_sc = intersect_clusters(o, d, t_min, t_max, acc, scalar_perm=True)
    tri_ref = np.asarray(h_ref.tri)
    tri_sc = np.asarray(h_sc.tri)
    agree = tri_ref == tri_sc
    assert agree.mean() >= 0.998, agree.mean()
    both = agree & (tri_ref >= 0)
    np.testing.assert_allclose(
        np.asarray(h_sc.t)[both], np.asarray(h_ref.t)[both],
        rtol=1e-4, atol=1e-5,
    )
