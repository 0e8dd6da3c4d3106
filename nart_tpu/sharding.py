"""Multi-chip scaling: pixel-lane sharding over a device mesh.

Role parity: the reference's only parallelism is TBB bucket data-parallelism
on one host (render.cpp:152-177).  The TPU-native equivalent (SURVEY.md §5):

  * device mesh over the slice (`jax.sharding.Mesh`, axis "tiles")
  * pixel lanes sharded across the mesh with `shard_map` — each device
    renders its lanes into a full-size film and the films are `psum`-merged
    over ICI, exactly the reference's tile overlap-add, but as a collective
  * parameter gradients: `jax.grad` through the sharded render inserts the
    psum all-reduce for the (replicated) parameter pytree automatically,
    overlapped with the replay backward pass by XLA's scheduler
  * multi-host: `jax.distributed.initialize()` then the same mesh spans all
    processes (jax.devices() is global); host 0 gathers the film for EXR

Determinism: lanes are seeded by absolute pixel id, so every sample
decision is identical for any device count; the image differs only by the
float association order of the film/psum merge (tests/test_sharding.py
asserts 1e-6 agreement).  Padding lanes
(when pixel count % devices != 0) are aimed at an off-film coordinate; the
splat bounds mask drops their contribution entirely.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .render import RenderParams, render_film


def make_mesh(n_devices: Optional[int] = None, axis: str = "tiles") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def init_distributed(**kwargs):
    """Multi-host entry: call before any jax op on pod slices."""
    jax.distributed.initialize(**kwargs)


def render_sharded(
    scene,
    bvh,
    params: RenderParams,
    mesh: Mesh,
    render_w,
    render_h,
    total_w,
    total_h,
    filter_bounds,
):
    """Render with pixel lanes sharded over the mesh.

    Returns the merged (totalH, totalW, 5) film (replicated on all devices).
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    n = render_w * render_h
    pad = (-n) % n_dev
    idx = np.arange(n + pad, dtype=np.int32)
    # padding lanes splat far outside the film -> dropped by the bounds mask
    px = np.where(idx < n, idx % render_w, total_w + 64).astype(np.int32)
    py = np.where(idx < n, idx // render_w, total_h + 64).astype(np.int32)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    def shard_render(scene, bvh, px, py):
        film, _rays = render_film(
            scene, bvh, params, px, py, total_w, total_h, filter_bounds
        )
        return jax.lax.psum(film, axis)

    return jax.jit(shard_render)(
        jax.tree_util.tree_map(jnp.asarray, scene),
        bvh,
        jnp.asarray(px),
        jnp.asarray(py),
    )
