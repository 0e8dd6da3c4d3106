"""Sampling warps, vectorised.  Parity: reference src/core/sampling.cpp.

All functions take uniform samples shaped (..., 2) or (...,) and are pure
float32 jnp — differentiable where that makes sense (the integrator detaches
sampling *decisions* but differentiates densities/throughputs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TWO_PI = np.float32(2.0 * np.pi)
INV_PI = np.float32(1.0 / np.pi)
PI = np.float32(np.pi)


def uniform_sample_disk(u):
    """Polar warp with sqrt(r).  sampling.cpp:5-16."""
    r = jnp.sqrt(u[..., 0])
    theta = u[..., 1] * TWO_PI
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def uniform_sample_ring(u, inner_ratio):
    """Annulus warp.  sampling.cpp:18-31.

    Note: faithfully reproduces the reference's formulas — r^2 is mixed from
    ``inner_ratio`` (not its square) and pdf = 1/(pi*(1-inner_ratio)) — so
    MIS weights agree with the reference bit for bit.
    Returns (xy, pdf).
    """
    r = jnp.sqrt(inner_ratio + (1.0 - inner_ratio) * u[..., 0])
    theta = u[..., 1] * TWO_PI
    xy = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
    pdf = 1.0 / (PI * (1.0 - inner_ratio))
    return xy, jnp.broadcast_to(pdf, u[..., 0].shape)


def uniform_sample_sphere(u):
    """sampling.cpp:33-45.  Returns (w, pdf=1/4pi)."""
    theta = jnp.arccos(1.0 - 2.0 * u[..., 0])
    phi = u[..., 1] * TWO_PI
    sin_t = jnp.sin(theta)
    w = jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), jnp.cos(theta)], axis=-1
    )
    pdf = jnp.full(u[..., 0].shape, np.float32(1.0 / (4.0 * np.pi)))
    return w, pdf


def cosine_sample_hemisphere(u):
    """Malley's method.  sampling.cpp:47-58.  Returns (w, pdf=z/pi)."""
    d = uniform_sample_disk(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    w = jnp.concatenate([d, z[..., None]], axis=-1)
    return w, z * INV_PI


def sample_exponential_decay(u, a):
    """-ln(1-u)/a.  sampling.cpp:60-62."""
    return -jnp.log(1.0 - u) / a


def latin_square(state, n_samples):
    """Latin-square stratified 2D image samples, one square per pixel lane.

    Parity: sampling.cpp:72-86 — stratified samples along the diagonal, then
    an independent Fisher-Yates shuffle of each dimension, consuming
    2*n_samples UniformFloat draws then 2*n_samples UniformInt32 draws from
    each lane's stream in reference order.

    Args:
      state: uint32 RNG states, shape (P,).
      n_samples: static int (spp).
    Returns:
      (samples, state): samples (P, n_samples, 2) float32, updated states.
    """
    from . import rng

    p = state.shape[0]
    inv_n = np.float32(1.0 / n_samples)
    samples = jnp.zeros((p, n_samples, 2), jnp.float32)

    def draw_body(i, carry):
        samples, state = carry
        ux, state = rng.next_float(state)
        uy, state = rng.next_float(state)
        sx = (i.astype(jnp.float32) + ux) * inv_n
        sy = (i.astype(jnp.float32) + uy) * inv_n
        samples = samples.at[:, i, 0].set(sx)
        samples = samples.at[:, i, 1].set(sy)
        return samples, state

    samples, state = jax.lax.fori_loop(
        0, n_samples, lambda i, c: draw_body(jnp.uint32(i), c), (samples, state)
    )

    rows = jnp.arange(p)

    def shuffle_dim(i, samples, state, dim):
        choice, state = rng.next_int32(state, jnp.uint32(n_samples - 1) - i)
        choice = choice.astype(jnp.int32)
        si = samples[:, :, dim][jnp.arange(p), i]
        sc = jnp.take_along_axis(samples[:, :, dim], choice[:, None], axis=1)[:, 0]
        col = samples[:, :, dim]
        col = col.at[rows, choice].set(si)
        col = col.at[:, i].set(sc)
        return samples.at[:, :, dim].set(col), state

    def shuffle_body(i, carry):
        samples, state = carry
        samples, state = shuffle_dim(i, samples, state, 0)
        samples, state = shuffle_dim(i, samples, state, 1)
        return samples, state

    samples, state = jax.lax.fori_loop(
        0, n_samples, lambda i, c: shuffle_body(jnp.uint32(i), c), (samples, state)
    )
    return samples, state
