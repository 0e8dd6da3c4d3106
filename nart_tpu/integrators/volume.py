"""Wavefront volume integrator: null-scattering delta tracking.

Parity: src/integrators/volumeintegrator.cpp + SampleT_maj (media.h:128-181).
The per-ray random walk (absorb / scatter / null with a global majorant) is
flattened into a lockstep wavefront loop: each iteration performs one
free-flight extension attempt per live lane, with lanes in one of three
logical phases — NEW_RAY (fresh segment: draw the unused-u + mode uniforms,
clip to the medium AABB), IN_FLIGHT (extend t), or ESCAPED (final light
pass).  RNG draw sites match the reference's scalar order exactly:
  outer: u (unused by SampleT_maj but drawn — parity), uMode
  per flight step: exponential t draw; on null: uMode redraw; on scatter:
  2 phase-function draws.
Lights contribute only on escape (no NEE/MIS in volume mode); alpha is 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import rng
from ..media import clip_to_aabb, medium_properties
from ..sampling import sample_exponential_decay, uniform_sample_sphere
from .path import _nearest_light

INF = np.float32(np.inf)
_MAX_STEPS = 1_000_000  # safety cap; delta tracking terminates probabilistically


def trace(scene, bvh, o, d, state, params):
    """Returns (L (N,3), alpha (N,), state, rays=0)."""
    n = o.shape[0]
    medium = scene.medium
    l_out = jnp.zeros((n, 3))
    beta = jnp.ones((n, 3))  # never attenuated (isotropic pf == its own pdf)

    if medium is None:
        # no medium on the camera: every ray escapes immediately
        le, t_l, hit = _nearest_light(
            scene.lights, o, d, jnp.full((n,), INF)
        )
        return le, jnp.ones((n,)), state, jnp.zeros((), jnp.float32)

    sigma_maj = np.float32(medium.sigma_maj)

    # lane state
    new_ray = jnp.ones((n,), bool)  # needs segment setup (u, uMode draws)
    alive = jnp.ones((n,), bool)
    escaped = jnp.zeros((n,), bool)
    bounce = jnp.zeros((n,), jnp.int32)
    u_mode = jnp.zeros((n,))
    t_cur = jnp.zeros((n,))
    t_exit = jnp.zeros((n,))

    def cond(carry):
        it, alive, *_ = carry
        return jnp.any(alive) & (it < _MAX_STEPS)

    def body(carry):
        (it, alive, new_ray, escaped, bounce, u_mode, t_cur, t_exit,
         o, d, st, l_out) = carry

        # --- NEW_RAY: SampleT_maj entry (media.h:128-140)
        setup = alive & new_ray
        _, st = rng.masked_next_float(st, setup)  # u: drawn, unused (parity)
        um_new, st = rng.masked_next_float(st, setup)
        u_mode = jnp.where(setup, um_new, u_mode)
        box_hit, t0, t1 = clip_to_aabb(
            o, d, jnp.asarray(medium.bounds_min), jnp.asarray(medium.bounds_max)
        )
        t_cur = jnp.where(setup, jnp.maximum(0.0, t0), t_cur)
        t_exit = jnp.where(setup, t1, t_exit)
        # segment exhausted immediately (missed box / behind): escape
        esc_now = setup & (
            ~box_hit | (t_cur + np.float32(1e-4) > t_exit)
        )
        new_ray = jnp.where(setup, False, new_ray)

        # --- flight step (media.h:147-178)
        flying = alive & ~esc_now
        u_t, st = rng.masked_next_float(st, flying)
        t = t_cur + sample_exponential_decay(u_t, sigma_maj)
        left_segment = flying & (t >= t_exit)

        p = o + d * t[:, None]
        inside, s_a, s_s, le_med = medium_properties(medium, p)
        in_medium = flying & ~left_segment
        left_medium = in_medium & ~inside  # SampleMedium returned false

        sampling_lane = in_medium & inside
        p_absorb = s_a / sigma_maj
        p_scatter = s_s / sigma_maj
        absorb = sampling_lane & (u_mode < p_absorb)
        scatter = sampling_lane & ~absorb & (u_mode < p_absorb + p_scatter)
        null = sampling_lane & ~absorb & ~scatter

        # absorb: L += Le * beta, terminate (volumeintegrator.cpp:30-35)
        l_out = l_out + jnp.where(absorb[:, None], le_med * beta, 0.0)

        # scatter: bounce++ > bounces -> terminate, else redirect
        over = scatter & (bounce > params.bounces)
        bounce = bounce + scatter.astype(jnp.int32)
        do_redirect = scatter & ~over
        s1, st = rng.masked_next_float(st, do_redirect)
        s2, st = rng.masked_next_float(st, do_redirect)
        w_new, _ = uniform_sample_sphere(jnp.stack([s1, s2], -1))
        o = jnp.where(do_redirect[:, None], p, o)
        d = jnp.where(do_redirect[:, None], w_new, d)
        new_ray = new_ray | do_redirect

        # null: redraw uMode, continue from t
        um2, st = rng.masked_next_float(st, null)
        u_mode = jnp.where(null, um2, u_mode)
        t_cur = jnp.where(null, t, t_cur)

        # escape: left the segment or the medium, or missed the box
        esc = esc_now | left_segment | left_medium
        escaped = escaped | esc
        alive = alive & ~(absorb | over | esc)

        return (it + 1, alive, new_ray, escaped, bounce, u_mode, t_cur,
                t_exit, o, d, st, l_out)

    carry = (jnp.int32(0), alive, new_ray, escaped, bounce, u_mode, t_cur,
             t_exit, o, d, state, l_out)
    carry = jax.lax.while_loop(cond, body, carry)
    (_, _, _, escaped, _, _, _, _, o, d, state, l_out) = carry

    # escaped lanes: nearest-light pass (volumeintegrator.cpp:66-80)
    le, _, _ = _nearest_light(scene.lights, o, d, jnp.full((n,), INF))
    l_out = l_out + jnp.where(escaped[:, None], le * beta, 0.0)
    return l_out, jnp.ones((n,)), state, jnp.zeros((), jnp.float32)
