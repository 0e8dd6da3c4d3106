"""BSDF lobes and aggregation — branchless, vectorised, differentiable.

Parity targets:
  * Fresnel + BSDF aggregation: src/core/bxdf.cpp
  * LambertBRDF:            src/bxdfs/lambertbrdf.cpp
  * TorranceSparrowBRDF:    src/bxdfs/torrancesparrowbrdf.cpp (GGX + VNDF)
  * DielectricBRDF:         src/bxdfs/dielectricbrdf.cpp
  * SpecularBRDF:           src/bxdfs/specularbrdf.cpp
  * SpecularDielectricBRDF: src/bxdfs/speculardielectricbrdf.cpp

Virtual dispatch is replaced by masked evaluation: each hit carries a BSDF
*descriptor* (lobe type codes + parameters); every lobe family is evaluated
for the whole wavefront and the right result selected per lane.  All division
uses guarded denominators with `where` so inactive lanes cannot poison
gradients (the standard double-where pattern).

Reference quirks preserved on purpose (see SURVEY.md):
  * Lambert Pdf returns wi.z/pi un-clamped (negative below the horizon);
    BSDF.pdf() sums raw lobe pdfs (bxdf.cpp:102-111)
  * a sampled SPECULAR flag skips lobe mixing AND the 1/numLobes pdf
    division (bxdf.cpp:76-89)
  * index-matched dielectrics return pdf=0 and OR TRANSMISSIVE onto the
    caller's running flags (dielectricbrdf.cpp:89-94)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .sampling import cosine_sample_hemisphere, uniform_sample_disk

# flag bits (bxdf.h:22)
SPECULAR, GLOSSY, DIFFUSE, TRANSMISSIVE = 1, 2, 4, 8

# lobe type codes
L_LAMBERT, L_TS, L_DIELECTRIC, L_SPECULAR, L_SPECDIEL = 0, 1, 2, 3, 4

PI = np.float32(np.pi)
INV_PI = np.float32(1.0 / np.pi)
_EPS = np.float32(1.1920928955078125e-07)


def _safe_sqrt(x):
    """sqrt(max(0, x)) whose gradient is 0 (not inf/NaN) at x <= 0.

    The double-where pattern: sqrt's derivative at 0 is infinite, and the
    eta/TIR boundaries hit x == 0 exactly, poisoning parameter gradients.
    """
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def _safe_div(a, b, where_ok=None):
    """a / b with b==0 lanes neutralised (double-where for grad safety)."""
    ok = b != 0.0 if where_ok is None else where_ok
    b_safe = jnp.where(ok, b, 1.0)
    return jnp.where(ok, a / b_safe, 0.0)


def _normalize(v, axis=-1):
    n = jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True))
    return v / jnp.where(n == 0.0, 1.0, n)


def reflect(w1, w2):
    """2*dot(w1,w2)*w2 - w1  (bxdf.h:14-16)."""
    return 2.0 * jnp.sum(w1 * w2, -1, keepdims=True) * w2 - w1


def fresnel(eta_o, eta_i, cos_theta):
    """Unpolarised dielectric Fresnel with TIR.  bxdf.cpp:3-22.

    cos_theta is expected unsigned; eta_o == eta_i returns 0.
    """
    cos_o = jnp.minimum(jnp.abs(cos_theta), 1.0)
    sin_o = _safe_sqrt(1.0 - cos_o * cos_o)
    sin_i = _safe_div(eta_o, eta_i) * sin_o
    tir = sin_i > 1.0
    cos_i = _safe_sqrt(1.0 - jnp.minimum(sin_i, 1.0) ** 2)
    denom_small = jnp.abs(cos_o + cos_i) < 1e-5

    f_para = _safe_div(
        eta_i * cos_o - eta_o * cos_i, eta_i * cos_o + eta_o * cos_i
    )
    f_perp = _safe_div(
        eta_o * cos_o - eta_i * cos_i, eta_o * cos_o + eta_i * cos_i
    )
    fr = (f_para * f_para + f_perp * f_perp) * 0.5
    fr = jnp.where(denom_small, 0.0, fr)
    fr = jnp.where(tir, 1.0, fr)
    return jnp.where(eta_o == eta_i, 0.0, fr)


# ---------------------------------------------------------------------------
# Shading frame (BSDF coordinate system)
# ---------------------------------------------------------------------------


class Frame(NamedTuple):
    """World-space shading frame.  n is the *unnormalised* shading normal
    (reference keeps isect.sn raw in BSDF::n — a deliberate parity choice;
    ToLocal/ToWorld renormalise their outputs, bxdf.h:57-64)."""

    t: jnp.ndarray  # (N, 3) n_t
    b: jnp.ndarray  # (N, 3) n_b
    n: jnp.ndarray  # (N, 3)


def build_frame(sn, dpds, nn=None):
    """BSDF::BuildCoordSys (bxdf.cpp:27-45).

    nn, when given, is a world-pre-transform normal-map vector in [-1,1]^3
    expressed in the base frame; the frame is rebuilt around it.
    """
    n = sn
    dot_dn = jnp.sum(dpds * n, -1, keepdims=True)
    t = _normalize(dpds - dot_dn * n)
    b = _normalize(jnp.cross(sn, t))
    if nn is not None:
        frame0 = Frame(t=t, b=b, n=n)
        n2 = _normalize(to_world(frame0, nn))
        dot_dn2 = jnp.sum(dpds * n2, -1, keepdims=True)
        t = _normalize(dpds - dot_dn2 * n2)
        b = _normalize(jnp.cross(sn, t))
        n = n2
    return Frame(t=t, b=b, n=n)


def to_local(frame: Frame, v):
    return _normalize(
        jnp.stack(
            [
                jnp.sum(v * frame.t, -1),
                jnp.sum(v * frame.b, -1),
                jnp.sum(v * frame.n, -1),
            ],
            axis=-1,
        )
    )


def to_world(frame: Frame, v):
    return _normalize(
        v[..., 0:1] * frame.t + v[..., 1:2] * frame.b + v[..., 2:3] * frame.n
    )


# ---------------------------------------------------------------------------
# BSDF descriptor
# ---------------------------------------------------------------------------


class BsdfDesc(NamedTuple):
    """Per-hit resolved BSDF: up to 2 lobes (MAX_BXDFS, bxdf.h:12)."""

    n_lobes: jnp.ndarray  # (N,) int32 — 1 or 2
    lobe: jnp.ndarray  # (N, 2) int32 lobe type codes (slot 1 = -1 if unused)
    rho_d: jnp.ndarray  # (N, 3)
    rho_s: jnp.ndarray  # (N, 3)
    tau: jnp.ndarray  # (N, 3)
    eta: jnp.ndarray  # (N,)
    alpha0: jnp.ndarray  # (N,) microfacet alpha (already max(1e-4, .))
    alpha_prime: jnp.ndarray  # (N,) roughened alpha


def lobe_static_specular(code):
    """Static flags&SPECULAR of each lobe class (set in ctors)."""
    return (code == L_SPECULAR) | (code == L_SPECDIEL)


def lobe_eta(desc: BsdfDesc, code):
    """Get_eta per lobe: Lambert returns 0, others their eta."""
    return jnp.where(code == L_LAMBERT, 0.0, desc.eta)


# ---------------------------------------------------------------------------
# Microfacet helpers (shared by TS and Dielectric — identical formulas)
# ---------------------------------------------------------------------------


def _lambda(w, alpha):
    """Smith Lambda (torrancesparrowbrdf.cpp:12-17)."""
    z = w[..., 2]
    sin_t = _safe_sqrt(1.0 - z * z)
    tan_t = _safe_div(sin_t, z)
    return (-1.0 + jnp.sqrt(1.0 + alpha * alpha * tan_t * tan_t)) * 0.5


def _g(wo, wi, alpha):
    return 1.0 / (1.0 + _lambda(wo, alpha) + _lambda(wi, alpha))


def _g1(w, alpha):
    return 1.0 / (1.0 + _lambda(w, alpha))


def _d_ggx(wh, alpha):
    """Trowbridge-Reitz D (torrancesparrowbrdf.cpp:19-30)."""
    z = wh[..., 2]
    z2 = z * z
    sin2 = jnp.maximum(0.0, 1.0 - z2)
    tan2 = _safe_div(sin2, z2)
    a2 = alpha * alpha
    denom = (PI * a2 * (z2 * z2)) * (1.0 + tan2 / a2) ** 2
    return jnp.where(z == 0.0, 0.0, _safe_div(1.0, denom))


def _vndf_sample(wo, alpha, u2, flip_lower=False, guard_vertical=True):
    """Heitz ellipsoid-stretch visible-normal sampling.

    torrancesparrowbrdf.cpp:68-97 / dielectricbrdf.cpp:106-139.  When
    flip_lower, wo_h is negated for wo.z<0 (dielectric variant).
    guard_vertical mirrors the dielectric's T1 special case for wo along z
    (the TS lobe lacks it in the reference and NaNs — we guard both for
    robustness; deviation documented).
    """
    wo_h = jnp.stack(
        [wo[..., 0] * alpha, wo[..., 1] * alpha, wo[..., 2]], axis=-1
    )
    wo_h = _normalize(wo_h)
    if flip_lower:
        wo_h = jnp.where((wo[..., 2] < 0.0)[..., None], -wo_h, wo_h)

    t1 = jnp.stack(
        [wo_h[..., 1], -wo_h[..., 0], jnp.zeros_like(alpha)], axis=-1
    )
    if guard_vertical:
        vertical = (wo[..., 0] == 0.0) & (wo[..., 1] == 0.0)
        t1 = jnp.where(
            vertical[..., None],
            jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), t1.shape),
            t1,
        )
    t1 = _normalize(t1)
    t2 = _normalize(jnp.cross(t1, wo_h))

    disk = uniform_sample_disk(u2)
    dx, dy = disk[..., 0], disk[..., 1]
    s = (1.0 + wo_h[..., 2]) * 0.5
    dy = s * dy + (1.0 - s) * jnp.sqrt(jnp.maximum(0.0, 1.0 - dx * dx))
    hx = jnp.sqrt(jnp.maximum(0.0, 1.0 - dx * dx - dy * dy))
    wh = hx[..., None] * wo_h + dx[..., None] * t1 + dy[..., None] * t2
    wh = jnp.stack(
        [wh[..., 0] * alpha, wh[..., 1] * alpha, wh[..., 2]], axis=-1
    )
    return _normalize(wh)


# ---------------------------------------------------------------------------
# Lobe: Lambert
# ---------------------------------------------------------------------------


def lambert_f(desc):
    return desc.rho_d * INV_PI


def lambert_pdf(wi):
    return wi[..., 2] * INV_PI  # un-clamped (parity)


def lambert_sample(desc, u2):
    wi, pdf = cosine_sample_hemisphere(u2)
    flags = jnp.full(pdf.shape, DIFFUSE, jnp.int32)
    alpha_i = jnp.ones_like(pdf)
    return lambert_f(desc), wi, pdf, flags, alpha_i


# ---------------------------------------------------------------------------
# Lobe: Torrance-Sparrow (GGX reflection)
# ---------------------------------------------------------------------------


def _ts_alpha(desc, use_prime):
    return jnp.where(use_prime, desc.alpha_prime, desc.alpha0)


def ts_f(desc, wo, wi, use_prime, eta_outer):
    alpha = _ts_alpha(desc, use_prime)
    wh = _normalize(wo + wi)
    g = _g(wo, wi, alpha)
    d = _d_ggx(wh, alpha)
    fr = fresnel(eta_outer, desc.eta, jnp.sum(wh * wi, -1))
    denom = 4.0 * wo[..., 2] * wi[..., 2]
    val = desc.rho_s * _safe_div(g * d * fr, denom)[..., None]
    bad = (wo[..., 2] < 0.0) | (wi[..., 2] < 0.0) | (denom == 0.0)
    return jnp.where(bad[..., None], 0.0, val)


def ts_pdf(desc, wo, wi, use_prime, eta_outer):
    """torrancesparrowbrdf.cpp:109-124."""
    alpha = _ts_alpha(desc, use_prime)
    wh = _normalize(wo + wi)
    cos_h = jnp.minimum(jnp.sum(wo * wh, -1), 1.0)
    pdf = _safe_div(_d_ggx(wh, alpha) * cos_h * _g1(wo, alpha), wo[..., 2])
    pdf = jnp.maximum(0.0, _safe_div(pdf, 4.0 * cos_h))
    return jnp.where(wh[..., 2] < 0.0, 0.0, pdf)


def ts_sample(desc, wo, u2, use_prime, eta_outer):
    alpha = _ts_alpha(desc, use_prime)
    flags = jnp.where(
        alpha > 0.001,
        jnp.where(alpha >= 1.0, DIFFUSE, GLOSSY),
        SPECULAR,
    ).astype(jnp.int32)
    wh = _vndf_sample(wo, alpha, u2, flip_lower=False)
    # detached-sampling estimator (path replay): the sampled direction is a
    # fixed decision; gradients flow through f/pdf evaluated at it
    wi = jax.lax.stop_gradient(_normalize(reflect(wo, wh)))
    pdf = ts_pdf(desc, wo, wi, use_prime, eta_outer)
    return ts_f(desc, wo, wi, use_prime, eta_outer), wi, pdf, flags, alpha


# ---------------------------------------------------------------------------
# Lobe: rough dielectric (GGX reflection + refraction)
# ---------------------------------------------------------------------------


def _oriented_etas(desc, wo, eta_outer):
    eta_o = jnp.where(wo[..., 2] < 0.0, desc.eta, eta_outer)
    eta_i = jnp.where(wo[..., 2] < 0.0, eta_outer, desc.eta)
    return eta_o, eta_i


def dielectric_f(desc, wo, wi, use_prime, eta_outer):
    """dielectricbrdf.cpp:31-80."""
    alpha = _ts_alpha(desc, use_prime)
    eta_o, eta_i = _oriented_etas(desc, wo, eta_outer)
    same_side = wo[..., 2] * wi[..., 2] >= 0.0

    # reflection branch
    wh_r = _normalize(wo + wi)
    wh_r = jnp.where(wh_r[..., 2:3] < 0.0, -wh_r, wh_r)
    fr_r = fresnel(eta_o, eta_i, jnp.abs(jnp.sum(wh_r * wo, -1)))
    denom_r = 4.0 * wo[..., 2] * wi[..., 2]
    refl = desc.rho_s * _safe_div(
        _g(wo, wi, alpha) * _d_ggx(wh_r, alpha) * fr_r, denom_r
    )[..., None]

    # refraction branch
    wh_t = _normalize(eta_o[..., None] * wo + eta_i[..., None] * wi)
    wh_t = jnp.where(wh_t[..., 2:3] < 0.0, -wh_t, wh_t)
    fr_t = fresnel(eta_o, eta_i, jnp.abs(jnp.sum(wh_t * wo, -1)))
    wi_dot_wh = jnp.sum(wi * wh_t, -1)
    wo_dot_wh = jnp.sum(wo * wh_t, -1)
    num = (
        _g(wo, wi, alpha)
        * _d_ggx(wh_t, alpha)
        * (1.0 - fr_t)
        * jnp.abs(wi_dot_wh)
        * jnp.abs(wo_dot_wh)
        * eta_o
        * eta_o
    )
    den = (eta_i * wi_dot_wh + eta_o * wo_dot_wh) ** 2 * jnp.abs(
        wo[..., 2] * wi[..., 2]
    )
    refr = desc.tau * _safe_div(num, den)[..., None]
    refr = jnp.where((fr_t >= 1.0)[..., None], 0.0, refr)

    return jnp.where(same_side[..., None], refl, refr)


def dielectric_pdf(desc, wo, wi, use_prime, eta_outer):
    """dielectricbrdf.cpp:187-225 (refraction Jacobian)."""
    alpha = _ts_alpha(desc, use_prime)
    eta_o, eta_i = _oriented_etas(desc, wo, eta_outer)
    same_side = wo[..., 2] * wi[..., 2] >= 0.0

    wh_r = _normalize(wo + wi)
    wh_r = jnp.where(wh_r[..., 2:3] < 0.0, -wh_r, wh_r)
    cos_h = jnp.abs(jnp.minimum(jnp.sum(wo * wh_r, -1), 1.0))
    pdf_r = _safe_div(
        _d_ggx(wh_r, alpha)
        * jnp.minimum(jnp.sum(wo * wh_r, -1), 1.0)
        * _g1(wo, alpha),
        wo[..., 2],
    )
    pdf_r = jnp.maximum(0.0, _safe_div(pdf_r, 4.0 * cos_h))

    wh_t = _normalize(eta_o[..., None] * wo + eta_i[..., None] * wi)
    wh_t = jnp.where(wh_t[..., 2:3] < 0.0, -wh_t, wh_t)
    pdf_t = _safe_div(
        _d_ggx(wh_t, alpha)
        * jnp.minimum(jnp.abs(jnp.sum(wo * wh_t, -1)), 1.0)
        * _g1(wo, alpha),
        jnp.abs(wo[..., 2]),
    )
    wi_dot_wh = jnp.sum(wi * wh_t, -1)
    wo_dot_wh = jnp.sum(wo * wh_t, -1)
    den = eta_i * wi_dot_wh + eta_o * wo_dot_wh
    jdet = _safe_div(jnp.abs(wi_dot_wh) * eta_i * eta_i, den * den)
    pdf_t = pdf_t * jdet

    pdf = jnp.where(same_side, pdf_r, pdf_t)
    return jnp.where(eta_outer == desc.eta, 0.0, pdf)


def _refract(w, wh, eta_ratio, cos_o, sin_i):
    """Refraction direction about microfacet wh (dielectricbrdf.cpp:173-178)."""
    b = wh * cos_o[..., None]
    a = w - b
    c = -a * eta_ratio[..., None]
    d = -wh * _safe_sqrt(1.0 - sin_i * sin_i)[..., None]
    d = jnp.where((jnp.sum(w * wh, -1) < 0.0)[..., None], -d, d)
    return _normalize(c + d)


def dielectric_sample(desc, wo, u1, u2, use_prime, eta_outer, prev_flags):
    """dielectricbrdf.cpp:82-183.  Returns (f, wi, pdf, flags, alpha_i)."""
    alpha = _ts_alpha(desc, use_prime)
    eta_o, eta_i = _oriented_etas(desc, wo, eta_outer)
    matched = eta_outer == desc.eta

    flags = jnp.where(
        alpha > 0.0001,
        jnp.where(alpha >= 1.0, DIFFUSE, GLOSSY),
        SPECULAR,
    ).astype(jnp.int32)

    wh = jax.lax.stop_gradient(_vndf_sample(wo, alpha, u2, flip_lower=True))
    fr = fresnel(eta_o, eta_i, jnp.abs(jnp.sum(wh * wo, -1)))

    cos_o = jnp.clip(jnp.sum(wo * wh, -1), -1.0, 1.0)
    sin_o = _safe_sqrt(1.0 - cos_o * cos_o)
    sin_i = _safe_div(eta_o, eta_i) * sin_o
    tir = sin_i >= 1.0

    reflect_choice = u1 < fr
    wi_refl = _normalize(reflect(wo, wh))
    wi_refr = _refract(wo, wh, _safe_div(eta_o, eta_i), cos_o, jnp.minimum(sin_i, 1.0))

    do_reflect = reflect_choice | tir
    wi = jax.lax.stop_gradient(
        jnp.where(do_reflect[..., None], wi_refl, wi_refr)
    )
    pdf_scale = jnp.where(reflect_choice, fr, 1.0 - fr)
    pdf = dielectric_pdf(desc, wo, wi, use_prime, eta_outer) * pdf_scale
    f = dielectric_f(desc, wo, wi, use_prime, eta_outer)
    flags = jnp.where(do_reflect, flags, flags | TRANSMISSIVE)

    # index-matched pass-through (dielectricbrdf.cpp:89-94)
    wi = jnp.where(matched[..., None], -wo, wi)
    pdf = jnp.where(matched, 0.0, pdf)
    f = jnp.where(matched[..., None], desc.tau, f)
    flags = jnp.where(matched, prev_flags | TRANSMISSIVE, flags)
    return f, wi, pdf, flags, alpha


# ---------------------------------------------------------------------------
# Lobe: perfect specular mirror
# ---------------------------------------------------------------------------


def specular_sample(desc, wo, eta_outer):
    """specularbrdf.cpp:14-29."""
    wi = jax.lax.stop_gradient(
        jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)
    )
    pdf = jnp.ones(wo.shape[:-1], jnp.float32)
    fr = fresnel(eta_outer, desc.eta, wi[..., 2])
    f = desc.rho_s * _safe_div(fr, jnp.abs(wi[..., 2]))[..., None]
    f = jnp.where((wi[..., 2] == 0.0)[..., None], 1.0, f)
    flags = jnp.full(pdf.shape, SPECULAR, jnp.int32)
    alpha_i = jnp.zeros_like(pdf)
    return f, wi, pdf, flags, alpha_i


# ---------------------------------------------------------------------------
# Lobe: perfect specular dielectric (delta glass)
# ---------------------------------------------------------------------------


def specdiel_sample(desc, wo, u2, eta_outer, prev_flags):
    """speculardielectricbrdf.cpp:15-82.  Lobe choice uses sample.x."""
    matched = eta_outer == desc.eta
    eta_o = jnp.where(wo[..., 2] < 0.0, desc.eta, eta_outer)
    eta_i = jnp.where(wo[..., 2] < 0.0, eta_outer, desc.eta)
    fr = fresnel(eta_o, eta_i, jnp.abs(wo[..., 2]))

    choose_reflect = u2[..., 0] < fr
    wi_refl = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)
    f_refl = desc.rho_s * _safe_div(fr, jnp.abs(wi_refl[..., 2]))[..., None]
    f_refl = jnp.where((wi_refl[..., 2] == 0.0)[..., None], 1.0, f_refl)

    cos_o = wo[..., 2]
    sin_o = _safe_sqrt(1.0 - cos_o * cos_o)
    sin_i = _safe_div(eta_o, eta_i) * sin_o
    tir = sin_i >= 1.0
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), wo.shape)
    b = n * cos_o[..., None]
    a = wo - b
    c = -a * _safe_div(eta_o, eta_i)[..., None]
    dvec = -n * _safe_sqrt(1.0 - jnp.minimum(sin_i, 1.0) ** 2)[..., None]
    dvec = jnp.where((cos_o < 0.0)[..., None], -dvec, dvec)
    wi_refr = _normalize(c + dvec)
    ratio2 = _safe_div(eta_o, eta_i) ** 2
    f_refr = (
        desc.tau * _safe_div(ratio2 * (1.0 - fr), jnp.abs(wi_refr[..., 2]))[..., None]
    )
    f_tir = desc.rho_s  # TIR: vec3(1)*rho_s (speculardielectricbrdf.cpp:61-64)

    wi = jnp.where(
        choose_reflect[..., None],
        wi_refl,
        jnp.where(tir[..., None], wi_refl, wi_refr),
    )
    f = jnp.where(
        choose_reflect[..., None],
        f_refl,
        jnp.where(tir[..., None], f_tir, f_refr),
    )
    pdf = jnp.where(choose_reflect, fr, 1.0 - fr)
    flags = jnp.where(
        choose_reflect | tir,
        SPECULAR,
        SPECULAR | TRANSMISSIVE,
    ).astype(jnp.int32)

    # index-matched pass-through (speculardielectricbrdf.cpp:23-28)
    wi = jax.lax.stop_gradient(jnp.where(matched[..., None], -wo, wi))
    pdf = jnp.where(matched, 0.0, pdf)
    f = jnp.where(matched[..., None], desc.tau, f)
    flags = jnp.where(matched, prev_flags | TRANSMISSIVE, flags)
    alpha_i = jnp.zeros(wo.shape[:-1], jnp.float32)
    return f, wi, pdf, flags, alpha_i


# ---------------------------------------------------------------------------
# Per-lobe dispatch (masked select over the 5 lobe families)
# ---------------------------------------------------------------------------


def _lobe_f(desc, code, wo, wi, use_prime, eta_outer):
    z3 = jnp.zeros(wo.shape, jnp.float32)
    f = jnp.where((code == L_LAMBERT)[..., None], lambert_f(desc), z3)
    f = jnp.where(
        (code == L_TS)[..., None], ts_f(desc, wo, wi, use_prime, eta_outer), f
    )
    f = jnp.where(
        (code == L_DIELECTRIC)[..., None],
        dielectric_f(desc, wo, wi, use_prime, eta_outer),
        f,
    )
    return f  # specular lobes: f == 0


def _lobe_pdf(desc, code, wo, wi, use_prime, eta_outer):
    pdf = jnp.where(code == L_LAMBERT, lambert_pdf(wi), 0.0)
    pdf = jnp.where(
        code == L_TS, ts_pdf(desc, wo, wi, use_prime, eta_outer), pdf
    )
    pdf = jnp.where(
        code == L_DIELECTRIC,
        dielectric_pdf(desc, wo, wi, use_prime, eta_outer),
        pdf,
    )
    return pdf


def _lobe_sample(desc, code, wo, u1, u2, use_prime, eta_outer, prev_flags):
    f_l, wi_l, pdf_l, fl_l, a_l = lambert_sample(desc, u2)
    f_t, wi_t, pdf_t, fl_t, a_t = ts_sample(desc, wo, u2, use_prime, eta_outer)
    f_d, wi_d, pdf_d, fl_d, a_d = dielectric_sample(
        desc, wo, u1, u2, use_prime, eta_outer, prev_flags
    )
    f_s, wi_s, pdf_s, fl_s, a_s = specular_sample(desc, wo, eta_outer)
    f_g, wi_g, pdf_g, fl_g, a_g = specdiel_sample(
        desc, wo, u2, eta_outer, prev_flags
    )

    def sel(i, a, b):
        m = code == i
        return jnp.where(m[..., None] if a.ndim > m.ndim else m, a, b)

    f = sel(L_LAMBERT, f_l, sel(L_TS, f_t, sel(L_DIELECTRIC, f_d, sel(L_SPECULAR, f_s, f_g))))
    wi = sel(L_LAMBERT, wi_l, sel(L_TS, wi_t, sel(L_DIELECTRIC, wi_d, sel(L_SPECULAR, wi_s, wi_g))))
    pdf = sel(L_LAMBERT, pdf_l, sel(L_TS, pdf_t, sel(L_DIELECTRIC, pdf_d, sel(L_SPECULAR, pdf_s, pdf_g))))
    flags = sel(L_LAMBERT, fl_l, sel(L_TS, fl_t, sel(L_DIELECTRIC, fl_d, sel(L_SPECULAR, fl_s, fl_g))))
    alpha_i = sel(L_LAMBERT, a_l, sel(L_TS, a_t, sel(L_DIELECTRIC, a_d, sel(L_SPECULAR, a_s, a_g))))
    return f, wi, pdf, flags, alpha_i


# ---------------------------------------------------------------------------
# BSDF aggregate ops (bxdf.cpp:47-111)
# ---------------------------------------------------------------------------


def bsdf_f(desc: BsdfDesc, wo, wi, use_prime, eta_outer):
    """Sum of lobes (BSDF::f)."""
    f = _lobe_f(desc, desc.lobe[..., 0], wo, wi, use_prime, eta_outer)
    has2 = (desc.n_lobes >= 2)[..., None]
    f2 = _lobe_f(desc, desc.lobe[..., 1], wo, wi, use_prime, eta_outer)
    return f + jnp.where(has2, f2, 0.0)


def bsdf_pdf(desc: BsdfDesc, wo, wi, use_prime, eta_outer):
    """Average of lobe pdfs (BSDF::Pdf) — raw sums, parity."""
    p = _lobe_pdf(desc, desc.lobe[..., 0], wo, wi, use_prime, eta_outer)
    p2 = _lobe_pdf(desc, desc.lobe[..., 1], wo, wi, use_prime, eta_outer)
    p = p + jnp.where(desc.n_lobes >= 2, p2, 0.0)
    return p / desc.n_lobes.astype(jnp.float32)


def bsdf_sample_eta(desc: BsdfDesc, u1):
    """BSDF::Sample_eta (bxdf.cpp:94-100)."""
    idx = (u1 * desc.n_lobes.astype(jnp.float32)).astype(jnp.int32)
    idx = jnp.clip(idx, 0, 1)
    code = jnp.where(idx == 0, desc.lobe[..., 0], desc.lobe[..., 1])
    return lobe_eta(desc, code)


def bsdf_sample_f(desc: BsdfDesc, wo, u1, u2, use_prime, eta_outer, prev_flags):
    """One-sample lobe selection + mixing (BSDF::Sample_f, bxdf.cpp:56-92).

    Returns (f, wi, pdf, flags, alpha_i, eta_sampled).
    """
    n_f = desc.n_lobes.astype(jnp.float32)
    idx = jnp.clip((u1 * n_f).astype(jnp.int32), 0, 1)
    u1r = u1 * n_f - jnp.floor(u1 * n_f)  # glm::fract remap
    code = jnp.where(idx == 0, desc.lobe[..., 0], desc.lobe[..., 1])

    f, wi, pdf, flags, alpha_i = _lobe_sample(
        desc, code, wo, u1r, u2, use_prime, eta_outer, prev_flags
    )
    eta_sampled = lobe_eta(desc, code)

    # mix in the other lobe when the sampled flags are not SPECULAR
    other_code = jnp.where(idx == 1, desc.lobe[..., 0], desc.lobe[..., 1])
    mix = (
        ((flags & SPECULAR) == 0)
        & (desc.n_lobes >= 2)
        & ~lobe_static_specular(other_code)
    )
    p_other = _lobe_pdf(desc, other_code, wo, wi, use_prime, eta_outer)
    f_other = _lobe_f(desc, other_code, wo, wi, use_prime, eta_outer)
    add = mix & (p_other > 0.0)
    pdf = pdf + jnp.where(add, p_other, 0.0)
    f = f + jnp.where(add[..., None], f_other, 0.0)
    # pdf /= numBxDFs only on the non-specular path (parity quirk)
    pdf = jnp.where((flags & SPECULAR) == 0, pdf / n_f, pdf)
    return f, wi, pdf, flags, alpha_i, eta_sampled
