"""Material resolution: per-hit BSDF descriptors + texture fetches.

Parity: the 5 Material::CreateBSDF implementations (src/materials/*.cpp) and
TexturePattern::GetValue (texturepattern.cpp:172-188).  Virtual CreateBSDF
becomes a data-parallel table lookup: gather per-mesh parameters, fetch
patterns, apply path-space roughening (alpha' = 1 - (1-alpha)*alphaTweak)
and resolve the lobe configuration per lane.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import bxdf
from .scene import (
    MAT_GLASS,
    MAT_GLOSSY,
    MAT_LAMBERT,
    MAT_PLASTIC,
    MAT_SPECULAR,
    SceneData,
)


def tex_fetch(scene: SceneData, tex_id, st):
    """Nearest-neighbour texture lookup with the reference's clamps/v-flip.

    texturepattern.cpp:172-188: u = clamp(st.x, 1e-4, .9999),
    v = clamp(1 - st.y, 1e-4, .9999), integer-truncated indices.
    tex_id: (N,) int32 into the packed buffer; returns (N, 3).
    """
    tid = jnp.maximum(tex_id, 0)
    w = scene.tex_w[tid]
    h = scene.tex_h[tid]
    off = scene.tex_off[tid]
    u = jnp.clip(st[..., 0], 1e-4, 0.9999)
    v = jnp.clip(1.0 - st[..., 1], 1e-4, 0.9999)
    iu = (w.astype(jnp.float32) * u).astype(jnp.int32)
    iv = (h.astype(jnp.float32) * v).astype(jnp.int32)
    return scene.tex_data[off + iv * w + iu]


def _pattern(scene, const_table, tex_table, mesh_id, st, slot):
    """Constant-or-texture pattern value per lane: (N, 3).

    When the scene's STATIC tex_slots says no mesh binds a texture in this
    slot, the gather is skipped entirely (TPU gathers cost ~1.3 ms per
    bounce round at 32k lanes even against a dummy buffer)."""
    val = const_table[mesh_id]
    if slot not in getattr(scene, "tex_slots", (slot,)):
        return val
    tid = tex_table[mesh_id]
    tex_val = tex_fetch(scene, tid, st)
    return jnp.where((tid >= 0)[..., None], tex_val, val)


def make_bsdf(scene: SceneData, mesh_id, st, sn, dpds, alpha_tweak):
    """Resolve the per-hit BSDF: shading frame + lobe descriptor.

    Returns (frame, desc).  Mirrors the CreateBSDF logic of all five
    materials, including:
      * roughening chain alpha' = 1 - (1-alpha)*alphaTweak
      * glossy/glass degrade to delta lobes when alpha' <= 1e-4
        (plastic's specular slot threshold is 1e-3, plasticmaterial.cpp:39)
      * microfacet lobes get alpha0 = max(1e-4, alpha)
      * specular material has alpha = 0 (specularmaterial.cpp:26)
    """
    mat = scene.mat_type[mesh_id]
    slots = getattr(scene, "tex_slots", None)
    if slots is None:  # legacy scenes without the static slot set
        slots = ("rho_d", "rho_s", "tau", "eta", "alpha", "normal")

    rho_d = _pattern(
        scene, scene.rho_d_const, scene.rho_d_tex, mesh_id, st, "rho_d"
    )
    rho_s = _pattern(
        scene, scene.rho_s_const, scene.rho_s_tex, mesh_id, st, "rho_s"
    )
    tau = _pattern(scene, scene.tau_const, scene.tau_tex, mesh_id, st, "tau")
    if "eta" in slots:
        eta_tid = scene.eta_tex[mesh_id]
        eta = jnp.where(
            eta_tid >= 0,
            tex_fetch(scene, eta_tid, st)[..., 0],
            scene.eta_const[mesh_id],
        )
    else:
        eta = scene.eta_const[mesh_id]
    if "alpha" in slots:
        alpha_tid = scene.alpha_tex[mesh_id]
        alpha = jnp.where(
            alpha_tid >= 0,
            tex_fetch(scene, alpha_tid, st)[..., 0],  # packed pre-squared
            scene.alpha_const[mesh_id],
        )
    else:
        alpha = scene.alpha_const[mesh_id]
    alpha = jnp.where(mat == MAT_SPECULAR, 0.0, alpha)
    alpha_prime = 1.0 - (1.0 - alpha) * alpha_tweak

    # shading frame (+ optional normal map; glass never has one — baked out
    # at scene load, matching the reference's GlassMaterial ctor bug)
    has_n = scene.has_normal[mesh_id]
    if "normal" in slots:
        n_tid = scene.normal_tex[mesh_id]
        n_val = jnp.where(
            (n_tid >= 0)[..., None],
            tex_fetch(scene, n_tid, st),
            scene.normal_const[mesh_id],
        )
    else:
        n_val = scene.normal_const[mesh_id]
    nn = n_val * 2.0 - 1.0
    frame_plain = bxdf.build_frame(sn, dpds)
    frame_mapped = bxdf.build_frame(sn, dpds, nn)
    frame = bxdf.Frame(
        t=jnp.where(has_n[..., None], frame_mapped.t, frame_plain.t),
        b=jnp.where(has_n[..., None], frame_mapped.b, frame_plain.b),
        n=jnp.where(has_n[..., None], frame_mapped.n, frame_plain.n),
    )

    micro = jnp.where(alpha_prime > 1e-4, bxdf.L_TS, bxdf.L_SPECULAR)
    lobe0 = jnp.select(
        [
            mat == MAT_LAMBERT,
            mat == MAT_SPECULAR,
            mat == MAT_GLOSSY,
            mat == MAT_GLASS,
            mat == MAT_PLASTIC,
        ],
        [
            jnp.full_like(mat, bxdf.L_LAMBERT),
            micro,
            micro,
            jnp.where(alpha_prime > 1e-4, bxdf.L_DIELECTRIC, bxdf.L_SPECDIEL),
            jnp.full_like(mat, bxdf.L_LAMBERT),
        ],
    )
    lobe1 = jnp.where(
        mat == MAT_PLASTIC,
        jnp.where(alpha_prime > 1e-3, bxdf.L_TS, bxdf.L_SPECULAR),
        -1,
    )
    n_lobes = jnp.where(mat == MAT_PLASTIC, 2, 1).astype(jnp.int32)

    desc = bxdf.BsdfDesc(
        n_lobes=n_lobes,
        lobe=jnp.stack([lobe0, lobe1], axis=-1).astype(jnp.int32),
        rho_d=rho_d,
        rho_s=rho_s,
        tau=tau,
        eta=eta,
        alpha0=jnp.maximum(np.float32(1e-4), alpha),
        alpha_prime=alpha_prime,
    )
    return frame, desc
