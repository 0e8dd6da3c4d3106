"""Tiny programmatic scenes for tests, dry-runs and benchmarks."""

import dataclasses

import numpy as np

from .scene import (
    LIGHT_DISK,
    LIGHT_ENV,
    MAT_GLASS,
    MAT_GLOSSY,
    MAT_LAMBERT,
    MAT_PLASTIC,
    LightData,
    SceneData,
)


def env_scene(materials=("lambert",), tex_h=4, tex_w=8, intensity=2.0,
              **kw):
    """simple_scene but lit by an environment light with a small Le texture.

    env2d is left None (uniform-sphere sampling, pattern Pdf()=1): sampling
    pdfs are then independent of the texture, which keeps FD/AD gradient
    comparisons exact while still exercising the le_tex gradient path.
    """
    base = simple_scene(materials, **kw)
    v = np.linspace(0.3, 1.2, tex_h * tex_w, dtype=np.float32)
    le_tex = np.stack([v, v * 0.8, v * 0.5], -1).reshape(tex_h, tex_w, 3)
    env = LightData(
        kind=LIGHT_ENV, xf=np.eye(4, dtype=np.float32), radius=0.0,
        inner_radius=0.0, intensity=np.float32(intensity),
        le_const=np.zeros(3, np.float32), le_tex=le_tex, env2d=None,
    )
    return dataclasses.replace(base, lights=[env])


def quad(center, size, axis=2, flip=False):
    """Two triangles forming a square perpendicular to `axis`."""
    c = np.asarray(center, np.float32)
    a0, a1 = [(1, 2), (0, 2), (0, 1)][axis]
    corners = []
    for du, dv in [(-1, -1), (1, -1), (1, 1), (-1, 1)]:
        p = c.copy()
        p[a0] += du * size
        p[a1] += dv * size
        corners.append(p)
    c0, c1, c2, c3 = corners
    tris = np.array([[c0, c1, c2], [c0, c2, c3]], np.float32)
    n = np.zeros(3, np.float32)
    n[axis] = -1.0 if flip else 1.0
    nrm = np.tile(n, (2, 3, 1)).astype(np.float32)
    uv = np.array(
        [[[0, 0], [1, 0], [1, 1]], [[0, 0], [1, 1], [0, 1]]], np.float32
    )
    return tris, nrm, uv


def simple_scene(materials=("lambert",), light_z=3.0, light_r=0.8,
                 intensity=20.0, eta=1.5, roughness=0.4, priorities=None):
    """Stacked horizontal quads (one per material) + a disk light above.

    Quad k sits at z = -k (camera looks down -z from z=5).
    """
    tri_v, tri_n, tri_uv, tri_mesh = [], [], [], []
    mat_codes = {"lambert": MAT_LAMBERT, "glossy": MAT_GLOSSY,
                 "glass": MAT_GLASS, "plastic": MAT_PLASTIC}
    mtypes = []
    for k, m in enumerate(materials):
        v, n, uv = quad([0, 0, -float(k)], 2.0 - 0.3 * k, axis=2)
        tri_v.append(v)
        tri_n.append(n)
        tri_uv.append(uv)
        tri_mesh.append(np.full(2, k, np.int32))
        mtypes.append(mat_codes[m])
    m = len(materials)
    xf = np.eye(4, dtype=np.float32)
    xf[2, 3] = light_z  # light at z, facing -z (down)
    light = LightData(
        kind=LIGHT_DISK, xf=xf, radius=light_r, inner_radius=0.0,
        intensity=intensity, le_const=np.ones(3, np.float32),
        le_tex=None, env2d=None,
    )
    cam = np.eye(4, dtype=np.float32)
    cam[2, 3] = 5.0  # camera at z=5 looking down -z
    return SceneData(
        tri_v=np.concatenate(tri_v),
        tri_n=np.concatenate(tri_n),
        tri_uv=np.concatenate(tri_uv),
        tri_mesh=np.concatenate(tri_mesh),
        mesh_priority=np.asarray(priorities or [0] * m, np.int32),
        mat_type=np.asarray(mtypes, np.int32),
        rho_d_const=np.tile(np.float32([0.6, 0.4, 0.2]), (m, 1)),
        rho_d_tex=np.full(m, -1, np.int32),
        rho_s_const=np.ones((m, 3), np.float32),
        rho_s_tex=np.full(m, -1, np.int32),
        tau_const=np.ones((m, 3), np.float32),
        tau_tex=np.full(m, -1, np.int32),
        eta_const=np.full(m, eta, np.float32),
        eta_tex=np.full(m, -1, np.int32),
        alpha_const=np.full(m, roughness * roughness, np.float32),
        alpha_tex=np.full(m, -1, np.int32),
        has_normal=np.zeros(m, bool),
        normal_const=np.zeros((m, 3), np.float32),
        normal_tex=np.full(m, -1, np.int32),
        tex_data=np.zeros((1, 3), np.float32),
        tex_off=np.zeros(1, np.int32),
        tex_w=np.ones(1, np.int32),
        tex_h=np.ones(1, np.int32),
        lights=[light],
        cam_to_world=cam,
        fov=30.0,
        medium=None,
        n_meshes=m,
        n_tris=2 * m,
    )
