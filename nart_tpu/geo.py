""".geo mesh loading: parse, fan-triangulate, transform to world space.

Parity: reference src/core/scene.cpp:77-343 (LoadMeshFromFile).  The .geo
format (produced by python/obj2geo.py) is whitespace-separated text:

  numFaces
  faceVertCount[numFaces]
  vertIndex[sum(faceVertCounts)]
  vertCoord[(maxVertIndex+1) * 3]
  normIndex[sum(faceVertCounts)]
  normCoord[(maxNormIndex+1) * 3]
  uvIndex[sum(faceVertCounts)]        (optional)
  uvCoord[(maxUVIndex+1) * 2]         (optional)

Matrix convention: scene JSON stores row-major 4x4 matrices A; points
transform as A @ [p, 1] and normals as inverse(A).T @ [n, 0] (the reference
expresses the same products through GLM's column-major storage and row-vector
multiplies — scene.cpp:240-254).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# Default UVs when a mesh has none: Triangle ctor defaults (geometry.h:58-60).
_DEFAULT_UVS = np.array([[0.0, 0.0], [0.0, 1.0], [1.0, 0.0]], np.float32)


@dataclass
class MeshArrays:
    """Fan-triangulated world-space triangle soup (SoA)."""

    v: np.ndarray  # (T, 3, 3) vertices
    n: np.ndarray  # (T, 3, 3) shading normals
    uv: np.ndarray  # (T, 3, 2)


def load_geo(path: str, object_to_world: np.ndarray) -> MeshArrays:
    from . import _native

    native = _native.geo_load(path, object_to_world)
    if native is not None:
        return MeshArrays(v=native[0], n=native[1], uv=native[2])
    return _load_geo_py(path, object_to_world)


def _load_geo_py(path: str, object_to_world: np.ndarray) -> MeshArrays:
    """Pure-Python twin of the native parser (behavior-defining fallback)."""
    nums = np.fromfile(path, dtype=np.float64, sep=" ")
    if nums.size == 0:
        raise ValueError(f"mesh file {path} could not be read")
    pos = 0

    def take(n):
        nonlocal pos
        out = nums[pos : pos + n]
        if out.size != n:
            raise ValueError(f"mesh file {path} truncated")
        pos += n
        return out

    num_faces = int(take(1)[0])
    face_counts = take(num_faces).astype(np.int64)
    nvi = int(face_counts.sum())
    vert_idx = take(nvi).astype(np.int64)
    verts = take((vert_idx.max() + 1) * 3).astype(np.float32).reshape(-1, 3)
    norm_idx = take(nvi).astype(np.int64)
    norms = take((norm_idx.max() + 1) * 3).astype(np.float32).reshape(-1, 3)

    no_uvs = pos >= nums.size
    if not no_uvs:
        uv_idx = take(nvi).astype(np.int64)
        uvs = take((uv_idx.max() + 1) * 2).astype(np.float32).reshape(-1, 2)

    a = np.asarray(object_to_world, np.float32).reshape(4, 4)
    verts = verts @ a[:3, :3].T + a[:3, 3]
    inv_t = np.linalg.inv(a)[:3, :3].T  # normals: inverse-transpose
    norms = norms @ inv_t.T
    norms /= np.maximum(np.linalg.norm(norms, axis=-1, keepdims=True), 1e-20)

    # Fan triangulation: face (i0, i1, ..., ik) -> (i0, ij+1, ij+2).
    # scene.cpp:274-282.
    tri_corner = []
    start = 0
    for c in face_counts:
        c = int(c)
        for j in range(c - 2):
            tri_corner.append((start, start + j + 1, start + j + 2))
        start += c
    tri_corner = np.asarray(tri_corner, np.int64)  # (T, 3) into flat index lists

    v = verts[vert_idx[tri_corner]]
    n = norms[norm_idx[tri_corner]]
    if no_uvs:
        uv = np.broadcast_to(_DEFAULT_UVS, (len(tri_corner), 3, 2)).copy()
    else:
        uv = uvs[uv_idx[tri_corner]]
    return MeshArrays(
        v=v.astype(np.float32), n=n.astype(np.float32), uv=uv.astype(np.float32)
    )
