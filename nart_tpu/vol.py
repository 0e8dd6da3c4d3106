""".vol density-grid parsing.

Parity: reference src/core/scene.cpp:825-867 — text format:
  boundsMin.xyz  boundsMax.xyz  resX resY resZ  density[resX*resY*resZ]
Density values are indexed (z, y, x) flat as x + resX*y + resX*resY*z
(media.cpp:3-7), i.e. a (Z, Y, X) C-order array.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class VolGrid:
    bounds_min: np.ndarray  # (3,)
    bounds_max: np.ndarray  # (3,)
    density: np.ndarray  # (Z, Y, X) float32


def load_vol(path: str) -> VolGrid:
    from . import _native

    native = _native.vol_load(path)
    if native is not None:
        return VolGrid(
            bounds_min=native[0], bounds_max=native[1], density=native[2]
        )
    return _load_vol_py(path)


def _load_vol_py(path: str) -> VolGrid:
    """Pure-Python twin of the native parser (behavior-defining fallback)."""
    nums = np.fromfile(path, dtype=np.float64, sep=" ")
    if nums.size < 9:
        raise ValueError(f"volume file {path} could not be read")
    bmin = nums[0:3].astype(np.float32)
    bmax = nums[3:6].astype(np.float32)
    rx, ry, rz = (int(v) for v in nums[6:9])
    vals = nums[9 : 9 + rx * ry * rz]
    if vals.size != rx * ry * rz:
        raise ValueError(f"volume file {path} truncated")
    return VolGrid(
        bounds_min=bmin,
        bounds_max=bmax,
        density=vals.astype(np.float32).reshape(rz, ry, rx),
    )


def write_vol(path: str, grid: VolGrid) -> None:
    """Inverse of load_vol (used to generate test volumes; the reference's
    hand.vol asset is a missing large blob)."""
    rz, ry, rx = grid.density.shape
    with open(path, "w") as f:
        f.write(" ".join(str(float(v)) for v in grid.bounds_min) + "\n")
        f.write(" ".join(str(float(v)) for v in grid.bounds_max) + "\n")
        f.write(f"{rx} {ry} {rz}\n")
        np.savetxt(f, grid.density.reshape(-1, rx), fmt="%.6g")
