"""nart-tpu: a TPU-native differentiable wavefront path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the nart
renderer (reference: /root/reference, a C++14 CPU path tracer).  The compute
path is a wavefront architecture: SoA ray/hit/shade buffers advanced by a
per-bounce pipeline under `lax.fori_loop`, fully jit-compiled, sharded over a
`jax.sharding.Mesh` for multi-chip scaling, and differentiable via
path-replay-style rematerialised backprop.

Layer map (bottom → top), mirroring the reference's layering (SURVEY.md §1):

  rng.py          counter/state-based Xorshift32 streams (rng.h parity)
  sampling.py     sampling warps (sampling.cpp parity)
  exr.py          EXR image I/O (OpenEXR lib via ctypes + pure-Python codec)
  geo.py          .geo mesh parsing + fan triangulation (scene.cpp parity)
  vol.py          .vol density-grid parsing
  texture.py      texture patterns + 2D CDF importance sampling
  scene.py        JSON scene -> frozen SoA pytree of device arrays
  camera.py       pinhole ray generation
  geometry.py     watertight ray-triangle intersection (vectorised)
  accel.py        LBVH build (Morton) + wavefront traversal
  bxdf.py         5 BSDF lobes + aggregation (branchless, differentiable)
  lights.py       disk / ring / environment / distant lights + MIS pdfs
  media.py        density grids, majorants, delta tracking
  film.py         Gaussian filter splatting (scatter-add film)
  integrators/    wavefront path + volume integrators
  render.py       render session orchestration (spp loop, jit)
  sharding.py     device-mesh sharding of pixels/film, psum merges
  grad.py         differentiable rendering entry points
  cli.py          `nart-tpu <scene.json> <out>` flag-compatible CLI
"""

__version__ = "0.1.0"
