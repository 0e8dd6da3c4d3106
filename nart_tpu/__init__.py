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
  scene.py        JSON scene -> frozen SoA pytree of device arrays
                  (texture patterns live in materials.py; the env-map 2D
                  CDF build/sample/pdf in scene.py + lights.py)
  camera.py       pinhole ray generation
  geometry.py     watertight ray-triangle intersection (vectorised)
  select.py       small-K one-hot select/update helpers (gather-free)
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


def _enable_persistent_compile_cache() -> None:
    """Point JAX's persistent compilation cache at a stable on-disk dir.

    TPU (Mosaic) compiles of the traversal kernels take minutes; caching them
    across processes makes every run after the first start in seconds.  No-op
    if the user already configured a cache dir.
    """
    import os

    import jax

    if jax.config.jax_compilation_cache_dir is None:
        base = os.environ.get(
            "NART_TPU_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "nart_tpu_xla"),
        )
        if base in ("", "0", "off"):
            return
        # Partition by platform config AND host identity: a shared dir
        # between the TPU and CPU-test processes produced
        # concurrently-written entries whose deserialization segfaulted
        # readers mid-suite, and CPU AOT entries baked for one host
        # generation (e.g. "+prefer-no-gather" feature sets) SIGILL/segfault
        # when loaded on another — XLA's own cache key does not cover host
        # CPU features, so they go into the directory name instead.
        import hashlib
        import platform as _platform

        plat = (
            jax.config.jax_platforms
            or os.environ.get("JAX_PLATFORMS")
            or "default"
        ).replace(",", "-")
        if "cpu" in plat:
            # CPU partitions stay keyed by XLA_FLAGS + host identity (the
            # AOT-feature-set segfaults are CPU-only)
            flags = hashlib.sha1(
                os.environ.get("XLA_FLAGS", "").encode()
            ).hexdigest()[:8]
            host_bits = [_platform.machine(), _platform.processor()]
            seen = set()
            try:
                with open("/proc/cpuinfo") as f:
                    for line in f:  # first core's lines identify the host
                        k = line.split(":", 1)[0].strip()
                        if k in ("flags", "model name", "Features") \
                                and k not in seen:
                            seen.add(k)
                            host_bits.append(line.strip())
            except OSError:
                pass
            host = hashlib.sha1("|".join(host_bits).encode()).hexdigest()[:8]
            cache = os.path.join(base, f"{plat}-{flags}-{host}")
        else:
            # accelerator partitions key on the platform ONLY: XLA's own
            # cache key covers every flag that affects the executable, and
            # hashing the raw XLA_FLAGS env (round 4) split the partition
            # whenever a wrapper exported unrelated flags (e.g. the
            # multichip dryrun's host-platform-device-count) — the driver
            # then paid a full cold compile our warm runs never saw
            cache = os.path.join(base, plat)
        try:
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass  # cache is an optimisation only — never fail import


_enable_persistent_compile_cache()
