"""Test configuration: run on CPU with 8 virtual devices.

This is the standard JAX pattern for exercising pjit/shard_map code without a
pod (SURVEY.md §4): the same sharded programs that run on a TPU slice compile
and execute on the virtual CPU mesh, so sharding invariants (determinism,
psum correctness) are tested everywhere.

Note: this environment registers a TPU ('axon') PJRT plugin whose site hook
overrides JAX_PLATFORMS, so the env var alone is not enough — we must flip
jax_platforms through the config API after import, before backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NART_TEST_PLATFORM: "cpu" (default) runs everything on the virtual
# 8-device CPU mesh; set to "" to keep the environment's default backend
# (the real TPU chip) — useful for the NART_SLOW_TESTS golden renders,
# which are ~100x faster there.
_plat = os.environ.get("NART_TEST_PLATFORM", "cpu")
if _plat:
    jax.config.update("jax_platforms", _plat)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _free_jit_code_space():
    """Drop compiled-program caches after every test module.

    XLA:CPU never returns JIT code memory while executables are alive, and
    its allocator's budget is exhausted after ~50 of this suite's large
    wavefront programs in one process: LLVM reports 'Cannot allocate
    memory' and the next compile SEGFAULTS — the mid-suite crashes
    root-caused in round 4 (a 100-compile repro dies at iteration ~50
    without this, and completes with it; RSS stays flat).  Per-module
    clearing keeps any one module far under the budget while preserving
    intra-module program reuse."""
    yield
    jax.clear_caches()
