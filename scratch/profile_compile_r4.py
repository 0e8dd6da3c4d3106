"""Localize BENCH's 915s cold compile: time each jit program separately.

Runs with a FRESH persistent-cache dir so every compile is cold, mirroring
the driver's bench environment.  Prints per-program lower/compile seconds.
"""
import os
import sys
import tempfile
import time

os.environ["NART_TPU_CACHE"] = tempfile.mkdtemp(prefix="nart_cache_probe_")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from nart_tpu import grad as grad_mod
from nart_tpu import render as render_mod
from nart_tpu import rng, sampling
from nart_tpu.scene import load_scene

SIZE = int(os.environ.get("P_SIZE", "512"))
SPP = int(os.environ.get("P_SPP", "16"))


def clock(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"[{label}] {dt:.1f}s", flush=True)
    return out


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    scene = load_scene(
        "/root/reference/input/scenes/glassSphere.json",
        asset_root="/root/reference",
    )
    params = render_mod.RenderParams(
        image_width=SIZE, image_height=SIZE, spp=SPP, bounces=10,
        filter_width=2.0,
        # perturbable: a fresh constant forces a new HLO module hash, which
        # defeats any SERVER-side compile cache on the axon backend
        roughening_factor=float(os.environ.get("P_ROUGH", "0.2")),
    )
    sess = render_mod.RenderSession(scene, params)
    n = sess.render_w * sess.render_h
    idx = jnp.arange(n, dtype=jnp.int32)
    px = idx % sess.render_w
    py = idx // sess.render_w
    scene_dev = sess.scene_dev
    chunk = min(SPP, 32)

    # 1. setup
    samples, state = clock(
        "setup compile+run",
        lambda: jax.block_until_ready(
            render_mod._setup_jit(px, py, sess.total_w, SPP)
        ),
    )

    # 2. trace_balanced lower / compile / run
    args = (samples[0:chunk], scene_dev, sess.bvh, params,
            sess.render_w, sess.render_h, jnp.int32(0))
    lowered = clock(
        "trace_balanced lower",
        lambda: render_mod._trace_balanced_jit.lower(*args),
    )
    compiled = clock("trace_balanced compile", lowered.compile)
    la, rays = clock(
        "trace_balanced run",
        lambda: jax.block_until_ready(
            compiled(samples[0:chunk], scene_dev, sess.bvh, jnp.int32(0))
        ),
    )

    # 3. splat
    buf = jnp.zeros((sess.total_h, sess.total_w, 5), jnp.float32)
    sargs = (buf, samples[0:chunk], la, params, sess.render_w,
             sess.render_h, sess.filter_bounds)
    slow = clock(
        "splat lower", lambda: render_mod._splat_chunk_jit.lower(*sargs)
    )
    scomp = clock("splat compile", slow.compile)

    # 4. grad path: measure_rounds (shares _trace_balanced_jit's cache
    # entry — should show ~0s compile)
    theta0 = grad_mod.get_params(scene_dev)
    _, _, rounds = clock(
        "measure_rounds (shared cache)",
        lambda: jax.block_until_ready(
            grad_mod._measure_rounds_jit(
                scene_dev, sess.bvh, samples[0:chunk], params, SIZE, SIZE,
                jnp.int32(0), 0,
            )
        ),
    )
    n_rounds = int(np.ceil(max(int(rounds), 1) / 16) * 16)
    print(f"n_rounds={n_rounds}", flush=True)

    # 5. balanced grad (the AD replay)
    cot = jnp.ones((chunk, n, 4), jnp.float32).at[..., 3].set(0.0)
    gargs = (scene_dev, theta0, sess.bvh, samples[0:chunk], cot, params,
             SIZE, SIZE, n_rounds, jnp.int32(0), 0)
    glow = clock(
        "balanced_grad lower",
        lambda: grad_mod._balanced_grad_jit.lower(*gargs),
    )
    gcomp = clock("balanced_grad compile", glow.compile)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
