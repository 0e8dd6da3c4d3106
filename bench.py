#!/usr/bin/env python3
"""Benchmark: Mrays/s/chip forward+backward on the glassSphere config.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Config (BASELINE.md #1 / north star): glassSphere.json geometry/materials at
512x512; forward pass at 16 spp and a forward+backward (path-replay) step;
the reported metric is fwd+bwd Mrays/s/chip.

vs_baseline: the reference publishes no numbers and cannot be built here
(its CMake FetchContent deps need network access — see BASELINE.md), so the
ratio is against the first recorded run of this framework, stored in
bench_baseline.json (1.0 on the first run, improvement factor afterwards).

Env knobs: NART_BENCH_SPP (default 16), NART_BENCH_SIZE (default 512),
NART_BENCH_MODE (fwdbwd|fwd, default fwdbwd).
"""

import json
import os
import sys
import time

import numpy as np


def _load_scene():
    from nart_tpu.scene import load_scene
    from nart_tpu.testing import simple_scene

    ref = "/root/reference/input/scenes/glassSphere.json"
    if os.path.exists(ref):
        return load_scene(ref, asset_root="/root/reference")
    return simple_scene(("glass", "glass", "lambert"), priorities=[2, 3, 0])


def main():
    import jax
    import jax.numpy as jnp

    from nart_tpu import grad as grad_mod
    from nart_tpu import render as render_mod
    from nart_tpu.accel import build_bvh
    from nart_tpu.integrators import path as path_integrator
    from nart_tpu import camera, rng, sampling

    size = int(os.environ.get("NART_BENCH_SIZE", "512"))
    spp = int(os.environ.get("NART_BENCH_SPP", "16"))
    mode = os.environ.get("NART_BENCH_MODE", "fwdbwd")

    scene = _load_scene()
    params = render_mod.RenderParams(
        image_width=size, image_height=size, spp=spp, bounces=10,
        filter_width=2.0, roughening_factor=0.2,
    )
    sess = render_mod.RenderSession(scene, params)

    # ---- forward: full film render with ray stats
    t0 = time.time()
    film, rays_fwd = sess.render(with_stats=True)  # includes compile
    compile_s = time.time() - t0
    t0 = time.time()
    film, rays_fwd = sess.render(with_stats=True)
    fwd_s = time.time() - t0
    fwd_mrays = rays_fwd / fwd_s / 1e6

    result = {"fwd_mrays_per_s": fwd_mrays, "fwd_s": fwd_s,
              "compile_s": compile_s, "rays": rays_fwd}

    if mode == "fwdbwd":
        scene_j = jax.tree_util.tree_map(jnp.asarray, scene)
        bvh = sess.bvh
        theta0 = grad_mod.get_params(scene_j)
        n = size * size
        idx = jnp.arange(n, dtype=jnp.int32)
        px, py = idx % size, idx // size

        def loss(theta):
            scn = grad_mod.put_params(scene_j, theta)
            state = rng.seed(py * size + px)
            samples, state = sampling.latin_square(state, spp)

            def body(i, carry):
                acc, state, rays = carry
                o, d = camera.cast_rays(
                    scn.cam_to_world, scn.fov, size, size, px, py,
                    samples[:, i],
                )
                l, a, state, r = path_integrator.trace(
                    scn, bvh, o, d, state, params, differentiable=True
                )
                return acc + jnp.sum(l), state, rays + r

            acc, _, rays = jax.lax.fori_loop(
                0, spp, body, (jnp.float32(0), state, jnp.float32(0))
            )
            return acc, rays

        step = jax.jit(jax.value_and_grad(loss, has_aux=True))
        (lv, rays_b), grads = step(theta0)  # compile
        jax.block_until_ready(grads)
        t0 = time.time()
        (lv, rays_b), grads = step(theta0)
        jax.block_until_ready(grads)
        bwd_s = time.time() - t0
        fwdbwd_mrays = float(rays_b) / bwd_s / 1e6
        result.update(fwdbwd_mrays_per_s=fwdbwd_mrays, fwdbwd_s=bwd_s)
        value = fwdbwd_mrays
        metric = f"Mrays/s/chip fwd+bwd glassSphere {size}x{size}@{spp}spp"
    else:
        value = fwd_mrays
        metric = f"Mrays/s/chip fwd glassSphere {size}x{size}@{spp}spp"

    base_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        vs = value / base["value"] if base.get("value") else 1.0
    else:
        with open(base_path, "w") as f:
            json.dump({"metric": metric, "value": value}, f)
        vs = 1.0

    print(json.dumps({
        "metric": metric,
        "value": round(value, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(vs, 3),
    }))
    for k, v in result.items():
        print(f"# {k}: {v}", file=sys.stderr)


if __name__ == "__main__":
    main()
