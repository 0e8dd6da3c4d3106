"""Quick fwd throughput check on the real TPU for one scene.

Usage: python tools/bench_scene.py <scene.json> <w> <h> <spp> [sort]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from nart_tpu import render as render_mod
from nart_tpu.scene import load_scene


def main():
    scene_path, w, h, spp = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    sort = None
    if len(sys.argv) > 5:
        sort = sys.argv[5] == "1"
    if os.environ.get("NART_SKIP_SHADOW"):
        from nart_tpu.integrators import path as pmod
        pmod._DEBUG_SKIP_SHADOW = True
    scene = load_scene(scene_path, asset_root="/root/reference")
    params = render_mod.RenderParams(
        image_width=w, image_height=h, spp=spp, bounces=10,
        filter_width=2.0, roughening_factor=0.2, sort_rays=sort,
    )
    sess = render_mod.RenderSession(scene, params)
    t0 = time.time()
    film, rays = sess.render(with_stats=True)
    print(f"compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    film, rays = sess.render(with_stats=True)
    dt = time.time() - t0
    print(f"fwd: {dt:.2f}s  {rays/dt/1e6:.3f} Mrays/s  (rays={rays:.0f})",
          flush=True)

    # per-chunk round counts (balanced scheduler)
    import jax
    import jax.numpy as jnp
    from nart_tpu.render import _setup_jit, _trace_balanced_jit
    n = sess.render_w * sess.render_h
    idx = jnp.arange(n, dtype=jnp.int32)
    px, py = idx % sess.render_w, idx // sess.render_w
    samples, _ = _setup_jit(px, py, sess.total_w, sess.params.spp)
    chunk = min(sess.params.spp, 32)
    t0 = time.time()
    la, r, rounds = jax.block_until_ready(_trace_balanced_jit(
        samples[0:chunk], sess.scene_dev, sess.bvh, sess.params,
        sess.render_w, sess.render_h, jnp.int32(0)))
    dt = time.time() - t0
    print(f"chunk0: {dt:.2f}s rounds={int(rounds)} "
          f"({dt/max(int(rounds),1)*1000:.1f} ms/round)", flush=True)


if __name__ == "__main__":
    main()
