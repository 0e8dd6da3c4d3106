"""Micro-benchmark: isolate the Pallas traversal kernel on cameraLens."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from nart_tpu.scene import load_scene
from nart_tpu.pallas_accel import build_clusters, intersect_clusters, block_cluster_mask

scene = load_scene("/root/reference/input/scenes/cameraLens.json", asset_root="/root/reference")
tri_v = np.asarray(scene.tri_v)
print("tris:", len(tri_v))
accel = build_clusters(tri_v)
print("clusters:", accel.n_clusters)

# camera rays 256x256 (coherent) and shuffled (incoherent-ish)
from nart_tpu import camera
n = 256 * 256
idx = jnp.arange(n, dtype=jnp.int32)
px, py = idx % 256, idx // 256
s = jnp.full((n, 2), 0.5, jnp.float32)
o, d = camera.cast_rays(scene.cam_to_world, scene.fov, 256, 256, px, py, s)
t_min = jnp.zeros(n); t_max = jnp.full(n, np.float32(np.inf))

rngnp = np.random.default_rng(0)
perm = jnp.asarray(rngnp.permutation(n))
o_s, d_s = o[perm], d[perm]

fn = jax.jit(lambda o, d: intersect_clusters(o, d, t_min, t_max, accel))
for name, oo, dd in [("coherent", o, d), ("shuffled", o_s, d_s)]:
    h = fn(oo, dd); jax.block_until_ready(h.t)
    t0 = time.time()
    for _ in range(3):
        h = fn(oo, dd); jax.block_until_ready(h.t)
    dt = (time.time() - t0) / 3
    print(f"{name}: {dt*1e3:.1f} ms -> {n/dt/1e6:.2f} Mrays/s, hits={int((h.tri>=0).sum())}")

# mask-only timing
mfn = jax.jit(lambda o, d: block_cluster_mask(o, d, t_max, accel.cl_lo, accel.cl_hi, 512))
m = mfn(o, d); jax.block_until_ready(m)
t0 = time.time()
for _ in range(10): m = mfn(o, d); jax.block_until_ready(m)
print(f"mask only: {(time.time()-t0)/10*1e3:.2f} ms")
mnp = np.asarray(m)
print(f"mask visible frac coherent: {mnp.mean():.4f}, avg visible clusters/block: {mnp.sum(1).mean():.1f}, max {mnp.sum(1).max()}")
m2 = np.asarray(mfn(o_s, d_s))
print(f"mask visible frac shuffled: {m2.mean():.4f}, avg visible clusters/block: {m2.sum(1).mean():.1f}, max {m2.sum(1).max()}")
