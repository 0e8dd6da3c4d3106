"""Device-time traversal benchmark: N traversals inside ONE jit call."""
import time
import numpy as np, jax, jax.numpy as jnp
from nart_tpu.scene import load_scene
from nart_tpu.pallas_accel import build_clusters, intersect_clusters, build_block_lists
from nart_tpu import camera

scene = load_scene("/root/reference/input/scenes/cameraLens.json", asset_root="/root/reference")
accel = build_clusters(np.asarray(scene.tri_v))
n = 256*256
idx = jnp.arange(n, dtype=jnp.int32)
px, py = idx % 256, idx // 256
s = jnp.full((n,2), .5, jnp.float32)
o, d = camera.cast_rays(scene.cam_to_world, scene.fov, 256, 256, px, py, s)
t_min = jnp.zeros(n); t_max = jnp.full(n, np.float32(np.inf))
perm = jnp.asarray(np.random.default_rng(0).permutation(n))

K = 10
def many(o, d):
    def body(i, acc):
        h = intersect_clusters(o.at[0,0].add(acc*1e-30), d, t_min, t_max, accel)
        return acc + jnp.sum(h.t * jnp.isfinite(h.t)) * 1e-30
    return jax.lax.fori_loop(0, K, body, jnp.float32(0.))
fn = jax.jit(many)

def rtt():
    g = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    jax.block_until_ready(g(x))
    t0 = time.time()
    for _ in range(20): x = g(x); jax.block_until_ready(x)
    return (time.time()-t0)/20
r = rtt()
print(f"dispatch RTT: {r*1e3:.1f} ms")

for name, oo, dd in [("coherent", o, d), ("shuffled", o[perm], d[perm])]:
    jax.block_until_ready(fn(oo, dd))
    t0 = time.time()
    for _ in range(3): jax.block_until_ready(fn(oo, dd))
    per = ((time.time()-t0)/3 - r) / K
    print(f"{name}: {per*1e3:.2f} ms/traversal -> {n/per/1e6:.2f} Mrays/s")

def lists_many(o, d):
    def body(i, acc):
        l, e, c = build_block_lists(o.at[0,0].add(acc*1e-30), d, t_max, accel, 512)
        return acc + jnp.sum(c).astype(jnp.float32) * 1e-30
    return jax.lax.fori_loop(0, K, body, jnp.float32(0.))
lfn = jax.jit(lists_many)
jax.block_until_ready(lfn(o, d))
t0 = time.time()
for _ in range(3): jax.block_until_ready(lfn(o, d))
print(f"lists prep: {(((time.time()-t0)/3 - r)/K)*1e3:.2f} ms")
