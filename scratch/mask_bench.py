import time
import numpy as np, jax, jax.numpy as jnp
from nart_tpu.scene import load_scene
from nart_tpu.pallas_accel import build_clusters, _block_cluster_bounds, build_block_lists
from nart_tpu import camera

scene = load_scene("/root/reference/input/scenes/cameraLens.json", asset_root="/root/reference")
accel = build_clusters(np.asarray(scene.tri_v))
n = 256*256
idx = jnp.arange(n, dtype=jnp.int32)
px, py = idx % 256, idx // 256
s = jnp.full((n,2), .5, jnp.float32)
o, d = camera.cast_rays(scene.cam_to_world, scene.fov, 256, 256, px, py, s)
t_max = jnp.full(n, np.float32(np.inf))

def timeit(name, f, *a):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(20): r = f(*a); jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/20*1e3:.2f} ms")
    return r

bounds = jax.jit(lambda o,d: _block_cluster_bounds(o, d, t_max, accel.aabb, 512))
timeit("bounds", bounds, o, d)

lists = jax.jit(lambda o,d: build_block_lists(o, d, t_max, accel, 512))
timeit("full lists (bounds+argsort)", lists, o, d)

# argsort alone
vis, ent = bounds(o, d)
key = jnp.where(vis, ent, np.float32(np.inf))
srt = jax.jit(lambda k: jnp.argsort(k, axis=1))
timeit("argsort (128,738)", srt, key)

# transpose alone
tr = jax.jit(lambda o: o.T.reshape(3, 128, 512).min(axis=2))
timeit("transpose+min", tr, o)
