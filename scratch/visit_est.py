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

h = intersect_clusters(o, d, t_min, t_max, accel)
t = np.asarray(h.t)
for block in [128, 256, 512]:
    cl, ce, cc = build_block_lists(o, d, t_max, accel, block)
    ce = np.asarray(ce)[:,0,:]; cc = np.asarray(cc)
    nb = n // block
    tb = t.reshape(nb, block)
    tb_max = np.where(np.isfinite(tb).all(1), tb.max(1), np.inf)
    # lower bound on visits with final t_best (optimistic); upper = count
    visited = np.minimum((ce <= tb_max[:,None]).sum(1), cc)
    print(f"block={block}: avg visible={cc.mean():.0f}, avg visited(lb)={visited.mean():.0f}, "
          f"p90={np.percentile(visited,90):.0f}, max={visited.max()}")
