import time, os
import numpy as np, jax
from nart_tpu.scene import load_scene
from nart_tpu import render as render_mod

scene = load_scene("/root/reference/input/scenes/cameraLens.json", asset_root="/root/reference")
params = render_mod.RenderParams(image_width=256, image_height=256, spp=4,
                                 bounces=10, filter_width=2.0)
sess = render_mod.RenderSession(scene, params)
t0=time.time(); film, rays = sess.render(with_stats=True); c=time.time()-t0
t0=time.time(); film, rays = sess.render(with_stats=True); dt=time.time()-t0
print(f"compile {c:.1f}s run {dt:.2f}s rays {rays:.0f} -> {rays/dt/1e6:.3f} Mrays/s")
