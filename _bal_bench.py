import time, dataclasses
import numpy as np
from nart_tpu import render as render_mod
from nart_tpu.scene import load_scene

scene = load_scene("/root/reference/input/scenes/glassSphere.json", asset_root="/root/reference")
for wf, lanes, chunk in (("balanced", 0, 16), ("balanced", 1<<19, 16), ("balanced", 1<<20, 16)):
    params = render_mod.RenderParams(image_width=512, image_height=512, spp=16,
                                     bounces=10, filter_width=2.0, roughening_factor=0.2,
                                     wavefront=wf, spp_chunk=chunk, lanes=lanes)
    sess = render_mod.RenderSession(scene, params)
    t0=time.time(); f, r = sess.render(with_stats=True); c=time.time()-t0
    t0=time.time(); f, r = sess.render(with_stats=True); t=time.time()-t0
    print(f"{wf} lanes={lanes} chunk={chunk}: {t:.2f}s (compile {c:.1f}s) rays={r:.0f} -> {r/t/1e6:.2f} Mrays/s", flush=True)
