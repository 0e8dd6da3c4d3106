"""Profile one balanced chunk of cameraLens and dump the op-level breakdown.

Captures a jax.profiler trace of _trace_balanced_jit, then parses the
xplane proto for per-op device durations, aggregated by op category.
"""
import glob
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from nart_tpu import render as render_mod
from nart_tpu.render import _setup_jit, _trace_balanced_jit
from nart_tpu.scene import load_scene

scene_path = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/input/scenes/cameraLens.json"
W = int(sys.argv[2]) if len(sys.argv) > 2 else 256
SPP = int(sys.argv[3]) if len(sys.argv) > 3 else 4

scene = load_scene(scene_path, asset_root="/root/reference")
params = render_mod.RenderParams(
    image_width=W, image_height=W, spp=SPP, bounces=10,
    filter_width=2.0, roughening_factor=0.2,
)
sess = render_mod.RenderSession(scene, params)
n = sess.render_w * sess.render_h
idx = jnp.arange(n, dtype=jnp.int32)
px, py = idx % sess.render_w, idx // sess.render_w
samples, _ = _setup_jit(px, py, sess.total_w, SPP)
chunk = min(SPP, 32)

args = (samples[0:chunk], sess.scene_dev, sess.bvh, sess.params,
        sess.render_w, sess.render_h, jnp.int32(0))
jax.block_until_ready(_trace_balanced_jit(*args))  # compile

logdir = "/tmp/nart_prof"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
out = _trace_balanced_jit(*args)
jax.block_until_ready(out)
jax.profiler.stop_trace()

# parse xplane
from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane files:", files, flush=True)
params_tool = {"tqx": "out:csv;"}
for f in files:
    try:
        data, _ = rtd.xspace_to_tool_data([f], "op_profile", params_tool)
        open("/tmp/op_profile.json", "wb").write(
            data if isinstance(data, bytes) else data.encode())
        print("wrote /tmp/op_profile.json", flush=True)
    except Exception as e:
        print("op_profile failed:", e, flush=True)
    try:
        data, _ = rtd.xspace_to_tool_data([f], "hlo_stats", params_tool)
        out_f = "/tmp/hlo_stats.csv"
        open(out_f, "w").write(data if isinstance(data, str)
                               else data.decode())
        print("wrote", out_f, flush=True)
    except Exception as e:
        print("hlo_stats failed:", e, flush=True)
