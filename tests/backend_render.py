"""Render golden-test scenes on the environment's fastest backend.

The test process pins jax to the virtual 8-device CPU mesh (conftest), which
is right for sharding/unit tests but makes full golden renders minutes-
to-hours slow.  This helper runs the SAME RenderSession code in a fresh
subprocess that keeps the environment's default backend (the real TPU chip
when the axon plugin is live) and hands the image back through a temp file.
If the subprocess fails for any reason — no TPU, tunnel down — the render
falls back to the in-process CPU path, so the suite stays correct (just
slower) off-host.

TPU compiles go through the persistent compilation cache, so after the
first suite run each subprocess render costs seconds.
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

_SCRIPT = r"""
import json, sys
import numpy as np

spec = json.load(open(sys.argv[1]))
from nart_tpu import render as render_mod
from nart_tpu.scene import load_scene

scene = load_scene(spec["scene_path"], asset_root=spec["asset_root"])
if spec.get("session_index") is None:
    params = render_mod.resolve_params({}, spec["overrides"])
else:
    sessions = render_mod.load_sessions(
        spec["scene_path"], spec["overrides"] or None
    )
    params = sessions[spec["session_index"]]
sess = render_mod.RenderSession(scene, params)
np.save(spec["out"], np.asarray(sess.image()))
"""


def render_image(scene_path, overrides=None, asset_root="/root/reference",
                 session_index=None, timeout=1200, fallback="cpu"):
    """Render and return the (H, W, 4) image, TPU-subprocess first.

    fallback: "cpu" renders in-process on the test backend when the
    subprocess fails; "skip" raises pytest.skip instead — for renders
    whose CPU cost (an hour-class large-mesh walk) would stall the suite.
    """
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "img.npy")
        spec = dict(
            scene_path=scene_path,
            overrides=overrides or {},
            asset_root=asset_root,
            session_index=session_index,
            out=out,
        )
        spec_path = os.path.join(td, "spec.json")
        import json

        with open(spec_path, "w") as f:
            json.dump(spec, f)
        env = dict(os.environ)
        # the subprocess must see the default (accelerator) backend and a
        # normal device count — drop the test-process overrides
        env.pop("NART_TEST_PLATFORM", None)
        env.pop("JAX_PLATFORMS", None)
        xf = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = " ".join(
            t for t in xf.split()
            if "xla_force_host_platform_device_count" not in t
        )
        try:
            r = subprocess.run(
                [sys.executable, "-c", _SCRIPT, spec_path],
                env=env,
                cwd="/root/repo",
                capture_output=True,
                timeout=timeout,
            )
            if r.returncode == 0 and os.path.exists(out):
                return np.load(out)
            sys.stderr.write(
                "backend_render subprocess failed, falling back to "
                f"in-process CPU:\n{r.stderr.decode()[-2000:]}\n"
            )
        except (subprocess.TimeoutExpired, OSError) as e:
            sys.stderr.write(f"backend_render subprocess error: {e}\n")

    if fallback == "skip":
        import pytest

        pytest.skip("accelerator subprocess unavailable and CPU fallback "
                    "would be hour-class for this scene")

    # in-process fallback (test-process backend, i.e. CPU)
    from nart_tpu import render as render_mod
    from nart_tpu.scene import load_scene

    scene = load_scene(scene_path, asset_root=asset_root)
    if session_index is None:
        params = render_mod.resolve_params({}, overrides or {})
    else:
        sessions = render_mod.load_sessions(scene_path, overrides or None)
        params = sessions[session_index]
    sess = render_mod.RenderSession(scene, params)
    return np.asarray(sess.image())
