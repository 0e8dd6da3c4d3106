"""Checkpoint / resume for long renders.

Role parity: the reference has none (SURVEY.md §5 — a crashed render loses
everything).  The film's (contribution, filterWeightSum) pair is already a
resumable sufficient statistic (render.h:18-21): accumulation is associative,
so a render checkpointed after k spp and resumed for the remaining spp-k is
*identical* to an uninterrupted run — the per-pixel RNG states carry the
stream position.

Format: NPZ with the raw film buffer, RNG states, spp progress and the
resolved render parameters (validated on resume).
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np


def save(path, film, rng_state, spp_done, params, extra=None):
    np.savez_compressed(
        path,
        film=np.asarray(film),
        rng_state=np.asarray(rng_state),
        spp_done=np.int64(spp_done),
        params=json.dumps(dataclasses.asdict(params)),
        extra=json.dumps(extra or {}),
    )


def load(path, params=None):
    """Returns (film, rng_state, spp_done).  If params given, verifies the
    checkpoint matches them (all fields except spp must agree)."""
    with np.load(path, allow_pickle=False) as z:
        film = z["film"]
        state = z["rng_state"]
        spp_done = int(z["spp_done"])
        saved = json.loads(str(z["params"]))
    if params is not None:
        want = dataclasses.asdict(params)
        for k, v in want.items():
            if k == "spp":
                continue
            if saved.get(k) != v:
                raise ValueError(
                    f"checkpoint mismatch for {k!r}: {saved.get(k)!r} != {v!r}"
                )
    return film, state, spp_done
