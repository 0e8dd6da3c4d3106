"""Pytree registration helper for framework dataclasses.

Arrays flow through jit as leaves; structural metadata (sizes, type codes,
scalar config) stays static so kernels can specialise on it.
"""

from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls=None, *, meta_fields=()):
    """Register a dataclass as a pytree with the given static fields."""

    def wrap(c):
        fields = [f.name for f in dataclasses.fields(c)]
        data_fields = [f for f in fields if f not in meta_fields]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(meta_fields)
        )
        return c

    return wrap(cls) if cls is not None else wrap
