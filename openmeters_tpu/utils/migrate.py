"""Carry-migration helper shared by the analyzers' ``migrate_from`` methods.

The reference applies settings changes to live processors with field-level
state retention (``update_config`` per processor, e.g.
``spectrum/processor.rs:300-326``).  The batched analogue: each analyzer
exposes ``migrate_from(old_analyzer, carry, n_streams)`` returning the carry
to continue with (``None`` = re-init).  This module holds the generic
"keep what still fits" merge they share.
"""

from __future__ import annotations

import jax


def _compatible(a, b) -> bool:
    if jax.tree.structure(a) != jax.tree.structure(b):
        return False
    for u, v in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        if getattr(u, "shape", None) != getattr(v, "shape", None):
            return False
        if getattr(u, "dtype", None) != getattr(v, "dtype", None):
            return False
    return True


def merge_carry(fresh: dict, carry: dict) -> dict:
    """Per-key merge: keep the carried subtree wherever its structure,
    shapes and dtypes match the fresh template; take the fresh subtree
    otherwise (new state the old config didn't have, or resized state)."""
    return {
        k: carry[k] if k in carry and _compatible(carry[k], v) else v
        for k, v in fresh.items()
    }
