"""Streaming-state checkpoint/resume.

The reference persists only settings (DSP state rebuilds in seconds of
audio); SURVEY §5.4 calls out device-state snapshot/restore of the streaming
carry (filter states, rings, trigger locks) as the worthwhile rebuild
analogue — it lets a serving deployment migrate streams across processes or
chips without losing the 3 s loudness window or trigger locks.

Format: one ``.npz`` holding every carry leaf keyed by its pytree path plus a
config fingerprint; restore validates the fingerprint so a checkpoint can
never silently load into a mismatched engine config.
"""

from __future__ import annotations

import hashlib
import json

import jax
import numpy as np


# Bumped whenever a carry relayout changes leaf structure/shapes without a
# visible EngineConfig change (e.g. the round-4 cadenced-spectrum rebuild,
# which replaces the spectrum analyzer's block_frames with its hop_size).
# Hashing the *resolved analyzer configs* catches config-driven relayouts;
# the version constant catches purely structural ones.
CARRY_FORMAT_VERSION = 2


def _config_fingerprint(engine) -> str:
    resolved = sorted(
        (name, repr(a.config)) for name, a in engine.analyzers.items()
    )
    payload = f"carry-v{CARRY_FORMAT_VERSION}:{repr(engine.config)}:{resolved!r}"
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _flatten(carry):
    leaves, treedef = jax.tree.flatten(carry)
    paths = [
        "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(carry)[0]
    ]
    return paths, leaves, treedef


def save_state(path: str, engine, carry) -> None:
    paths, leaves, _ = _flatten(carry)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    meta = {
        "fingerprint": _config_fingerprint(engine),
        "paths": paths,
        "n_streams": _infer_streams(engine, leaves),
    }
    arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    np.savez_compressed(path, **arrays)


def load_state(path: str, engine):
    """Returns a carry pytree matching ``engine.init`` structure."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
        if meta["fingerprint"] != _config_fingerprint(engine):
            raise ValueError(
                "checkpoint was written by a different engine config "
                f"({meta['fingerprint']} != {_config_fingerprint(engine)})"
            )
        n_streams = meta.get("n_streams")
        if n_streams is None:  # pre-r2 checkpoint: infer from the leaves
            loaded_leaves = [z[f"leaf_{i}"] for i in range(len(meta["paths"]))]
            n_streams = _infer_streams(engine, loaded_leaves)
        template = engine.init(n_streams)
        paths, leaves, treedef = _flatten(template)
        if paths != meta["paths"]:
            raise ValueError("checkpoint structure mismatch")
        loaded = [z[f"leaf_{i}"] for i in range(len(leaves))]
    for got, want in zip(loaded, leaves):
        if got.shape != want.shape:
            raise ValueError(f"leaf shape mismatch: {got.shape} vs {want.shape}")
    return jax.tree.unflatten(treedef, [np.asarray(v) for v in loaded])


def _infer_streams(engine, leaves) -> int:
    """Recover the stream count from carry leaf shapes.

    Robust to dict order and config shape: compare ``engine.init(1)`` vs
    ``engine.init(2)`` — any axis whose size grows by exactly 1 is the
    stream axis, and the same leaf/axis in ``leaves`` gives the count.
    """
    t1 = jax.tree.leaves(engine.init(1))
    t2 = jax.tree.leaves(engine.init(2))
    for a, b, got in zip(t1, t2, leaves):
        for ax, (d1, d2) in enumerate(zip(np.shape(a), np.shape(b))):
            if d2 - d1 == 1:
                return int(np.shape(got)[ax])
    raise ValueError("cannot infer stream count from checkpoint")
