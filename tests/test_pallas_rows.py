"""Batched per-row window extraction (ops/pallas_rows.py).

The CPU test mesh exercises the vmap fallback path; the kernel's dynamic
roll + aligned slice lowering is validated on TPU by the same call sites
(oscilloscope trigger) and by running this file on TPU hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp

from openmeters_tpu.ops.pallas_rows import window_rows


def _ref(x, starts, length):
    starts = np.clip(starts, 0, x.shape[-1] - length)
    return np.stack(
        [x[i, s : s + length] for i, s in enumerate(starts)], axis=0
    )


def test_window_rows_matches_dynamic_slice():
    rng = np.random.default_rng(3)
    for s, n, l in [(16, 1024, 512), (8, 9603, 7200), (3, 257, 100)]:
        x = rng.standard_normal((s, n)).astype(np.float32)
        starts = rng.integers(-5, n, s).astype(np.int32)  # incl. clip cases
        got = np.asarray(window_rows(jnp.asarray(x), jnp.asarray(starts), l))
        np.testing.assert_array_equal(got, _ref(x, starts, l))


def test_window_rows_multi_window():
    rng = np.random.default_rng(4)
    s, n, l, w = 8, 2048, 300, 3
    x = rng.standard_normal((s, n)).astype(np.float32)
    starts = rng.integers(0, n - l, (s, w)).astype(np.int32)
    got = np.asarray(window_rows(jnp.asarray(x), jnp.asarray(starts), l))
    assert got.shape == (s, w, l)
    for k in range(w):
        np.testing.assert_array_equal(got[:, k], _ref(x, starts[:, k], l))
