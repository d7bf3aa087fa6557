"""Fused true-peak kernel: parity vs the XLA shifted-multiply path.

The kernel is opt-in on TPU (OPENMETERS_PALLAS_TRUEPEAK — see
ops/pallas_truepeak.py for why); here it runs through the Pallas
interpreter and must match the XLA formulation to f32 rounding.
"""

import os

import numpy as np
import pytest

from openmeters_tpu.ops.truepeak import TruePeakKernel


def _run(tp, blocks, env):
    import jax

    old = {k: os.environ.get(k) for k in env}
    os.environ.update({k: v for k, v in env.items() if v})
    for k, v in env.items():
        if not v:
            os.environ.pop(k, None)
    jax.clear_caches()
    try:
        c = tp.init(blocks[0].shape[1:])
        peaks = []
        for b in blocks:
            c, p = tp.process_block(c, b)
            peaks.append(np.asarray(p))
        return np.stack(peaks), np.asarray(c)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        jax.clear_caches()


@pytest.mark.parametrize("fs", [48_000.0, 96_000.0])
def test_fused_truepeak_matches_xla_path(fs):
    rng = np.random.default_rng(17)
    tp = TruePeakKernel(fs)
    blocks = (rng.standard_normal((3, 256, 5, 2)) * 0.6).astype(np.float32)

    fused_p, fused_c = _run(
        tp, blocks,
        {"OPENMETERS_PALLAS_INTERPRET": "1", "OPENMETERS_PALLAS_TRUEPEAK": "1"},
    )
    ref_p, ref_c = _run(
        tp, blocks,
        {"OPENMETERS_PALLAS_INTERPRET": "", "OPENMETERS_PALLAS_TRUEPEAK": ""},
    )
    np.testing.assert_allclose(fused_p, ref_p, atol=1e-6)
    np.testing.assert_allclose(fused_c, ref_c, atol=0)
