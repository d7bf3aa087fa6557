"""Fused Pallas sliding-DFT hop: parity vs the XLA path (interpret mode).

On CPU the production path automatically falls back to XLA
(``pallas_enabled()``), so the kernel itself is validated here through the
Pallas interpreter on tiny shapes; real-TPU parity (max 0.017 dB vs exact
f64 over 40 hops at 2048/64) is measured in NOTES.md round-2 notes.
"""

import os

import numpy as np
import pytest

from openmeters_tpu.analyzers.spectrogram import SpectrogramAnalyzer, SpectrogramConfig


def _run(analyzer, blocks, env: dict):
    import jax

    old = {k: os.environ.get(k) for k in env}
    os.environ.update({k: v for k, v in env.items() if v})
    for k, v in env.items():
        if not v:
            os.environ.pop(k, None)
    jax.clear_caches()
    try:
        carry = analyzer.init(blocks.shape[1])
        outs = []
        for b in blocks:
            carry, o = analyzer.step(carry, b)
            outs.append((np.asarray(o.codes), np.asarray(o.valid)))
        return outs
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        jax.clear_caches()


@pytest.mark.slow
def test_fused_hop_matches_xla_path():
    rng = np.random.default_rng(7)
    cfg = SpectrogramConfig(
        fft_size=128, hop_size=32, use_reassignment=False, block_frames=64
    )
    ana = SpectrogramAnalyzer(cfg)
    blocks = (rng.standard_normal((8, 3, 64)) * 0.4).astype(np.float32)

    fused = _run(
        ana, blocks,
        {"OPENMETERS_PALLAS_INTERPRET": "1", "OPENMETERS_NO_PALLAS": ""},
    )
    ref = _run(
        ana, blocks,
        {"OPENMETERS_PALLAS_INTERPRET": "", "OPENMETERS_NO_PALLAS": "1"},
    )
    worst = 0
    for (cf, vf), (cr, vr) in zip(fused, ref):
        np.testing.assert_array_equal(vf, vr)
        d = np.abs(cf.astype(int) - cr.astype(int)) * vr[:, :, None]
        worst = max(worst, int(d.max()))
    assert worst <= 2, f"max u16 code delta {worst} (1 code = 0.0024 dB)"
