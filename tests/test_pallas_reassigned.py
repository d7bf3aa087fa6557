"""Fused reassigned-column kernel: parity vs the XLA path (interpret mode).

On CPU the production path falls back to XLA (``reassigned_supported`` is
false without a TPU), so the kernel is validated through the Pallas
interpreter at n=512/h=1024 against the analyzer's own XLA formulation.
Tolerances reflect the kernel's bf16x3 dot decomposition (~5e-6 relative per
stage): corrections on bins within 60 dB of the column peak match to well
under the display's resolution (0.0024 dB power step, sub-Hz frequency).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from openmeters_tpu.analyzers.spectrogram import SpectrogramAnalyzer, SpectrogramConfig


def _run(analyzer, frames, env: dict):
    import jax

    old = {k: os.environ.get(k) for k in env}
    os.environ.update({k: v for k, v in env.items() if v})
    for k, v in env.items():
        if not v:
            os.environ.pop(k, None)
    jax.clear_caches()
    try:
        valid = jnp.ones(frames.shape[:2], bool)
        out = analyzer._reassigned(jnp.asarray(frames), valid)
        return tuple(np.asarray(v) for v in out)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        jax.clear_caches()


@pytest.mark.slow
def test_fused_reassigned_matches_xla_path():
    rng = np.random.default_rng(11)
    n, h = 512, 1024
    cfg = SpectrogramConfig(
        fft_size=n, hop_size=64, use_reassignment=True, block_frames=256
    )
    ana = SpectrogramAnalyzer(cfg)
    assert ana.read_len == h

    sr = 48000.0
    t = np.arange(h) / sr
    frames = np.stack(
        [
            0.4 * np.sin(2 * np.pi * (180.0 + 61.0 * i) * t + 0.3 * i)
            + 0.005 * rng.standard_normal(h)
            for i in range(6)
        ]
    ).astype(np.float32)[:, None, :]  # [S, cap=1, h]

    fused = _run(ana, frames, {"OPENMETERS_PALLAS_INTERPRET": "1"})
    ref = _run(ana, frames, {"OPENMETERS_PALLAS_INTERPRET": "", "OPENMETERS_NO_PALLAS": "1"})

    f_k, t_k, p_k = fused[0], fused[1], fused[2]
    f_r, t_r, p_r = ref[0], ref[1], ref[2]
    # compare where the column has meaningful energy (within 60 dB of peak)
    peak = p_r.max(axis=-1, keepdims=True)
    sig = p_r > 1e-6 * peak
    assert sig.any()
    assert np.abs(f_k - f_r)[sig].max() < 0.5, "freq corrections (Hz)"
    assert np.abs(t_k - t_r)[sig].max() < 0.01, "time corrections (hops)"
    rel = np.abs(p_k - p_r) / np.maximum(p_r, 1e-12)
    assert rel[sig].max() < 5e-3, "power"
