"""Parity: fused Pallas trigger-correlation search vs an f64 replica.

Runs the kernel through the Pallas interpreter (no TPU needed) on
deterministic periodic signals and checks the picks against a NumPy f64
implementation of the same dense normalized-correlation search
(reference semantics: oscilloscope/processor.rs:358-475).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

NFFT = 512
WCAP = 448  # work capacity
KCAP = 256  # template capacity
SCAP = 96  # search capacity


def _f64_search(work, tmpl, klen, base, search):
    """Dense normalized correlation + earliest-max pick, f64."""
    s = work.shape[0]
    best = np.zeros((s,), np.int64)
    frac = np.zeros((s,), np.float64)
    cmean = np.zeros((s,), np.float64)
    scores_all = np.zeros((s, SCAP + 1), np.float64)
    for i in range(s):
        k = int(klen[i])
        n = max(k, 1)
        t = tmpl[i, :k].astype(np.float64)
        st, stt = t.sum(), (t * t).sum()
        scores = np.zeros(SCAP + 1)
        for o in range(int(search[i]) + 1):
            seg = work[i, base[i] + o : base[i] + o + k].astype(np.float64)
            sx, sxx = seg.sum(), (seg * seg).sum()
            dot = seg @ t - sx * st / n
            ex = max(sxx - sx * sx / n, 0.0)
            ey = max(stt - st * st / n, 0.0)
            den = np.sqrt(ex * ey)
            scores[o] = np.clip(dot / max(den, 1e-30), -1, 1) if den > 1e-7 else 0.0
        b = int(np.argmax(scores[: int(search[i]) + 1]))
        best[i] = b
        scores_all[i] = scores
        if 0 < b < int(search[i]):
            y0, y1, y2 = scores[b - 1], scores[b], scores[b + 1]
            den2 = y0 - 2 * y1 + y2
            delta = 0.0 if abs(den2) < 1e-7 else 0.5 * (y0 - y2) / den2
            refined = max(b + np.clip(delta, -1, 1), 1.0)
            frac[i] = np.clip(refined - b, -0.5, 0.5)
        seg = work[i, base[i] + b : base[i] + b + k].astype(np.float64)
        cmean[i] = seg.sum() / n
    return best, frac, cmean, scores_all


@pytest.fixture
def interpret_env(monkeypatch):
    monkeypatch.setenv("OPENMETERS_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("OPENMETERS_PALLAS_OSC", "1")


def test_corr_search_parity(interpret_env, rng):
    from openmeters_tpu.ops.pallas_osc_corr import corr_search

    s = 6
    rate = 4000.0
    work = np.zeros((s, WCAP), np.float32)
    tmpl = np.zeros((s, KCAP), np.float32)
    edge = np.zeros((s, KCAP), np.float32)
    klen = np.zeros((s,), np.int32)
    search = np.zeros((s,), np.int32)
    for i in range(s):
        freq = [97.0, 131.0, 163.0, 211.0, 89.0, 149.0][i]
        period = rate / freq
        k = int(min(max(round(2.2 * period), 2), KCAP))
        klen[i] = k
        search[i] = int(min(max(round(1.5 * period), 1), k // 2, SCAP))
        n = np.arange(WCAP)
        sig = np.sin(2 * np.pi * freq * n / rate + 0.7 * i)
        sig += 0.15 * np.sin(2 * np.pi * 2.7 * freq * n / rate)
        sig += 0.02 * rng.standard_normal(WCAP)
        work[i] = sig.astype(np.float32)
        tn = np.arange(k)
        # a plausible reference-like template: one period of the signal
        # shape with a gaussian falloff, plus an edge ramp
        g = np.exp(-0.5 * ((tn - (k - 1) / 2) / (0.35 * period)) ** 2)
        tmpl[i, :k] = (np.sin(2 * np.pi * freq * tn / rate + 0.3) * g).astype(
            np.float32
        )
        edge[i, :k] = (np.sign(2 * tn - (k - 1)) * g).astype(np.float32)
    base = (WCAP - search - klen).astype(np.int32)
    # mask work outside the read region like the analyzer does
    wlen = search + klen
    for i in range(s):
        work[i, : WCAP - wlen[i]] = 0.0

    bf, ff, cf, be, fe, ce, wmean = [
        np.asarray(v)
        for v in corr_search(
            work, tmpl, edge, klen, base, search, nfft=NFFT, scap=SCAP,
            row_tile=8,
        )
    ]
    wlen = (search + klen).astype(np.int64)
    wm_ref = np.array(
        [work[i, base[i] : base[i] + wlen[i]].astype(np.float64).mean()
         for i in range(s)]
    )
    assert np.allclose(wmean, wm_ref, atol=1e-5)

    for name, (t_in, b_k, f_k, c_k) in {
        "full": (tmpl, bf, ff, cf),
        "edge": (edge, be, fe, ce),
    }.items():
        b_r, f_r, c_r, scores = _f64_search(work, t_in, klen, base, search)
        for i in range(s):
            if b_k[i] != b_r[i]:
                # accept only genuine near-ties
                assert (
                    abs(scores[i][b_k[i]] - scores[i][b_r[i]]) < 1e-4
                ), (name, i, b_k[i], b_r[i])
            else:
                assert abs(f_k[i] - f_r[i]) < 5e-3, (name, i)
            assert abs(c_k[i] - c_r[i]) < 1e-4 + 1e-3 * abs(c_r[i]), (name, i)


def test_analyzer_kernel_matches_xla_path(rng):
    """Full OscilloscopeAnalyzer step: fused-kernel path (interpret) vs the
    XLA fallback over a locked sine — captures and lock state must agree."""
    import jax

    from openmeters_tpu.analyzers.oscilloscope import (
        OscilloscopeAnalyzer,
        OscilloscopeConfig,
    )

    rate, block = 8000.0, 256
    cfg = OscilloscopeConfig(sample_rate=rate, block_frames=block)
    ana = OscilloscopeAnalyzer(cfg)
    freqs = np.asarray([97.0, 211.0])
    n_steps = 18
    t = np.arange(n_steps * block)
    sigs = np.sin(
        2 * np.pi * freqs[:, None] * t[None, :] / rate
    ) + 0.1 * np.sin(2 * np.pi * 3.1 * freqs[:, None] * t[None, :] / rate)
    sigs = sigs.astype(np.float32)

    def run():
        carry = ana.init(2)
        outs = []
        for i in range(n_steps):
            blk = sigs[:, i * block : (i + 1) * block]
            stereo = np.stack([blk, blk], axis=-1)
            carry, snap = ana.step(carry, stereo)
            outs.append(snap)
        return outs

    outs_xla = run()
    env = os.environ
    old = env.get("OPENMETERS_PALLAS_INTERPRET")
    env["OPENMETERS_PALLAS_INTERPRET"] = "1"
    try:
        jax.clear_caches()
        outs_k = run()
    finally:
        if old is None:
            env.pop("OPENMETERS_PALLAS_INTERPRET", None)
        else:
            env["OPENMETERS_PALLAS_INTERPRET"] = old
        jax.clear_caches()

    a, b = outs_xla[-1], outs_k[-1]
    assert np.array_equal(np.asarray(a.locked), np.asarray(b.locked))
    assert np.allclose(np.asarray(a.period), np.asarray(b.period), atol=1e-3)
    assert np.array_equal(np.asarray(a.start), np.asarray(b.start))
    assert np.allclose(np.asarray(a.frac), np.asarray(b.frac), atol=5e-3)
    assert np.allclose(
        np.asarray(a.samples), np.asarray(b.samples), atol=1e-5
    )


def test_corr_search_silent_lanes(interpret_env):
    from openmeters_tpu.ops.pallas_osc_corr import corr_search

    s = 4
    work = np.zeros((s, WCAP), np.float32)
    tmpl = np.zeros((s, KCAP), np.float32)
    tmpl[:, :64] = 1.0
    klen = np.full((s,), 64, np.int32)
    search = np.full((s,), 32, np.int32)
    base = (WCAP - search - klen).astype(np.int32)
    bf, ff, cf, be, fe, ce, _wm = corr_search(
        work, tmpl, tmpl, klen, base, search, nfft=NFFT, scap=SCAP, row_tile=8
    )
    # all-zero scores -> earliest offset, zero frac, zero mean
    assert np.all(np.asarray(bf) == 0)
    assert np.all(np.asarray(ff) == 0.0)
    assert np.allclose(np.asarray(cf), 0.0, atol=1e-5)
