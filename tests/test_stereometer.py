"""Stereometer tests (reference stereometer/processor.rs tests)."""

import numpy as np
import pytest

from conftest import sine_wave
from openmeters_tpu.analyzers.stereometer import (
    StereometerAnalyzer,
    StereometerConfig,
    ema_alpha,
)


def run(ana, stereo):
    b = ana.config.block_frames
    n = stereo.shape[0] // b * b
    carry = ana.init(1)
    snap = None
    for i in range(n // b):
        carry, snap = ana.step(carry, stereo[None, i * b : (i + 1) * b])
    return snap


def golden_corr(pairs, alpha):
    """Sequential EMA correlator (reference processor.rs:38-56)."""
    cross = lp = rp = 0.0
    for l, r in pairs:
        cross += alpha * (l * r - cross)
        lp += alpha * (l * l - lp)
        rp += alpha * (r * r - rp)
    denom = np.sqrt(lp * rp)
    if denom <= 1e-12:
        return 0.0
    return float(np.clip(cross / denom, -1, 1))


def test_correlator_matches_sequential_golden(rng):
    cfg = StereometerConfig(block_frames=64)
    ana = StereometerAnalyzer(cfg)
    alpha = ema_alpha(cfg.sample_rate, cfg.correlation_window)
    x = rng.standard_normal((256, 2)).astype(np.float32) * 0.5
    x[:, 1] = 0.7 * x[:, 0] + 0.3 * x[:, 1]
    carry = ana.init(1)
    for i in range(4):
        carry, snap = ana.step(carry, x[None, i * 64 : (i + 1) * 64])
    want = golden_corr(x, alpha)
    got = float(snap.correlations[0, 0])
    assert got == pytest.approx(want, abs=1e-4)


def test_correlation_sign_conventions():
    # reference processor.rs:247-256 analogues on real streams
    n = 48_000 // 4
    mono = sine_wave(440.0, 48_000.0, n, 0.5)
    ana = StereometerAnalyzer(StereometerConfig())

    same = np.stack([mono, mono], axis=-1)
    assert float(run(ana, same).correlations[0, 0]) == pytest.approx(1.0, abs=1e-3)

    inverted = np.stack([mono, -mono], axis=-1)
    assert float(run(ana, inverted).correlations[0, 0]) == pytest.approx(-1.0, abs=1e-3)

    scaled = np.stack([mono, 0.25 * mono], axis=-1)
    assert float(run(ana, scaled).correlations[0, 0]) == pytest.approx(1.0, abs=1e-3)


def test_band_correlations_require_analyze_bands():
    n = 48_000 // 8
    mono = sine_wave(100.0, 48_000.0, n, 0.5)
    stereo = np.stack([mono, mono], axis=-1)
    off = run(StereometerAnalyzer(StereometerConfig(analyze_bands=False)), stereo)
    assert np.all(np.asarray(off.correlations[0, 1:]) == 0.0)
    on = run(StereometerAnalyzer(StereometerConfig(analyze_bands=True)), stereo)
    # 100 Hz tone lives in the low band; its correlation must be ~1
    assert float(on.correlations[0, 1]) == pytest.approx(1.0, abs=0.01)


def test_snapshot_points_decimate_last_segment():
    # reference processor.rs:231-244: 4 Hz rate, 1 s segment, target 2
    cfg = StereometerConfig(
        sample_rate=4.0, segment_duration=1.0, target_sample_count=2, block_frames=4
    )
    ana = StereometerAnalyzer(cfg)
    stereo = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]], np.float32)
    carry = ana.init(1)
    carry, snap = ana.step(carry, stereo[None])
    assert bool(snap.points_valid[0])
    np.testing.assert_allclose(
        np.asarray(snap.points)[0, 0], [[1.0, 2.0], [5.0, 6.0]]
    )


def test_band_points_scaled_by_display_gain():
    n = 48_000 // 8
    mono = sine_wave(100.0, 48_000.0, n, 0.5)
    stereo = np.stack([mono, mono], axis=-1)
    snap = run(
        StereometerAnalyzer(StereometerConfig(emit_band_points=True)), stereo
    )
    pts = np.asarray(snap.points)
    # low band should carry most of the energy, scaled by 0.8
    full_amp = np.max(np.abs(pts[0, 0]))
    low_amp = np.max(np.abs(pts[0, 1]))
    assert low_amp < full_amp  # 0.8 gain + filter
    assert low_amp > 0.25


def test_points_invalid_before_enough_history():
    cfg = StereometerConfig(block_frames=256)  # segment 960 frames
    ana = StereometerAnalyzer(cfg)
    carry = ana.init(1)
    x = np.zeros((1, 256, 2), np.float32)
    carry, snap = ana.step(carry, x)
    assert not bool(snap.points_valid[0])
    for _ in range(3):
        carry, snap = ana.step(carry, x)
    assert bool(snap.points_valid[0])


def test_reset_clears_correlator_and_history():
    cfg = StereometerConfig(block_frames=256)
    ana = StereometerAnalyzer(cfg)
    n = 48_000 // 4
    mono = sine_wave(440.0, 48_000.0, n, 0.5)
    stereo = np.stack([mono, mono], axis=-1)
    carry = ana.init(1)
    for i in range(n // 256):
        carry, snap = ana.step(carry, stereo[None, i * 256 : (i + 1) * 256])
    carry, snap = ana.step(
        carry, np.zeros((1, 256, 2), np.float32), reset_mask=np.array([True])
    )
    assert not bool(snap.points_valid[0])
    assert float(snap.correlations[0, 0]) == 0.0
