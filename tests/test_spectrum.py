"""Spectrum analyzer tests (reference spectrum/processor.rs tests)."""

import numpy as np
import pytest

import golden
from conftest import sine_wave
from openmeters_tpu.analyzers.spectrum import (
    AveragingMode,
    SpectrumAnalyzer,
    SpectrumConfig,
)
from openmeters_tpu.utils.channels import Channel
from openmeters_tpu.utils.windows import (
    WindowKind,
    fft_bin_normalization,
    window_coefficients,
)


def run(analyzer, stereo, n_steps=None):
    """Feed [T, 2] stereo in block-sized steps; return last snapshot."""
    b = analyzer.config.block_frames
    n = len(stereo) // b * b
    carry = analyzer.init(1)
    snap = None
    for i in range(n // b):
        carry, out = analyzer.step(carry, stereo[None, i * b : (i + 1) * b])
        snap = out
    return snap


def mono_to_stereo(x):
    return np.stack([x, x], axis=-1).astype(np.float32)


def test_raw_spectrum_matches_offline_golden(rng):
    cfg = SpectrumConfig(
        fft_size=256, hop_size=64, block_frames=128, source=Channel.MID,
    )
    ana = SpectrumAnalyzer(cfg)
    x = (rng.standard_normal(1024) * 0.5).astype(np.float32)
    snap = run(ana, mono_to_stereo(x))
    frames = golden.stft_frames(x, 256, 64)
    w = window_coefficients(cfg.window, 256).astype(np.float64)
    norm = fft_bin_normalization(window_coefficients(cfg.window, 256), 256)
    frame = frames[-1]
    spec = np.fft.rfft((frame - frame.mean()) * w)
    power = np.abs(spec) ** 2 * norm
    want = np.where(power > 0, np.maximum(10 * np.log10(np.maximum(power, 1e-300)), cfg.floor_db), cfg.floor_db)
    got = np.asarray(snap.raw_db)[0, 0]
    mask = want > -90.0
    assert np.max(np.abs(got[mask] - want[mask])) < 0.02


def test_weighted_output_adds_a_weighting():
    cfg = SpectrumConfig(fft_size=1024, hop_size=256, block_frames=256)
    ana = SpectrumAnalyzer(cfg)
    x = sine_wave(1000.0, cfg.sample_rate, 2048, 0.5)
    snap = run(ana, mono_to_stereo(x))
    raw = np.asarray(snap.raw_db)[0, 0]
    weighted = np.asarray(snap.weighted_db)[0, 0]
    k = int(np.argmax(raw))
    aw = float(ana.a_weighting[k])
    assert weighted[k] == pytest.approx(raw[k] + aw, abs=1e-3)


def test_peak_hold_decays_per_hop():
    # reference processor.rs:539-563: 8 Hz rate, fft 8, hop 8, 24 dB/s decay,
    # one sine window then one silent window -> held peak decayed by 24 dB.
    cfg = SpectrumConfig(
        sample_rate=8.0, fft_size=8, hop_size=8, block_frames=8,
        window=WindowKind.RECTANGULAR,
        averaging=AveragingMode.PEAK_HOLD, peak_decay_db_per_s=24.0,
        floor_db=-100.0, source=Channel.MID,
    )
    ana = SpectrumAnalyzer(cfg)
    sig = np.concatenate([sine_wave(1.0, 8.0, 8, 1.0), np.zeros(8, np.float32)])
    snap = run(ana, mono_to_stereo(sig))
    held = float(np.asarray(snap.raw_db)[0, 0, 1])
    assert -24.1 < held < -23.9, held


def test_exponential_averaging_seeds_then_smooths():
    cfg = SpectrumConfig(
        sample_rate=8.0, fft_size=8, hop_size=8, block_frames=8,
        window=WindowKind.RECTANGULAR,
        averaging=AveragingMode.EXPONENTIAL, exp_factor=0.5,
        source=Channel.MID,
    )
    ana = SpectrumAnalyzer(cfg)
    carry = ana.init(1)
    tone = mono_to_stereo(sine_wave(1.0, 8.0, 8, 1.0))
    silence = mono_to_stereo(np.zeros(8, np.float32))
    carry, s1 = ana.step(carry, tone[None, :8])  # seeds avg = p
    p1 = float(np.asarray(s1.raw_db)[0, 0, 1])
    carry, s2 = ana.step(carry, silence[None, :8])  # avg = 0.5 * p
    p2 = float(np.asarray(s2.raw_db)[0, 0, 1])
    assert p2 == pytest.approx(p1 - 3.01, abs=0.05)


def test_averaged_power_zeroed_below_state_floor():
    # reference processor.rs:614-627
    cfg = SpectrumConfig(
        sample_rate=8.0, fft_size=8, hop_size=8, block_frames=8,
        window=WindowKind.RECTANGULAR,
        averaging=AveragingMode.EXPONENTIAL, exp_factor=0.95,
        floor_db=-100.0, source=Channel.MID,
    )
    ana = SpectrumAnalyzer(cfg)
    carry = ana.init(1)
    quiet = mono_to_stereo((sine_wave(1.0, 8.0, 8, 1.0) * 10 ** (-101 / 20.0)))
    carry, snap = ana.step(carry, quiet[None])
    assert np.all(np.asarray(carry["smoothed"])[0] == 0.0) or np.all(
        np.asarray(snap.raw_db)[0, 0] == cfg.floor_db
    )


def test_dual_source_projection():
    # reference processor.rs:481-493: Left and Side projections
    cfg = SpectrumConfig(
        fft_size=8, hop_size=8, block_frames=8, sample_rate=8.0,
        window=WindowKind.RECTANGULAR,
        source=Channel.LEFT, secondary_source=Channel.SIDE,
    )
    ana = SpectrumAnalyzer(cfg)
    proj = np.asarray(cfg.default_projections())
    stereo = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    got = stereo @ proj.T  # [2 frames, 2 traces]
    np.testing.assert_allclose(got[:, 0], [1.0, 0.0])  # left trace
    np.testing.assert_allclose(got[:, 1], [0.5, -0.5])  # side trace


def test_block_partition_independence(rng):
    # reference processor.rs:584-611: hop 16 > fft 8
    cfg = SpectrumConfig(
        sample_rate=32.0, fft_size=8, hop_size=16, block_frames=8,
        window=WindowKind.RECTANGULAR, source=Channel.LEFT,
    )
    ana = SpectrumAnalyzer(cfg)
    x = np.sin(np.arange(48, dtype=np.float32) * 0.73)
    snap = run(ana, mono_to_stereo(x))
    frames = golden.stft_frames(x, 8, 16)
    frame = frames[-1]
    w = np.ones(8)
    spec = np.fft.rfft((frame - frame.mean()) * w)
    norm = fft_bin_normalization(np.ones(8, np.float32), 8)
    power = np.abs(spec) ** 2 * norm
    want = np.where(power > 0, np.maximum(10 * np.log10(np.maximum(power, 1e-300)), cfg.floor_db), cfg.floor_db)
    got = np.asarray(snap.raw_db)[0, 0]
    mask = want > -90
    assert np.max(np.abs(got[mask] - want[mask])) < 0.02


def test_updated_flag_tracks_hops():
    cfg = SpectrumConfig(fft_size=1024, hop_size=1024, block_frames=256)
    ana = SpectrumAnalyzer(cfg)
    carry = ana.init(1)
    x = mono_to_stereo(sine_wave(440.0, 48_000.0, 2048, 0.5))
    flags = []
    for i in range(8):
        carry, snap = ana.step(carry, x[None, i * 256 : (i + 1) * 256])
        flags.append(bool(snap.updated[0]))
    # window fills after 4 blocks (1024), then every 4 blocks
    assert flags == [False, False, False, True, False, False, False, True]
