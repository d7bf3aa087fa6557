"""BS.1770 loudness analyzer parity tests (reference loudness/processor.rs tests)."""

import numpy as np
import pytest

import golden
from conftest import sine_wave
from openmeters_tpu.analyzers.loudness import (
    LoudnessAnalyzer,
    LoudnessConfig,
    window_length,
)
from openmeters_tpu.utils.channels import channel_fallback, channel_weights


def run_analyzer(analyzer, blocks, weights):
    carry = analyzer.init(blocks[0].shape[0])
    snap = None
    for blk in blocks:
        carry, snap = analyzer.step(carry, blk, weights)
    return snap


def make_blocks(mono, channels, b, total_channels=8):
    """Interleave a mono signal across `channels` channels; pad to [1,T,8]."""
    n = len(mono) // b * b
    x = np.zeros((1, n, total_channels), np.float32)
    for c in range(channels):
        x[0, :, c] = mono[:n]
    return [x[:, i * b : (i + 1) * b] for i in range(n // b)]


def golden_short_term(mono, channels, rate, n_samples, window_secs=3.0):
    """f64 sequential short-term LUFS over the first n_samples."""
    kw = golden.k_weight(mono[:n_samples], rate)
    w = window_length(rate, window_secs)
    ms = golden.trailing_means(kw * kw, [w], [n_samples])[0, 0]
    weights = channel_weights(channel_fallback(channels))[:channels]
    return golden.lufs(float(np.sum(weights)) * ms)


@pytest.mark.parametrize("rate", [44_100.0, 48_000.0, 96_000.0])
@pytest.mark.parametrize("channels", [2, 4, 6])
def test_short_term_matches_f64_golden(rate, channels):
    """Batched f32 pipeline vs sequential f64 BS.1770 within 0.001 LU
    (the reference's own bar against libebur128, processor.rs:391-396)."""
    b = 256
    mono = sine_wave(1000.0, rate, int(rate * 4.0), 0.5)
    blocks = make_blocks(mono, channels, b)
    n = len(blocks) * b

    cfg = LoudnessConfig(sample_rate=rate, block_frames=b)
    weights = channel_weights(channel_fallback(channels))[None, :]
    snap = run_analyzer(LoudnessAnalyzer(cfg), blocks, weights)

    expected = golden_short_term(mono, channels, rate, n)
    got = float(snap.short_term_lufs[0])
    assert abs(got - expected) < 0.001, f"{rate}/{channels}ch: {got} vs {expected}"


def test_known_sine_absolute_level():
    """A 997 Hz stereo sine at amplitude 0.5 is -6.03 LUFS (the K-weighting
    1 kHz gain cancels the -0.691 offset; stereo doubles power)."""
    rate, b = 48_000.0, 256
    mono = sine_wave(997.0, rate, int(rate * 4.0), 0.5)
    blocks = make_blocks(mono, 2, b)
    weights = channel_weights(channel_fallback(2))[None, :]
    snap = run_analyzer(LoudnessAnalyzer(LoudnessConfig()), blocks, weights)
    assert float(snap.short_term_lufs[0]) == pytest.approx(-6.02, abs=0.03)


def test_silence_respects_configured_floor():
    # reference processor.rs:339-350
    cfg = LoudnessConfig(floor_db=-140.0, block_frames=256)
    blocks = [np.zeros((1, 256, 8), np.float32)] * 8
    weights = channel_weights(channel_fallback(2))[None, :]
    snap = run_analyzer(LoudnessAnalyzer(cfg), blocks, weights)
    assert float(snap.short_term_lufs[0]) == -140.0
    assert np.all(np.asarray(snap.rms_fast_db) == -140.0)
    assert np.all(np.asarray(snap.true_peak_db) == -140.0)


def test_rms_tracks_amplitude():
    # reference processor.rs:353-364: 6 dB per amplitude doubling
    rate, b = 48_000.0, 256

    def measure(amp):
        mono = sine_wave(1000.0, rate, int(rate * 3.0), amp)
        blocks = make_blocks(mono, 1, b)
        weights = channel_weights(channel_fallback(1))[None, :]
        snap = run_analyzer(LoudnessAnalyzer(LoudnessConfig()), blocks, weights)
        return float(snap.rms_fast_db[0, 0])

    delta = measure(0.5) - measure(0.25)
    assert 5.8 < delta < 6.3


def test_true_peak_matches_sequential_golden():
    # reference processor.rs:427-454 pattern at 3 rates
    for rate in (48_000.0, 96_000.0, 192_000.0):
        b = 256
        mono = sine_wave(17_000.0, rate, int(rate * 0.01) // b * b + b, 0.9)
        blocks = make_blocks(mono, 1, b)
        n = len(blocks) * b
        weights = channel_weights(channel_fallback(1))[None, :]
        cfg = LoudnessConfig(sample_rate=rate, block_frames=b)
        carry = LoudnessAnalyzer(cfg).init(1)
        peak_db = -np.inf
        for blk in blocks:
            carry, snap = LoudnessAnalyzer(cfg).step(carry, blk, weights)
            peak_db = max(peak_db, float(snap.true_peak_db[0, 0]))
        ref_peak = golden.true_peak(mono[:n], rate)
        ref_db = 20.0 * np.log10(ref_peak)
        assert abs(peak_db - ref_db) < 1e-3, f"{rate}: {peak_db} vs {ref_db}"


def test_leading_silence_equals_eager_state():
    """Lazy-activation equivalence (reference processor.rs:401-417): a stream
    with 1 s of leading digital silence then a tone must match feeding the
    same total timeline eagerly — in the batched engine both are literally the
    same computation, so assert against the f64 golden over the full timeline."""
    rate, b = 48_000.0, 256
    sig = np.concatenate([np.zeros(int(rate), np.float32), sine_wave(1000.0, rate, int(rate * 0.5), 0.5)])
    blocks = make_blocks(sig, 2, b)
    n = len(blocks) * b
    weights = channel_weights(channel_fallback(2))[None, :]
    snap = run_analyzer(LoudnessAnalyzer(LoudnessConfig()), blocks, weights)
    expected = golden_short_term(sig, 2, rate, n)
    assert float(snap.short_term_lufs[0]) == pytest.approx(expected, abs=0.001)


def test_reset_mask_restarts_stream():
    rate, b = 48_000.0, 256
    mono = sine_wave(1000.0, rate, b * 20, 0.5)
    blocks = make_blocks(mono, 2, b)
    weights = channel_weights(channel_fallback(2))[None, :]
    ana = LoudnessAnalyzer(LoudnessConfig())
    carry = ana.init(1)
    for blk in blocks[:10]:
        carry, _ = ana.step(carry, blk, weights)
    # reset, then feed silence: windows must be empty again -> floor
    carry, snap = ana.step(
        carry, np.zeros_like(blocks[0]), weights, reset_mask=np.array([True])
    )
    assert float(snap.momentary_lufs[0]) == pytest.approx(
        LoudnessConfig().floor_db, abs=1e-4
    )


def test_multi_stream_independence(rng):
    """Streams in a batch must not leak into each other."""
    rate, b = 48_000.0, 256
    n = b * 16
    s0 = sine_wave(500.0, rate, n, 0.8)
    s1 = sine_wave(3000.0, rate, n, 0.1)
    batch = np.zeros((2, n, 8), np.float32)
    batch[0, :, 0] = batch[0, :, 1] = s0
    batch[1, :, 0] = batch[1, :, 1] = s1
    weights = np.tile(channel_weights(channel_fallback(2))[None], (2, 1))
    ana = LoudnessAnalyzer(LoudnessConfig())
    carry = ana.init(2)
    for i in range(16):
        carry, snap = ana.step(carry, batch[:, i * b : (i + 1) * b], weights)
    single = LoudnessAnalyzer(LoudnessConfig())
    c1 = single.init(1)
    for i in range(16):
        c1, snap1 = single.step(c1, batch[:1, i * b : (i + 1) * b], weights[:1])
    assert float(snap.momentary_lufs[0]) == pytest.approx(
        float(snap1.momentary_lufs[0]), abs=1e-5
    )
    assert float(snap.momentary_lufs[0]) > float(snap.momentary_lufs[1]) + 10
