"""Spectrogram tests: classic STFT parity and reassignment physics
(reference spectrogram/processor.rs tests)."""

import numpy as np
import pytest

import golden
from conftest import sine_wave
from openmeters_tpu.analyzers.spectrogram import (
    ANALYSIS_FLOOR_POWER,
    SpectrogramAnalyzer,
    SpectrogramConfig,
    hilbert_len_for,
    history_columns,
    pack_classic_db,
    unpack_classic_db,
)
from openmeters_tpu.utils.level import DB_FLOOR
from openmeters_tpu.utils.windows import (
    WindowKind,
    fft_bin_normalization,
    window_coefficients,
)


def run(analyzer, signal, n_streams=1):
    """Feed a mono signal through in block_frames steps; collect valid cols."""
    b = analyzer.config.block_frames
    n = len(signal) // b * b
    carry = analyzer.init(n_streams)
    cols = []
    for i in range(n // b):
        blk = np.tile(signal[i * b : (i + 1) * b][None, :], (n_streams, 1))
        carry, out = analyzer.step(carry, blk)
        valid = np.asarray(out.valid)
        for k in range(valid.shape[1]):
            if valid[0, k]:
                cols.append(
                    {f: np.asarray(getattr(out, f))[:, k] for f in out._fields if f != "valid"}
                )
    return cols


def classic_golden_columns(signal, cfg: SpectrogramConfig):
    """Offline f64 classic STFT columns (dc-removed, windowed, zero-padded)."""
    w = window_coefficients(cfg.window, cfg.fft_size).astype(np.float64)
    pfft = cfg.fft_size * cfg.zero_padding_factor
    norm = fft_bin_normalization(
        window_coefficients(cfg.window, cfg.fft_size), pfft
    ).astype(np.float64)
    out = []
    for frame in golden.stft_frames(signal, cfg.fft_size, cfg.hop_size):
        x = (frame - frame.mean()) * w
        spec = np.fft.rfft(x, n=pfft)
        power = (np.abs(spec) ** 2) * norm
        db = np.where(power > 0, np.maximum(10 * np.log10(np.maximum(power, 1e-300)), DB_FLOOR), DB_FLOOR)
        out.append(db)
    return out


def test_pack_classic_rounds_to_nearest_code():
    # reference processor.rs:663-668
    step = 156.0 / 65535.0
    assert int(pack_classic_db(np.float32(-144.0 + step * 1234.49))) == 1234
    assert int(pack_classic_db(np.float32(-144.0 + step * 1234.51))) == 1235
    assert int(pack_classic_db(np.float32(-500.0))) == 0
    assert int(pack_classic_db(np.float32(100.0))) == 65535


def test_classic_detects_sine_peak_bin():
    # reference processor.rs:710-724
    cfg = SpectrogramConfig(
        fft_size=1024, hop_size=512, use_reassignment=False, block_frames=256
    )
    ana = SpectrogramAnalyzer(cfg)
    freq = 200.0 * cfg.sample_rate / cfg.fft_size
    cols = run(ana, sine_wave(freq, cfg.sample_rate, 2048))
    codes = cols[-1]["codes"][0]
    assert codes.shape == (cfg.fft_size // 2 + 1,)
    idx = int(np.argmax(codes))
    assert idx == 200
    assert codes[idx] >= int(pack_classic_db(np.float32(-0.01)))


def test_classic_matches_offline_golden(rng):
    cfg = SpectrogramConfig(
        fft_size=256, hop_size=64, use_reassignment=False, block_frames=128
    )
    signal = rng.standard_normal(2048).astype(np.float32) * 0.5
    cols = run(SpectrogramAnalyzer(cfg), signal)
    ref = classic_golden_columns(signal, cfg)
    assert len(cols) == len(ref)
    for got, want in zip(cols, ref):
        got_db = unpack_classic_db(got["codes"][0])
        # compare above the u16 quantization floor; near-floor bins may
        # differ by f32 fft noise
        mask = want > -120.0
        assert np.max(np.abs(got_db[mask] - want[mask])) < 0.02


def test_classic_block_partition_independence(rng):
    """Chunked feeding must equal offline framing even with hop > window
    (reference processor.rs:746-771)."""
    cfg = SpectrogramConfig(
        sample_rate=32.0,
        fft_size=8,
        hop_size=16,
        window=WindowKind.RECTANGULAR,
        use_reassignment=False,
        block_frames=8,
    )
    signal = np.sin(np.arange(48, dtype=np.float32) * 0.73)
    cols = run(SpectrogramAnalyzer(cfg), signal)
    ref = classic_golden_columns(signal, cfg)
    assert len(cols) == len(ref)
    for got, want in zip(cols, ref):
        got_db = unpack_classic_db(got["codes"][0])
        mask = want > -120
        assert np.max(np.abs(got_db[mask] - want[mask])) < 0.02


def test_silent_input_emits_floor_columns():
    # reference processor.rs:808-825
    cfg = SpectrogramConfig(fft_size=64, hop_size=16, use_reassignment=False, block_frames=64)
    cols = run(SpectrogramAnalyzer(cfg), np.zeros(192, np.float32))
    floor_code = int(pack_classic_db(np.float32(DB_FLOOR)))
    assert len(cols) > 0
    for col in cols:
        assert np.all(col["codes"][0] == floor_code)

    cfg_r = SpectrogramConfig(fft_size=64, hop_size=16, use_reassignment=True, block_frames=64)
    cols = run(SpectrogramAnalyzer(cfg_r), np.zeros(256, np.float32))
    for col in cols:
        assert not np.any(col["point_valid"][0])


def test_reassignment_places_peak_frequency_time_power():
    # reference processor.rs:828-860
    cfg = SpectrogramConfig(
        fft_size=2048,
        hop_size=512,
        use_reassignment=True,
        zero_padding_factor=4,
        block_frames=512,
    )
    ana = SpectrogramAnalyzer(cfg)
    latency = (hilbert_len_for(cfg.fft_size) - cfg.fft_size) // 2
    expected_time = -latency / cfg.hop_size

    for bin_f in [3.4, 10.25, 50.25, 200.75, 800.4]:
        freq = bin_f * cfg.sample_rate / cfg.fft_size
        cols = run(ana, sine_wave(freq, cfg.sample_rate, 4096))
        col = cols[-1]
        pv = col["point_valid"][0]
        powers = np.where(pv, col["power"][0], 0.0)
        peak = int(np.argmax(powers))
        assert pv[peak]
        assert abs(col["freq_hz"][0][peak] - freq) < 2.0, (bin_f, col["freq_hz"][0][peak])
        assert abs(col["time_offset"][0][peak] - expected_time) < 0.05
        total_power = float(np.sum(powers)) * ana.power_scale
        assert abs(total_power - 1.0) < 0.01, (bin_f, total_power)


def test_reassignment_resolves_low_fractional_bin():
    # reference processor.rs:863-874
    cfg = SpectrogramConfig(
        fft_size=2048, hop_size=512, use_reassignment=True,
        zero_padding_factor=4, block_frames=512,
    )
    freq = 1.37 * cfg.sample_rate / cfg.fft_size
    cols = run(SpectrogramAnalyzer(cfg), sine_wave(freq, cfg.sample_rate, 4096))
    col = cols[-1]
    powers = np.where(col["point_valid"][0], col["power"][0], 0.0)
    peak = int(np.argmax(powers))
    assert abs(col["freq_hz"][0][peak] - freq) < 2.0


def test_reassignment_removes_dc_without_points():
    # reference processor.rs:877-888
    cfg = SpectrogramConfig(fft_size=64, hop_size=16, use_reassignment=True, block_frames=64)
    cols = run(SpectrogramAnalyzer(cfg), np.full(256, 0.25, np.float32))
    assert len(cols) > 0
    for col in cols:
        assert not np.any(col["point_valid"][0])


def test_reassignment_localizes_centered_impulse():
    # reference processor.rs:891-908
    cfg = SpectrogramConfig(fft_size=256, hop_size=32, use_reassignment=True, block_frames=256)
    read_len = hilbert_len_for(cfg.fft_size)
    center = (read_len - cfg.fft_size) // 2
    position = cfg.fft_size // 2
    samples = np.zeros(read_len, np.float32)
    samples[center + position] = 1.0
    cols = run(SpectrogramAnalyzer(cfg), samples)
    col = cols[-1]
    expected = (position - (cfg.fft_size - 1) * 0.5 - center) / cfg.hop_size
    pv = col["point_valid"][0]
    assert np.any(pv)
    err = np.abs(col["time_offset"][0][pv] - expected)
    assert float(np.max(err)) < 1e-4


def test_history_columns_budget():
    # reference processor.rs:774-792: classic u16 codes pack 2-per-u32
    bins = (16_384 * 32) // 2 + 1
    stride = ((bins + 1) // 2) * 4
    assert history_columns(False, bins, 8192) == (128 * 1024 * 1024) // stride
    assert history_columns(False, 100, 0) == 1
    assert history_columns(True, 10, 10_000) == 8192


def test_multi_stream_columns_independent():
    cfg = SpectrogramConfig(fft_size=256, hop_size=128, use_reassignment=False, block_frames=256)
    ana = SpectrogramAnalyzer(cfg)
    f1, f2 = 1500.0, 6000.0
    s1 = sine_wave(f1, cfg.sample_rate, 1024)
    s2 = sine_wave(f2, cfg.sample_rate, 1024)
    carry = ana.init(2)
    last = None
    for i in range(4):
        blk = np.stack([s1[i * 256 : (i + 1) * 256], s2[i * 256 : (i + 1) * 256]])
        carry, out = ana.step(carry, blk)
        if np.asarray(out.valid).any():
            last = out
    codes = np.asarray(last.codes)
    k = np.asarray(last.valid)[0].nonzero()[0][-1]
    bin_hz = cfg.sample_rate / cfg.fft_size
    assert abs(np.argmax(codes[0, k]) * bin_hz - f1) <= bin_hz
    assert abs(np.argmax(codes[1, k]) * bin_hz - f2) <= bin_hz


def test_sliding_dft_drift_over_long_stream(rng):
    """Long-run soak: the sliding-DFT path must track the offline golden
    within one u16 code (0.0024 dB) across many re-anchor cycles."""
    cfg = SpectrogramConfig(
        fft_size=256, hop_size=64, use_reassignment=False, block_frames=256
    )
    ana = SpectrogramAnalyzer(cfg)
    assert ana.use_sliding
    t = np.arange(48_000, dtype=np.float64)
    signal = (
        0.5 * np.sin(2 * np.pi * 997.0 * t / 48_000.0)
        + 0.2 * np.sin(2 * np.pi * 147.2 * t / 48_000.0)
        + 0.05 * rng.standard_normal(len(t))
    ).astype(np.float32)
    signal = signal[: len(signal) // cfg.block_frames * cfg.block_frames]
    cols = run(ana, signal)
    ref = classic_golden_columns(signal, cfg)
    assert len(cols) == len(ref)
    worst = 0.0
    for got, want in zip(cols, ref):
        got_db = unpack_classic_db(got["codes"][0])
        mask = want > -110.0
        worst = max(worst, float(np.max(np.abs(got_db[mask] - want[mask]))))
    assert worst < 0.02, f"worst dB error {worst}"
