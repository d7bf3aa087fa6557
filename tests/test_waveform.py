"""Waveform tests (reference waveform/processor.rs tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import sine_wave
from openmeters_tpu.analyzers.waveform import (
    DERIVED_PROJ,
    WaveformAnalyzer,
    WaveformConfig,
)
from openmeters_tpu.utils.level import DB_FLOOR

RATE = 48_000.0


def collect(ana, stereo):
    """Feed [T, 2]; return list of (min, max, color, rms) per emitted column."""
    b = ana.config.block_frames
    n = stereo.shape[0] // b * b
    carry = ana.init(1)
    cols = []
    snap = None
    for i in range(n // b):
        carry, snap = ana.step(carry, stereo[None, i * b : (i + 1) * b])
        valid = np.asarray(snap.col_valid)[0]
        for k in range(len(valid)):
            if valid[k]:
                cols.append(
                    dict(
                        min=np.asarray(snap.col_min)[0, k],
                        max=np.asarray(snap.col_max)[0, k],
                        color=np.asarray(snap.col_color)[0, k],
                        rms=np.asarray(snap.col_rms_db)[0, k],
                    )
                )
    return cols, snap


def stereo_of(mono):
    return np.stack([mono, mono], axis=-1).astype(np.float32)


def test_derived_projection_matches_channel_semantics():
    stereo = np.array([0.25, -0.5], np.float32)
    got = stereo @ DERIVED_PROJ
    np.testing.assert_allclose(got, [0.25, -0.5, -0.125, 0.375])


def test_channel_projection_feeds_extrema():
    # reference processor.rs:439-463 (first case): scroll = rate/2 -> column
    # every 2 samples; [1,0] then [0,1] stereo frames.
    cfg = WaveformConfig(
        sample_rate=4.0, scroll_speed=2.0, analyze_bands=False, block_frames=4
    )
    ana = WaveformAnalyzer(cfg)
    stereo = np.array(
        [[1.0, 0.0], [0.0, 1.0], [0.0, 0.0], [0.0, 0.0]], np.float32
    )
    carry = ana.init(1)
    carry, snap = ana.step(carry, stereo[None])
    v = np.asarray(snap.col_valid)[0]
    assert v[0] and v[1]
    mins, maxs = np.asarray(snap.col_min)[0], np.asarray(snap.col_max)[0]
    # column 0 = frames 0,1: Mid = 0.5, 0.5 -> (0.5, 0.5)
    assert (mins[0, 2], maxs[0, 2]) == (0.5, 0.5)
    # Side = 0.5, -0.5 -> (-0.5, 0.5)
    assert (mins[0, 3], maxs[0, 3]) == (-0.5, 0.5)


def test_previous_sample_continuity():
    # reference processor.rs:466-473: [0,0,1,1] at column length 2 ->
    # column 1 includes the last sample of column 0 -> min 0, max 1
    cfg = WaveformConfig(
        sample_rate=4.0, scroll_speed=2.0, analyze_bands=False, block_frames=4
    )
    ana = WaveformAnalyzer(cfg)
    mono = np.array([0.0, 0.0, 1.0, 1.0], np.float32)
    carry = ana.init(1)
    carry, snap = ana.step(carry, stereo_of(mono)[None])
    mins, maxs = np.asarray(snap.col_min)[0], np.asarray(snap.col_max)[0]
    assert (mins[1, 0], maxs[1, 0]) == (0.0, 1.0)


def test_continuity_across_blocks():
    cfg = WaveformConfig(
        sample_rate=4.0, scroll_speed=2.0, analyze_bands=False, block_frames=2
    )
    ana = WaveformAnalyzer(cfg)
    carry = ana.init(1)
    carry, s1 = ana.step(carry, stereo_of(np.array([0.0, 0.0], np.float32))[None])
    carry, s2 = ana.step(carry, stereo_of(np.array([1.0, 1.0], np.float32))[None])
    mins, maxs = np.asarray(s2.col_min)[0], np.asarray(s2.col_max)[0]
    assert np.asarray(s2.col_valid)[0, 0]
    assert (mins[0, 0], maxs[0, 0]) == (0.0, 1.0)


def test_nonfinite_sanitized_and_breaks_continuity():
    # reference processor.rs:476-494
    cfg = WaveformConfig(
        sample_rate=4.0, scroll_speed=4.0, analyze_bands=False, block_frames=4
    )
    ana = WaveformAnalyzer(cfg)
    mono = np.array([0.0, np.nan, np.inf, 1.0], np.float32)
    carry = ana.init(1)
    carry, snap = ana.step(carry, stereo_of(mono)[None])
    mins, maxs = np.asarray(snap.col_min)[0], np.asarray(snap.col_max)[0]
    v = np.asarray(snap.col_valid)[0]
    assert v[:4].all()
    assert np.isfinite(mins).all() and np.isfinite(maxs).all()
    # column 3 = sample 3 only (continuity broken by inf at sample 2)
    assert (mins[3, 0], maxs[3, 0]) == (1.0, 1.0)
    # column 2 (the inf sample) has no finite member -> (0, 0)
    assert (mins[2, 0], maxs[2, 0]) == (0.0, 0.0)


def test_fractional_timing_matches_average_speed():
    # reference processor.rs:555-571: 333 cols/s at 1 kHz rate over 10k samples
    cfg = WaveformConfig(
        sample_rate=1000.0, scroll_speed=333.0, analyze_bands=False, block_frames=100
    )
    ana = WaveformAnalyzer(cfg)
    carry = ana.init(1)
    total = 0
    for _ in range(100):
        carry, snap = ana.step(carry, np.zeros((1, 100, 2), np.float32))
        total += int(np.asarray(snap.col_valid)[0].sum())
    assert abs(total - 3330) <= 1
    # integer phase: drift is exactly zero
    assert int(np.asarray(carry["phase_r"])[0]) == (10_000 * ana._pq[0]) % ana._pq[1]


def test_bands_follow_sine_frequency():
    # reference processor.rs:511-526
    def latest_bands(freq):
        cfg = WaveformConfig(scroll_speed=200.0, block_frames=256)
        ana = WaveformAnalyzer(cfg)
        cols, _ = collect(ana, stereo_of(sine_wave(freq, RATE, 48_000, 0.8)))
        return cols[-1]["color"][0]  # channel L

    low, mid, high = latest_bands(80.0), latest_bands(500.0), latest_bands(5_000.0)
    assert low[0] > low[1] and low[0] > low[2], low
    assert mid[1] > mid[0] and mid[1] > mid[2], mid
    assert high[2] > high[0] and high[2] > high[1], high


def test_fast_rms_reacts_before_slow():
    # reference processor.rs:529-538
    cfg = WaveformConfig(scroll_speed=100.0, track_history=True, block_frames=256)
    ana = WaveformAnalyzer(cfg)
    mono = np.concatenate(
        [np.zeros(48_000, np.float32), np.ones(2048 + 256, np.float32)]
    )
    cols, _ = collect(ana, stereo_of(mono))
    rms = cols[-1]["rms"]  # [2, 4, 3]
    assert rms[0, 0, 0] > rms[1, 0, 0]


def test_rms_returns_to_floor_after_silence():
    # reference processor.rs:541-552
    cfg = WaveformConfig(scroll_speed=300.0, track_history=True, block_frames=256)
    ana = WaveformAnalyzer(cfg)
    sig = np.concatenate(
        [sine_wave(80.0, RATE, 48_000, 1.0), np.zeros(48_000, np.float32)]
    )
    cols, _ = collect(ana, stereo_of(sig))
    assert np.all(cols[-1]["rms"] == DB_FLOOR)


def test_disabled_band_analysis_emits_zero_band_data():
    # reference processor.rs:497-508
    cfg = WaveformConfig(analyze_bands=False, block_frames=256)
    ana = WaveformAnalyzer(cfg)
    cols, _ = collect(ana, stereo_of(np.ones(1024, np.float32)))
    assert np.all(cols[-1]["color"] == 0.0)
    assert np.all(cols[-1]["rms"] == DB_FLOOR)


def test_preview_progress_and_pending_column():
    cfg = WaveformConfig(
        sample_rate=4.0, scroll_speed=1.0, analyze_bands=False, block_frames=4
    )
    # column every 4 samples; 2-sample block leaves progress 0.5
    ana = WaveformAnalyzer(
        WaveformConfig(sample_rate=4.0, scroll_speed=2.0, analyze_bands=False, block_frames=3)
    )
    carry = ana.init(1)
    carry, snap = ana.step(
        carry, stereo_of(np.array([0.5, -0.25, 0.125], np.float32))[None]
    )
    # 3 samples * 0.5 col/sample = 1 emission + progress 0.5
    assert int(np.asarray(snap.col_valid)[0].sum()) == 1
    assert float(snap.progress[0]) == pytest.approx(0.5)
    # pending column holds sample 2 plus continuity sample 1
    assert float(snap.preview_min[0, 0]) == pytest.approx(-0.25)
    assert float(snap.preview_max[0, 0]) == pytest.approx(0.125)


def test_band_window_means_match_bruteforce_with_reset():
    """The block-ring trailing-window decomposition is exact: preview color
    and fast/slow RMS equal a brute-force trailing mean over the filtered
    band samples, through warmup, steady state, ring wraparound, and a
    per-stream mid-run reset (which the ring handles by masking, not
    zeroing)."""
    from openmeters_tpu.analyzers.waveform import BAND_COLOR_GAINS
    from openmeters_tpu.ops.iir import three_band_init, three_band_scan
    from openmeters_tpu.utils.level import power_to_db

    b = 32
    cfg = WaveformConfig(
        sample_rate=1000.0, scroll_speed=90.0, track_history=True, block_frames=b
    )
    ana = WaveformAnalyzer(cfg)
    wc, ws = ana.color_window, ana.slow_window
    assert ws > 2 * b and wc > b  # exercise whole-block + pair-suffix paths

    rng = np.random.default_rng(7)
    n_steps = 2 * ana.ring_blocks + 5  # wrap the ring twice
    reset_at = ana.ring_blocks + 2
    blocks = rng.standard_normal((n_steps, 2, b, 2)).astype(np.float32) * 0.5

    carry = ana.init(2)
    # brute-force mirror: filtered band history per stream (reset stream 1)
    tb_ref = three_band_init((2, 2), 1)
    hist = [np.zeros((0, 4, 3), np.float32), np.zeros((0, 4, 3), np.float32)]

    for i in range(n_steps):
        reset = np.array([False, i == reset_at])
        carry, snap = ana.step(carry, blocks[i], reset_mask=jnp.asarray(reset))

        if reset[1]:
            tb_ref = tb_ref.at[..., 1, :].set(0.0)
            hist[1] = np.zeros((0, 4, 3), np.float32)
        lr = jnp.transpose(jnp.asarray(blocks[i]), (1, 0, 2))
        fbands, tb_ref = three_band_scan(
            lr, tb_ref, cfg.sample_rate, cascade_n=1, cascade_high=False
        )
        fb = np.asarray(fbands)  # [B, 3, S, 2]
        fl, fr = fb[..., 0], fb[..., 1]
        db = np.stack([fl, fr, (fl + fr) * 0.5, (fl - fr) * 0.5], -1)
        db = np.transpose(db, (2, 0, 3, 1))  # [S, B, 4, 3]
        for s_i in range(2):
            hist[s_i] = np.concatenate([hist[s_i], db[s_i]], axis=0)

        for s_i in range(2):
            def trailing_mean(vals, w):
                tail = vals[-w:]
                return tail.sum(axis=0) / min(max(len(vals), 1), w)

            cv = np.abs(hist[s_i]) * BAND_COLOR_GAINS
            pw = hist[s_i] ** 2
            np.testing.assert_allclose(
                np.asarray(snap.preview_color)[s_i], trailing_mean(cv, wc),
                rtol=2e-4, atol=2e-6,
            )
            want_fast = power_to_db(
                jnp.asarray(np.maximum(trailing_mean(pw, wc), 0.0)), DB_FLOOR
            )
            want_slow = power_to_db(
                jnp.asarray(np.maximum(trailing_mean(pw, ws), 0.0)), DB_FLOOR
            )
            got = np.asarray(snap.preview_rms_db)[s_i]
            np.testing.assert_allclose(got[0], np.asarray(want_fast), atol=2e-3)
            np.testing.assert_allclose(got[1], np.asarray(want_slow), atol=2e-3)
