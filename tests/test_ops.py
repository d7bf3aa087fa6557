"""L1 ops tests: IIR scans, windowed means, true peak, framing."""

import numpy as np
import jax.numpy as jnp
import pytest

import golden
from openmeters_tpu.ops import (
    BlockWindowedMeans,
    FilterKind,
    FrameBuffer,
    TruePeakKernel,
    biquad_cascade_scan,
    biquad_rbj,
    iir_df2t_scan,
    three_band_init,
    three_band_scan,
)
from openmeters_tpu.utils.weighting import k_weighting_ba, k_weighting_sos


def test_biquad_scan_matches_sequential_golden(rng):
    coeffs = tuple(biquad_rbj(FilterKind.LOW_PASS, 48_000.0, 1_000.0).tolist())
    x = rng.standard_normal(4096).astype(np.float32)
    ref = golden.biquad_df2t(x, coeffs)
    got, _ = biquad_cascade_scan(x[:, None], jnp.zeros((1, 2, 1)), (coeffs,))
    np.testing.assert_allclose(np.asarray(got)[:, 0], ref, atol=2e-5)


def test_biquad_nonfinite_resets_state():
    coeffs = tuple(biquad_rbj(FilterKind.HIGH_PASS, 48_000.0, 200.0).tolist())
    x = np.array([1.0, np.inf, 0.25, 0.5], np.float32)
    got, _ = biquad_cascade_scan(x[:, None], jnp.zeros((1, 2, 1)), (coeffs,))
    got = np.asarray(got)[:, 0]
    assert np.all(np.isfinite(got))
    # after the reset, output restarts from zero state
    fresh, _ = biquad_cascade_scan(
        np.array([0.25, 0.5], np.float32)[:, None], jnp.zeros((1, 2, 1)), (coeffs,)
    )
    np.testing.assert_allclose(got[2:], np.asarray(fresh)[:, 0], atol=1e-7)


def test_biquad_state_carries_across_blocks(rng):
    coeffs = tuple(biquad_rbj(FilterKind.LOW_PASS, 48_000.0, 500.0).tolist())
    x = rng.standard_normal(1024).astype(np.float32)
    whole, _ = biquad_cascade_scan(x[:, None], jnp.zeros((1, 2, 1)), (coeffs,))
    state = jnp.zeros((1, 2, 1))
    parts = []
    for chunk in np.split(x, 8):
        y, state = biquad_cascade_scan(chunk[:, None], state, (coeffs,))
        parts.append(np.asarray(y))
    np.testing.assert_allclose(
        np.concatenate(parts)[:, 0], np.asarray(whole)[:, 0], atol=1e-7
    )


def test_kweighting_sos_scan_matches_f64_5tap_golden(rng):
    """Cascaded-SOS f32 K-weighting must track the f64 5-tap reference
    closely enough for <=0.01 LU loudness parity."""
    for fs in (44_100.0, 48_000.0, 96_000.0):
        n = int(fs * 0.5)
        t = np.arange(n) / fs
        x = (0.5 * np.sin(2 * np.pi * 997.0 * t) + 0.1 * np.sin(2 * np.pi * 40.0 * t)).astype(
            np.float32
        )
        ref = golden.k_weight(x, fs)
        sos = k_weighting_sos(fs)
        coeffs = tuple(
            (float(s[0]), float(s[1]), float(s[2]), float(s[4]), float(s[5])) for s in sos
        )
        got, _ = biquad_cascade_scan(
            x[:, None], jnp.zeros((2, 2, 1)), coeffs, finite_reset=False
        )
        got = np.asarray(got)[:, 0]
        # mean-square (loudness) relative error -> dB error
        ms_ref = np.mean(ref[n // 4 :] ** 2)
        ms_got = np.mean(got[n // 4 :].astype(np.float64) ** 2)
        assert abs(10 * np.log10(ms_got / ms_ref)) < 1e-3


def test_iir_df2t_matches_golden(rng):
    b, a = k_weighting_ba(48_000.0)
    x = rng.standard_normal(2048).astype(np.float32)
    ref = golden.k_weight(x, 48_000.0)
    got, _ = iir_df2t_scan(
        x[:, None], jnp.zeros((4, 1)), tuple(b.tolist()), tuple(a[1:].tolist())
    )
    ms_ref = np.mean(ref**2)
    ms_got = np.mean(np.asarray(got)[:, 0].astype(np.float64) ** 2)
    assert abs(10 * np.log10(ms_got / ms_ref)) < 2e-3


def test_three_band_sums_to_input_at_crossover_complement(rng):
    """LR-style crossover bands should roughly reconstruct band energy:
    a low sine lands in band 0, mid in band 1, high in band 2."""
    fs = 48_000.0
    for freq, expect_band in [(50.0, 0), (700.0, 1), (8_000.0, 2)]:
        n = int(fs * 0.25)
        x = np.sin(2 * np.pi * freq * np.arange(n) / fs).astype(np.float32)
        bands, _ = three_band_scan(
            x[:, None], three_band_init((1,), 2), fs, cascade_n=2, cascade_high=True
        )
        energy = np.mean(np.asarray(bands)[n // 2 :, :, 0] ** 2, axis=0)
        assert int(np.argmax(energy)) == expect_band, (freq, energy)


def test_three_band_single_biquad_matches_sequential(rng):
    fs = 48_000.0
    x = rng.standard_normal(512).astype(np.float32)
    bands, _ = three_band_scan(
        x[:, None], three_band_init((1,), 1), fs, cascade_n=1, cascade_high=False
    )
    # golden: low = LP_lo(x); al = HP_lo(x); mid = LP_hi(al); high = HP_hi(x)
    lp_lo = golden.biquad_df2t(x, biquad_rbj(FilterKind.LOW_PASS, fs, 200.0))
    hp_lo = golden.biquad_df2t(x, biquad_rbj(FilterKind.HIGH_PASS, fs, 200.0))
    mid = golden.biquad_df2t(hp_lo, biquad_rbj(FilterKind.LOW_PASS, fs, 2_000.0))
    high = golden.biquad_df2t(x, biquad_rbj(FilterKind.HIGH_PASS, fs, 2_000.0))
    got = np.asarray(bands)[:, :, 0]
    # f32 scan vs f64 golden; reference's own filter-equivalence test allows
    # 5e-5 (waveform/processor.rs:435)
    np.testing.assert_allclose(got[:, 0], lp_lo, atol=5e-5)
    np.testing.assert_allclose(got[:, 1], mid, atol=5e-5)
    np.testing.assert_allclose(got[:, 2], high, atol=5e-5)


def test_windowed_means_match_prefix_golden(rng):
    b = 64
    windows = (256, 100, 64, 17)
    wm = BlockWindowedMeans(block_frames=b, window_lengths=windows)
    x = rng.standard_normal(b * 12).astype(np.float32)
    carry = wm.init((1,))
    got = []
    for i in range(12):
        carry = wm.push_block(carry, x[i * b : (i + 1) * b][:, None])
        got.append(np.asarray(wm.means(carry))[:, 0])
    positions = [(i + 1) * b for i in range(12)]
    ref = golden.trailing_means(x, windows, positions)
    np.testing.assert_allclose(np.stack(got, axis=1), ref, atol=1e-4)


def test_windowed_means_sanitize_nonfinite():
    wm = BlockWindowedMeans(block_frames=4, window_lengths=(8,))
    carry = wm.init((1,))
    carry = wm.push_block(
        carry, np.array([np.nan, np.inf, -np.inf, 4.0], np.float32)[:, None]
    )
    assert float(wm.means(carry)[0, 0]) == pytest.approx(1.0)  # 4/4 samples


def test_windowed_means_survive_large_value_expiry():
    """Reference dsp.rs:638-656: small values must be preserved after a large
    value expires from the window.  The reference needs f64 Kahan sums because
    it incrementally adds/subtracts; the block-ring recomputes every window
    sum fresh, so an expired value cannot poison later means at all."""
    wm = BlockWindowedMeans(block_frames=2, window_lengths=(2,))
    carry = wm.init((1,))
    for pair in ([1.0e8, 2.0], [1.0e-8, 1.0e-8]):
        carry = wm.push_block(carry, np.array(pair, np.float32)[:, None])
    assert float(wm.means(carry)[0, 0]) == pytest.approx(1.0e-8, rel=1e-6)

    # mixed-sign cancellation within f32 exact-integer range is exact too
    wm = BlockWindowedMeans(block_frames=2, window_lengths=(4,))
    carry = wm.init((1,))
    for pair in ([1.0, 1.0e6], [1.0, -1.0e6]):
        carry = wm.push_block(carry, np.array(pair, np.float32)[:, None])
    assert float(wm.means(carry)[0, 0]) == pytest.approx(0.5)


def test_windowed_means_reset_mask():
    wm = BlockWindowedMeans(block_frames=4, window_lengths=(16,))
    carry = wm.init((2,))
    big = np.full((4, 2), 100.0, np.float32)
    for _ in range(4):
        carry = wm.push_block(carry, big)
    small = np.ones((4, 2), np.float32)
    carry = wm.push_block(carry, small, reset_mask=np.array([True, False]))
    m = np.asarray(wm.means(carry))[0]
    assert m[0] == pytest.approx(1.0)  # lane 0 reset: mean over 4 fresh samples
    assert m[1] == pytest.approx((100.0 * 12 + 4) / 16)


def test_true_peak_matches_sequential_golden():
    for fs in (48_000.0, 96_000.0, 192_000.0):
        n = int(fs * 0.01)
        x = (0.9 * np.sin(2 * np.pi * 17_000.0 * np.arange(n) / fs)).astype(np.float32)
        ref = golden.true_peak(x, fs)
        tp = TruePeakKernel(fs)
        carry = tp.init((1,))
        peak = 0.0
        for chunk in np.array_split(x, 5):
            carry, p = tp.process_block(carry, chunk[:, None])
            peak = max(peak, float(p[0]))
        assert peak == pytest.approx(ref, abs=1e-6)
        # true peak of a high sine near Nyquist/2.8 must exceed sample peak at 48k
        if fs == 48_000.0:
            assert peak > float(np.max(np.abs(x))) + 1e-3


def test_frame_buffer_matches_offline_framing(rng):
    fb = FrameBuffer(read_len=32, hop=8, block=16)
    x = rng.standard_normal(16 * 10).astype(np.float32)
    carry = fb.init(1)
    got = []
    for i in range(10):
        carry, frames, valid = fb.push(carry, x[i * 16 : (i + 1) * 16][None, :])
        for k in range(fb.cols_cap):
            if bool(valid[0, k]):
                got.append(np.asarray(frames)[0, k])
    ref = golden.stft_frames(x, 32, 8)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r.astype(np.float32), atol=0)


def test_frame_buffer_hop_larger_than_window_partition_independent(rng):
    # reference spectrogram/processor.rs:746-771 analogue
    fb = FrameBuffer(read_len=8, hop=16, block=8)
    x = rng.standard_normal(8 * 6).astype(np.float32)
    carry = fb.init(1)
    got = []
    for i in range(6):
        carry, frames, valid = fb.push(carry, x[i * 8 : (i + 1) * 8][None, :])
        for k in range(fb.cols_cap):
            if bool(valid[0, k]):
                got.append(np.asarray(frames)[0, k])
    ref = golden.stft_frames(x, 8, 16)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r.astype(np.float32))


def test_frame_buffer_reset_restarts_timeline(rng):
    fb = FrameBuffer(read_len=16, hop=4, block=8)
    x = rng.standard_normal(8 * 6).astype(np.float32)
    carry = fb.init(1)
    for i in range(3):
        carry, _, _ = fb.push(carry, x[i * 8 : (i + 1) * 8][None, :])
    carry, frames, valid = fb.push(
        carry, x[24:32][None, :], reset_mask=np.array([True])
    )
    assert not np.any(np.asarray(valid))  # only 8 post-reset samples < 16
    carry, frames, valid = fb.push(carry, x[32:40][None, :])
    # the first valid post-reset window contains only post-reset samples,
    # landing on the global hop grid (values identical to a fresh timeline)
    valid = np.asarray(valid)[0]
    assert valid.any()
    k = int(np.nonzero(valid)[0][0])
    np.testing.assert_allclose(np.asarray(frames)[0, k], x[24:40])


def test_lifted_iir_matches_sequential_scan(rng):
    """Lifted block state-space cascade == per-sample DF2T scan (f32)."""
    from openmeters_tpu.ops.iir import lifted_iir_scan
    from openmeters_tpu.utils.weighting import k_weighting_sos

    sos = k_weighting_sos(48_000.0)
    coeffs = tuple(
        (float(s[0]), float(s[1]), float(s[2]), float(s[4]), float(s[5])) for s in sos
    )
    x = rng.standard_normal(235).astype(np.float32)[:, None]  # non-multiple of 32
    seq, seq_state = biquad_cascade_scan(
        x, jnp.zeros((2, 2, 1)), coeffs, finite_reset=False
    )
    lift, lift_state = lifted_iir_scan(x, jnp.zeros((4, 1)), coeffs, lift=32)
    np.testing.assert_allclose(np.asarray(lift), np.asarray(seq), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(lift_state).ravel(), np.asarray(seq_state).ravel(), atol=1e-4
    )


def test_windowed_means_incremental_soak_no_drift(rng):
    """The incremental KBN sums must track the exact masked re-reduction
    through hundreds of ring wraps, including a mid-run reset and a large
    level step (the drift classes the refresh/compensation guard against)."""
    b = 32
    windows = (b * 7, b * 3 + 5)
    wm = BlockWindowedMeans(block_frames=b, window_lengths=windows)
    carry = wm.init((2,))
    level = 1.0
    history = [1.0]  # |block total| history for the error bound
    for i in range(400):
        if i == 150:
            level = 1.0e4  # loud passage
        if i == 250:
            level = 1.0e-4  # near-silence after loud content
        x = (rng.standard_normal((b, 2)) * level).astype(np.float32)
        reset = np.array([False, i == 200])
        carry = wm.push_block(carry, x, reset_mask=reset)
        got = np.asarray(wm.means(carry))
        exact = np.asarray(
            wm._exact_sums(carry["totals"], carry["head"], carry["blocks"])
        )
        # compensated incremental sums are exact relative to the largest
        # magnitude that passed through them since the last refresh (plus
        # whatever is still inside a window); the 32-push refresh restores
        # exactness relative to the ring contents
        history.append(float(np.abs(x).sum()))
        span = wm.refresh_steps + wm.ring_blocks
        recent_peak = max(history[-span:])
        for w_idx, w in enumerate(windows):
            q, r = w // b, w % b
            suffix = np.asarray(carry["suffix"])[
                (int(carry["head"]) - 1 - q) % wm.ring_blocks, w_idx
            ]
            blocks = np.asarray(carry["blocks"])
            total = exact[w_idx] + np.where(blocks > q, suffix, 0.0)
            count = np.clip(blocks.astype(np.float64) * b, 1, w)
            ref = total / count
            bound = (
                2e-6 * recent_peak / float(count.min())
                + 2e-6 * np.abs(ref).max()
                + 1e-30
            )
            err = np.abs(got[w_idx] - ref).max()
            assert err <= bound, (
                f"step {i} window {w}: err {err:.3e} > bound {bound:.3e}"
            )


def test_sliding_stft_negative_offset_reads_wrap_not_clip(rng):
    """Regression: the sliding-DFT col-0 delta reads the hop that just LEFT
    the window (``fb.slice(info, -hop, hop)``).  When the window base wraps
    through ring slot 0 (every ``cap/block`` steps), the read start goes
    negative and must wrap into the mirrored half — clipping to 0 silently
    substituted the window *head*, corrupting the slide until the next
    exact re-anchor.  hop == block == fft/4 makes base hit 0 periodically;
    refresh_steps=32 leaves the corruption visible for 28+ hops."""
    import jax

    from openmeters_tpu.ops.sliding_stft import SlidingSTFT
    from openmeters_tpu.utils.windows import WindowKind

    fft, hop, block = 1024, 256, 256
    steps = 40
    x = rng.standard_normal((1, steps * block)).astype(np.float32)

    def run(refresh_steps):
        st = SlidingSTFT(fft, hop, block, WindowKind.HANN,
                         refresh_steps=refresh_steps)
        fb = st.frames
        carry = (fb.init(1), st.init(1))

        @jax.jit
        def step(carry, blk):
            finfo, sd = carry
            finfo, info = fb.advance(finfo, blk)
            sd, power = st.step(sd, info)
            return (finfo, sd), power

        outs = []
        for i in range(steps):
            carry, p = step(carry, jnp.asarray(x[:, i * block:(i + 1) * block]))
            outs.append(np.asarray(p))
        return np.concatenate(outs, axis=1)

    exact = run(1)      # re-anchors every hop: per-column exact FFT
    slid = run(32)      # 31 consecutive slides between anchors
    scale = float(np.max(exact))
    np.testing.assert_allclose(slid, exact, atol=1e-3 * scale)


def test_three_band_lifted_matches_sequential(rng):
    """The MIMO lifted (block state-space) crossover is the same LTI system
    as the sequential scan — parity to f32 rounding, state carried across
    blocks, both ThreeBand topologies (waveform single-biquad, stereometer
    LR4 cascade_high)."""
    from openmeters_tpu.ops.iir import (
        three_band_init,
        three_band_lifted,
        three_band_scan,
    )

    for cn, ch in ((1, False), (2, True)):
        x1 = (rng.standard_normal((256, 5)) * 0.5).astype(np.float32)
        x2 = (rng.standard_normal((256, 5)) * 0.5).astype(np.float32)
        st = three_band_init((5,), cn)
        b1, s_seq = three_band_scan(x1, st, 48_000.0, cascade_n=cn, cascade_high=ch)
        b2, s_seq = three_band_scan(x2, s_seq, 48_000.0, cascade_n=cn, cascade_high=ch)
        l1, s_lift = three_band_lifted(x1, st, 48_000.0, cascade_n=cn, cascade_high=ch)
        l2, s_lift = three_band_lifted(x2, s_lift, 48_000.0, cascade_n=cn, cascade_high=ch)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(b1), atol=1e-4)
        np.testing.assert_allclose(np.asarray(l2), np.asarray(b2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(s_lift), np.asarray(s_seq), atol=1e-4)

    # non-finite input: sanitized to 0, output always finite
    x = np.zeros((64, 1), np.float32)
    x[10] = np.nan
    x[20] = np.inf
    from openmeters_tpu.ops.iir import three_band_init, three_band_lifted

    bands, st2 = three_band_lifted(x, three_band_init((1,), 1), 48_000.0)
    assert np.all(np.isfinite(np.asarray(bands)))
    assert np.all(np.isfinite(np.asarray(st2)))
