"""Software renderer tests (render.py vs the reference's shader semantics)."""

import numpy as np
import pytest

from openmeters_tpu.render import (
    Canvas,
    compose_rgba,
    decode_png,
    encode_png,
    render_loudness_frame,
    render_oscilloscope_frame,
    render_spectrogram_classic,
    render_spectrogram_reassigned,
    render_spectrum_frame,
    render_stereometer_frame,
    render_waveform_frame,
    shade_db,
)
from openmeters_tpu.views import HEAT_RAMP


def test_png_roundtrip():
    rng = np.random.default_rng(7)
    for ch in (3, 4):
        img = rng.integers(0, 256, size=(13, 17, ch), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)


def test_shade_db_matches_palette_endpoints():
    # shade_db (spectrogram.wgsl:205-213): floor -> stop 0, 0 dB -> stop 4,
    # premultiplied output
    lo = shade_db(np.float32(-140.0), -140.0, HEAT_RAMP)
    hi = shade_db(np.float32(0.0), -140.0, HEAT_RAMP)
    np.testing.assert_allclose(lo, [0, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(hi, [1, 1, 1, 1], atol=1e-6)
    mid = shade_db(np.float32(-70.0), -140.0, HEAT_RAMP)
    assert 0.0 < mid[3] <= 1.0 and np.all(mid[:3] <= mid[3] + 1e-6)


def test_canvas_quad_and_compositing():
    cv = Canvas(8, 8, background=(0, 0, 0, 1))
    cv.gradient_quad(2, 2, 6, 6, (1, 0, 0, 1))
    img = cv.to_srgb_u8()
    assert img[4, 4, 0] == 255 and img[4, 4, 1] == 0
    assert img[0, 0, 0] == 0  # untouched background
    # translucent overlay composites source-over
    cv.gradient_quad(2, 2, 6, 6, (0, 0, 1, 0.5))
    img2 = cv.to_srgb_u8()
    assert 100 < img2[4, 4, 0] < 160 and 100 < img2[4, 4, 2] < 160


def test_canvas_aa_line_coverage():
    cv = Canvas(32, 32)
    # on a pixel center the 1px line covers one row fully...
    cv.polyline([(4, 16.5), (28, 16.5)], (1, 1, 1, 1), width=1.0)
    assert cv.buf[16, 16, 0] > 0.9
    assert cv.buf[10, 16, 0] == 0.0
    # ...on an integer coordinate it straddles two rows at half coverage
    cv2 = Canvas(32, 32)
    cv2.polyline([(4, 16), (28, 16)], (1, 1, 1, 1), width=1.0)
    assert abs(cv2.buf[15, 16, 0] - 0.5) < 0.1
    assert abs(cv2.buf[16, 16, 0] - 0.5) < 0.1


def test_classic_spectrogram_maps_tone_to_bin_row():
    rate, fft = 48_000.0, 2048
    bins = fft // 2 + 1
    db = np.full((8, bins), -140.0, np.float32)
    tone_bin = 100  # 2343.75 Hz
    db[:, tone_bin] = 0.0
    rgba = render_spectrogram_classic(
        db, sample_rate=rate, fft_size=fft, width=64, height=256
    )
    # the brightest pixel row should sit at the tone's log-scale position
    from openmeters_tpu.utils.frequency import FrequencyScale

    lum = rgba[..., :3].sum(axis=(1, 2))
    row = int(np.argmax(lum))
    f = tone_bin * rate / fft
    pos = float(FrequencyScale.LOGARITHMIC.pos_of(0.0, rate / 2, f))
    expect = int((1.0 - pos) * 256)
    assert abs(row - expect) <= 2
    assert rgba.shape == (256, 64, 4)


def test_classic_spectrogram_tilt_lifts_highs():
    rate, fft = 48_000.0, 2048
    bins = fft // 2 + 1
    db = np.full((4, bins), -60.0, np.float32)
    flat = render_spectrogram_classic(
        db, sample_rate=rate, fft_size=fft, width=32, height=128
    )
    tilted = render_spectrogram_classic(
        db, sample_rate=rate, fft_size=fft, width=32, height=128, tilt_db=3.0
    )
    # 3 dB/oct tilt brightens rows above 1 kHz, dims rows below
    lum_f = flat[..., :3].sum(-1).mean(axis=1)
    lum_t = tilted[..., :3].sum(-1).mean(axis=1)
    assert lum_t[10] > lum_f[10]  # top rows = high frequencies
    assert lum_t[-10] < lum_f[-10]


def test_reassigned_render_power_conservation_and_position():
    # one 1 kHz splat: lands at the right row, resolve maps power->dB->color
    rgba = render_spectrogram_reassigned(
        np.array([1000.0], np.float32),
        np.array([0.0], np.float32),
        np.array([1.0], np.float32),
        np.array([True]),
        width=16,
        height=64,
        freq_lo_hz=20.0,
        freq_hi_hz=20_000.0,
    )
    ys, xs = np.nonzero(rgba[..., 3] > 0)
    assert len(ys) == 1
    from openmeters_tpu.utils.frequency import FrequencyScale

    pos = float(FrequencyScale.LOGARITHMIC.pos_of(20.0, 20_000.0, 1000.0))
    assert abs((63 - ys[0]) - int(pos * 64)) <= 1
    # 0 dB power -> top palette stop (white, premultiplied)
    np.testing.assert_allclose(rgba[ys[0], xs[0]], [1, 1, 1, 1], atol=1e-5)


def test_spectrum_frame_draws_line_and_fill():
    cv = Canvas(64, 48)
    pts = np.stack(
        [np.linspace(0, 1, 32), np.full(32, 0.5, np.float32)], axis=-1
    ).astype(np.float32)
    render_spectrum_frame(cv, pts, np.ones(32, bool))
    img = cv.buf  # default color (0.3, 0.9, 1.0, 1.0): blue is the bright one
    mid = img[23:25, 32, 2].max()
    below = img[35, 32, 2]
    assert mid > 0.5  # the line
    assert 0.0 < below < 0.3  # translucent fill toward the baseline
    assert img[5, 32, 2] == 0.0  # above the line untouched


def test_stereometer_frame_compression_stays_inside():
    cv = Canvas(64, 64)
    rng = np.random.default_rng(3)
    xy = rng.normal(0, 0.8, size=(128, 2)).astype(np.float32)
    render_stereometer_frame(cv, xy, np.ones(128, bool))
    assert cv.buf[..., 3].max() > 0.1  # something drawn
    # compression clamps inside the unit box -> nothing outside the square
    # (plus the dot radius + AA margin)
    sz = 32
    border = 3
    outside = cv.buf[..., 0].copy()
    outside[border:-border, border:-border] = 0.0
    assert outside.max() <= 0.25


def test_waveform_frame_column_heights():
    cv = Canvas(8, 64)
    cols = [
        {"min": np.float32(-1.0), "max": np.float32(1.0), "color": (1, 0, 0)},
        {"min": np.float32(-0.1), "max": np.float32(0.1), "color": (0, 1, 0)},
    ]
    render_waveform_frame(cv, cols)
    img = cv.to_srgb_u8()
    # newest (green, small) at x=7, tall red column at x=6
    assert img[32, 7, 1] > 100 and img[32, 7, 0] < 50
    assert img[32, 6, 0] > 100
    assert img[5, 7, 1] < 50  # short column doesn't reach the top
    assert img[5, 6, 0] > 100  # tall red column does


def test_loudness_frame_bar_height_monotone():
    imgs = []
    for db in (-40.0, -12.0):
        cv = Canvas(240, 120)
        render_loudness_frame(
            cv,
            momentary_lufs=db,
            short_term_lufs=db,
            integrated_lufs=db,
            true_peak_db=db + 2,
        )
        imgs.append(cv.buf[..., 2].sum())  # bars are blue-dominant
    assert imgs[1] > imgs[0] * 1.5  # louder -> taller bars


def test_oscilloscope_frame_from_snapshot_namedtuple():
    from openmeters_tpu.analyzers.oscilloscope import OscilloscopeSnapshot

    n = 400
    wave = np.sin(np.linspace(0, 6 * np.pi, n)).astype(np.float32)
    snap = OscilloscopeSnapshot(
        samples=np.stack([wave, np.zeros_like(wave)])[None],
        trace_valid=np.array([[True, False]]),
        span=np.array([[n - 2.0, 0.0]], np.float32),
        start=np.zeros((1, 2), np.int32),
        frac=np.zeros((1, 2), np.float32),
        period=np.zeros((1, 2), np.float32),
        locked=np.zeros((1, 2), bool),
    )
    cv = Canvas(128, 96)
    render_oscilloscope_frame(cv, snap)
    assert cv.buf[..., 2].max() > 0.5
    # trace occupies the vertical band allowed by padding+amplitude scale
    rows = np.nonzero(cv.buf[..., 2].max(axis=1) > 0.1)[0]
    assert rows.min() >= 4 and rows.max() <= 92


def test_compose_rgba_over_background():
    rgba = np.zeros((2, 2, 4), np.float32)
    rgba[0, 0] = [0.5, 0.0, 0.0, 0.5]  # premultiplied half-red
    out = compose_rgba(rgba, background=(0.0, 0.0, 1.0, 1.0))
    assert out[0, 0, 0] == 128 and out[0, 0, 2] == 128
    assert out[1, 1, 2] == 255  # pure background elsewhere


def test_render_snapshots_end_to_end(tmp_path):
    """analyze() -> render_snapshots -> valid PNGs for every active visual."""
    jax = pytest.importorskip("jax")
    del jax
    from openmeters_tpu.analyzers.spectrogram import SpectrogramConfig
    from openmeters_tpu.api import analyze
    from openmeters_tpu.engine import EngineConfig
    from openmeters_tpu.render import render_series

    rate = 8_000.0
    t = np.arange(int(rate * 1.0)) / rate
    tone = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    audio = np.stack([tone, tone], -1)
    cfg = EngineConfig.at_rate(
        rate,
        spectrogram=SpectrogramConfig(fft_size=256, hop_size=64,
                                      use_reassignment=False),
    )
    snaps = analyze(audio, rate, cfg)
    paths = render_series(snaps, cfg, tmp_path, width=120, height=80)
    names = {p.rsplit("/", 1)[-1] for p in paths}
    assert {"spectrogram.png", "spectrum.png", "oscilloscope.png",
            "stereometer.png", "waveform.png", "loudness.png"} <= names
    for p in paths:
        img = decode_png(open(p, "rb").read())
        assert img.ndim == 3 and img.shape[2] == 3
        assert img.max() > 0  # something was drawn


def test_correlation_trail_semantics_and_meter():
    from openmeters_tpu.render import render_correlation_meter
    from openmeters_tpu.views import (
        CORR_TRAIL_LEN,
        CorrelationTrail,
        correlation_trail_alpha,
    )

    # FixedTrail::push_front (stereometer/render.rs:63-76): newest first,
    # capacity-bounded
    tr = CorrelationTrail()
    for i in range(CORR_TRAIL_LEN + 5):
        tr.push_front(i / 100.0)
    assert len(tr.values) == CORR_TRAIL_LEN
    assert tr.values[0] == np.float32((CORR_TRAIL_LEN + 4) / 100.0)
    assert tr.values[-1] == np.float32(5 / 100.0)

    # fade curve (render.rs:42-44): (1 - (age+1)/len)^2.4, strictly decaying
    ops = tr.segment_opacities()
    assert ops.shape == (CORR_TRAIL_LEN - 1,)
    expect = (1.0 - (np.arange(CORR_TRAIL_LEN - 1) + 1.0) / CORR_TRAIL_LEN) ** 2.4
    np.testing.assert_allclose(ops, expect, rtol=1e-6)
    assert np.all(np.diff(ops) < 0)

    # alpha column: rows covered by newer segments win (max), marker at v[0]
    tr2 = CorrelationTrail()
    tr2.push_front(-1.0)
    tr2.push_front(1.0)
    alpha, marker_y = correlation_trail_alpha(tr2, 100, edge=6.0)
    assert marker_y == 6.0  # val_y(+1) = top inset
    assert alpha.max() > 0.0
    assert alpha[50] > 0.0  # the segment spans the full strip

    cv = Canvas(32, 100)
    render_correlation_meter(cv, tr2, x0=24.0, x1=30.0)
    assert cv.buf[:, 24:30, :3].max() > 0.1  # strip drawn
    assert cv.buf[:, :20, :3].max() == 0.0  # only the strip columns drawn
    # current value is +1 (top) -> marker row is positive-colored (green ch)
    assert cv.buf[6, 25, 1] > cv.buf[6, 25, 0]
