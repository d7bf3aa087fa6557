"""L0 numerics parity tests (windows, dB, channels, weighting curves)."""

import math

import numpy as np
import pytest

from openmeters_tpu.utils import (
    BAND_SPLITS_HZ,
    Channel,
    ChannelPosition as P,
    FrequencyScale,
    MusicalNote,
    NoteInfo,
    WindowKind,
    a_weight_db,
    channel_fallback,
    channel_weights,
    db_to_power,
    fft_bin_normalization,
    k_weighting_ba,
    k_weighting_sos,
    normalize_positions,
    power_to_db,
    projection_vector,
    sanitize_sample_rate,
    stereo_matrix,
    window_coefficients,
)


def test_windows_are_periodic():
    # reference window.rs:116-122
    hann = window_coefficients(WindowKind.HANN, 8)
    assert hann[0] == 0.0
    assert abs(hann[4] - 1.0) < 1e-6
    assert abs(hann[7] - 0.1464465) < 1e-6


def test_window_edge_lengths():
    assert window_coefficients(WindowKind.HANN, 0).shape == (0,)
    assert np.all(window_coefficients(WindowKind.BLACKMAN, 1) == 1.0)
    assert np.all(window_coefficients(WindowKind.RECTANGULAR, 16) == 1.0)


def test_fft_bin_normalization_shape_and_edges():
    w = window_coefficients(WindowKind.HANN, 64)
    norms = fft_bin_normalization(w, 64)
    assert norms.shape == (33,)
    inv = 1.0 / np.sum(w)
    assert norms[0] == pytest.approx(inv * inv, rel=1e-6)
    assert norms[-1] == pytest.approx(inv * inv, rel=1e-6)
    assert norms[5] == pytest.approx(4 * inv * inv, rel=1e-6)
    # rectangular window of all zeros -> fallback 1/fft_size
    z = fft_bin_normalization(np.zeros(16, np.float32), 16)
    assert z[1] == pytest.approx(4.0 / 16.0**2, rel=1e-6)


def test_power_db_roundtrip():
    # reference level.rs test: deep levels preserved
    assert abs(float(power_to_db(1.0e-21, -300.0)) + 210.0) < 1e-3
    for db in [-100.0, -30.0, -3.0, 0.0]:
        assert float(power_to_db(db_to_power(db), -140.0)) == pytest.approx(db, abs=2e-4)
    assert float(power_to_db(0.0, -140.0)) == -140.0
    assert float(power_to_db(-1.0, -140.0)) == -140.0


def test_sanitize_sample_rate():
    assert sanitize_sample_rate(float("nan")) == 48_000.0
    assert sanitize_sample_rate(-1.0) == 48_000.0
    assert sanitize_sample_rate(1e9) == 768_000.0
    assert sanitize_sample_rate(44_100.0) == 44_100.0


def test_channel_fallback_layouts():
    # reference dsp.rs test channel_layouts_fill_unknown_and_duplicate...
    assert channel_fallback(1)[0] == P.MONO
    assert channel_fallback(4)[:4] == [P.FRONT_LEFT, P.FRONT_RIGHT, P.REAR_LEFT, P.REAR_RIGHT]
    assert channel_fallback(6)[:6] == [
        P.FRONT_LEFT, P.FRONT_RIGHT, P.FRONT_CENTER, P.LOW_FREQUENCY, P.REAR_LEFT, P.REAR_RIGHT,
    ]
    assert channel_fallback(5)[:5] == [
        P.FRONT_LEFT, P.FRONT_RIGHT, P.FRONT_CENTER, P.REAR_LEFT, P.REAR_RIGHT,
    ]


def test_normalize_positions_dedup_and_fill():
    got = normalize_positions(2, [P.FRONT_RIGHT, P.UNKNOWN] + [P.UNKNOWN] * 6)
    assert got[:2] == [P.FRONT_RIGHT, P.FRONT_LEFT]
    got = normalize_positions(3, [P.FRONT_LEFT, P.FRONT_LEFT, P.FRONT_RIGHT] + [P.UNKNOWN] * 5)
    assert got[0] == P.FRONT_LEFT
    assert got[2] == P.FRONT_RIGHT
    assert len({*got[:3]}) == 3


def test_stereo_matrix_folds_surround():
    # reference dsp.rs test stereo_matrix_folds_semantic_channels_and_ignores_lfe
    m = stereo_matrix(8, list(channel_fallback(8)))
    frame = np.array([1.0, 2.0, 3.0, 100.0, 4.0, 5.0, 6.0, 7.0], np.float32)
    mixed = frame @ m
    g = 1.0 / math.sqrt(2.0)
    assert mixed[0] == pytest.approx(1.0 + g * 13.0, rel=1e-6)
    assert mixed[1] == pytest.approx(2.0 + g * 15.0, rel=1e-6)

    mono = stereo_matrix(1, [P.MONO] + [P.UNKNOWN] * 7)
    assert list(mono[0]) == [1.0, 1.0]

    # all-unsupported: nominal L/R passthrough on first two channels
    m = stereo_matrix(8, [P.LOW_FREQUENCY, P.AUX0] + [P.UNKNOWN] * 6)
    assert m[0, 0] == 1.0 and m[1, 1] == 1.0


def test_channel_weights_bs1770():
    w = channel_weights(list(channel_fallback(6)))
    assert w[3] == 0.0  # LFE
    assert w[4] == pytest.approx(1.41)
    assert w[0] == 1.0


def test_projection_vectors():
    stereo = np.array([0.6, -0.2], np.float32)
    assert float(stereo @ projection_vector(Channel.MID)) == pytest.approx(0.2, abs=1e-7)
    assert float(stereo @ projection_vector(Channel.SIDE)) == pytest.approx(0.4, abs=1e-7)
    assert float(stereo @ projection_vector(Channel.NONE)) == 0.0


A_WEIGHT_REFERENCE = [
    # reference spectrum/processor.rs:654-678 (IEC 61672-1 table points)
    (1.0, -148.6), (5.0, -93.1), (31.5, -39.4), (63.0, -26.2), (100.0, -19.1),
    (200.0, -10.9), (500.0, -3.2), (1000.0, 0.0), (2000.0, 1.2), (4000.0, 1.0),
    (8000.0, -1.1), (16000.0, -6.6),
]


def test_a_weight_matches_iec_reference_points():
    for freq, expected in A_WEIGHT_REFERENCE:
        got = float(a_weight_db(freq))
        assert abs(got - expected) <= 0.15, f"{freq} Hz: {got} vs {expected}"
    assert a_weight_db(0.0) == -np.inf


def test_k_weighting_known_48k_coefficients():
    """The convolved 5-tap form at 48 kHz must match the published BS.1770
    filter response: +~4 dB high-shelf, unity near 1 kHz region after the
    -0.691 offset convention, strong rolloff below 38 Hz."""
    b, a = k_weighting_ba(48_000.0)
    assert b.shape == (5,) and a.shape == (5,)
    assert a[0] == pytest.approx(1.0)

    def response_db(f, fs=48_000.0):
        z = np.exp(2j * np.pi * f / fs)
        num = sum(b[i] * z ** (-i) for i in range(5))
        den = sum(a[i] * z ** (-i) for i in range(5))
        return 20.0 * np.log10(abs(num / den))

    # ITU-R BS.1770-5 checks: the pre-filter gains ~+0.691 dB at 1 kHz (the
    # LUFS offset constant compensates exactly this), ~+4 dB in the shelf.
    assert response_db(10_000.0) == pytest.approx(4.0, abs=0.1)
    assert response_db(1000.0) == pytest.approx(0.691, abs=0.05)
    assert response_db(25.0) < -7.0


def test_k_weighting_sos_equals_ba():
    for fs in (44_100.0, 48_000.0, 96_000.0, 192_000.0):
        sos = k_weighting_sos(fs)
        b, a = k_weighting_ba(fs)
        bb = np.convolve(sos[0, :3], sos[1, :3])
        aa = np.convolve(sos[0, 3:], sos[1, 3:])
        np.testing.assert_allclose(b, bb, rtol=1e-12)
        np.testing.assert_allclose(a, aa, rtol=1e-12)


def test_frequency_scales_roundtrip():
    for scale in FrequencyScale:
        for f in [20.0, 100.0, 1000.0, 12_000.0]:
            t = scale.pos_of(20.0, 20_000.0, f)
            back = float(scale.freq_at(20.0, 20_000.0, t))
            assert back == pytest.approx(f, rel=1e-3)


def test_musical_notes():
    note = MusicalNote.from_frequency(440.0)
    assert str(note) == "A4"
    assert note.to_frequency() == pytest.approx(440.0)
    info = NoteInfo.from_frequency(446.0)
    assert str(info.note) == "A4" and 20 <= info.cents <= 30
    assert MusicalNote.from_frequency(-1.0) is None
    assert MusicalNote(61).is_black  # C#4


def test_band_splits():
    assert BAND_SPLITS_HZ == (200.0, 2000.0)
