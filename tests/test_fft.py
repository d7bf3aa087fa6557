"""MXU matmul-FFT correctness vs numpy float64 FFT."""

import numpy as np
import pytest

from openmeters_tpu.ops.fft import fft_mxu, ifft_mxu, rfft_mxu


@pytest.mark.parametrize("n", [16, 64, 256, 2048, 4096])
def test_rfft_matches_numpy(rng, n):
    x = rng.standard_normal((4, n)).astype(np.float32)
    got = np.asarray(rfft_mxu(x))
    want = np.fft.rfft(x.astype(np.float64))
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 2e-6


def test_rfft_zero_pad(rng):
    x = rng.standard_normal((3, 100)).astype(np.float32)
    got = np.asarray(rfft_mxu(x, n=256))
    want = np.fft.rfft(x.astype(np.float64), n=256)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-6


def test_complex_fft_and_inverse_roundtrip(rng):
    n = 1024
    re = rng.standard_normal((2, n)).astype(np.float32)
    im = rng.standard_normal((2, n)).astype(np.float32)
    fr, fi = fft_mxu(re, im)
    want = np.fft.fft(re.astype(np.float64) + 1j * im.astype(np.float64))
    scale = np.max(np.abs(want))
    assert np.max(np.abs((np.asarray(fr) + 1j * np.asarray(fi)) - want)) / scale < 2e-6

    br, bi = ifft_mxu(fr, fi)
    assert np.max(np.abs(np.asarray(br) - re)) < 1e-5
    assert np.max(np.abs(np.asarray(bi) - im)) < 1e-5


def test_spectral_error_at_f32_floor(rng):
    """Spectral parity bar (BASELINE.md <=-100 dB vs the f32 Rust CPU path):
    the MXU FFT must match an exact f64 FFT to within the float32
    *representational* floor — i.e. be as accurate as any f32 pipeline
    (including the reference's rustfft f32 path) can be.  Measured on a test
    tone the error is ~-89 dB, within 2x of rounding the exact spectrum to
    f32 (~-89.4 dB); XLA's builtin f32 fft sits at only -65 dB."""
    n = 2048
    t = np.arange(n)
    x = (
        0.7 * np.sin(2 * np.pi * 441.3 * t / 48_000.0)
        + 0.1 * np.sin(2 * np.pi * 7000.0 * t / 48_000.0)
    ).astype(np.float32)[None]
    got_p = np.abs(np.asarray(rfft_mxu(x))) ** 2
    want_p = np.abs(np.fft.rfft(x.astype(np.float64))) ** 2
    floor_p = np.abs(np.fft.rfft(x[0]).astype(np.complex64)) ** 2  # f32-rounded exact
    err = np.max(np.abs(got_p - want_p)) / np.max(want_p)
    floor = np.max(np.abs(floor_p - want_p)) / np.max(want_p)
    assert err < 4.0 * floor, f"{10*np.log10(err):.1f} dB vs floor {10*np.log10(floor):.1f} dB"


def test_irfft_roundtrip(rng):
    from openmeters_tpu.ops.fft import irfft_mxu

    n = 2048
    x = rng.standard_normal((3, n)).astype(np.float32)
    spec = np.fft.rfft(x.astype(np.float64))
    got = np.asarray(
        irfft_mxu(
            np.real(spec).astype(np.float32), np.imag(spec).astype(np.float32), n
        )
    )
    assert np.max(np.abs(got - x)) < 1e-5


def test_spectral_parity_vs_f32_reference_path():
    """BASELINE bar: "outputs matching the Rust CPU path ... <= -100 dB
    spectral error".  The Rust path is f32 end-to-end (DC-removed windowed
    frame -> realfft f32); its semantics are reproduced here with scipy's
    f32 rfft (complex64 transform).  Spectral error is the standard
    amplitude metric: max |A_ours - A_ref| / max |A_ref| in 20*log10 dB.
    Measured: -141 dB on v5e MXU (HIGHEST), -136 dB on the CPU test mesh.
    (A *power-difference* metric saturates near -70 dB for ANY pair of f32
    pipelines - even the reference against itself recomputed - because
    |p1-p2| ~ 2*a*da; the -100 dB bar is only meaningful in amplitude.)
    """
    import scipy.fft

    from openmeters_tpu.utils.windows import WindowKind, window_coefficients

    n = 2048
    t = np.arange(n)
    x = (
        0.7 * np.sin(2 * np.pi * 441.3 * t / 48_000.0)
        + 0.1 * np.sin(2 * np.pi * 7000.0 * t / 48_000.0)
    ).astype(np.float32)
    w = np.asarray(window_coefficients(WindowKind.HANN, n), np.float32)
    frame32 = ((x - np.float32(x.astype(np.float64).mean())) * w).astype(np.float32)

    ref32 = scipy.fft.rfft(frame32)  # f32 transform, reference semantics
    assert ref32.dtype == np.complex64
    ours = np.asarray(rfft_mxu(frame32[None]))[0]

    err = np.max(np.abs(ours - ref32)) / np.max(np.abs(ref32))
    err_db = 20 * np.log10(max(err, 1e-30))
    assert err_db <= -100.0, f"spectral error {err_db:.1f} dB"


def test_partial_input_rfft_matches_full(rng):
    """in_len (explicit or inferred from a short frame) must not change the
    spectrum: the skipped stage-1 rows are exactly the zero padding."""
    from openmeters_tpu.ops.fft import rfft_mxu

    n = 2048
    for batch in (4, 5):  # pair-packed and odd paths
        x = rng.standard_normal((batch, 1200)).astype(np.float32)
        xp = np.concatenate([x, np.zeros((batch, n - 1200), np.float32)], -1)
        full = np.asarray(rfft_mxu(xp, n))
        short = np.asarray(rfft_mxu(x, n))  # in_len inferred
        explicit = np.asarray(rfft_mxu(xp, n, in_len=1200))
        np.testing.assert_allclose(short, full, rtol=0, atol=1e-4)
        np.testing.assert_allclose(explicit, full, rtol=0, atol=1e-4)


def test_partial_output_irfft_matches_prefix(rng):
    from openmeters_tpu.ops.fft import irfft_mxu, rfft_mxu

    n = 2048
    for batch in (4, 5):
        x = rng.standard_normal((batch, n)).astype(np.float32)
        spec = np.asarray(rfft_mxu(x, n))
        full = np.asarray(irfft_mxu(spec.real, spec.imag, n))
        for out_len in (1, 63, 64, 700, n):
            part = np.asarray(
                irfft_mxu(spec.real, spec.imag, n, out_len=out_len)
            )
            assert part.shape[-1] == out_len
            np.testing.assert_allclose(
                part, full[..., :out_len], rtol=0, atol=1e-5
            )


def test_partial_output_ifft_matches_prefix(rng):
    from openmeters_tpu.ops.fft import ifft_mxu

    n = 1024
    re = rng.standard_normal((3, n)).astype(np.float32)
    im = rng.standard_normal((3, n)).astype(np.float32)
    fr, fi = ifft_mxu(re, im, n)
    pr, pi = ifft_mxu(re, im, n, out_len=100)
    np.testing.assert_allclose(np.asarray(pr), np.asarray(fr)[..., :100], atol=1e-6)
    np.testing.assert_allclose(np.asarray(pi), np.asarray(fi)[..., :100], atol=1e-6)
