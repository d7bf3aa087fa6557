"""Parity tests for the fused Pallas correlation-search kernel
(ops/pallas_corr.py) in interpret mode on CPU."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("OPENMETERS_PALLAS_INTERPRET", "1")


def _reference(work, tmpl, shift, nfft, out_len):
    wf = np.fft.rfft(work, nfft, axis=-1)
    tf = np.fft.rfft(tmpl, nfft, axis=-1)
    k = np.arange(nfft // 2 + 1)
    ph = np.exp(2j * np.pi * k[None, :] * shift[:, None] / nfft)
    return np.fft.irfft(wf * np.conj(tf) * ph, nfft, axis=-1)[:, :out_len]


def test_corr_dots_matches_fft_reference():
    from openmeters_tpu.ops.pallas_corr import corr_dots

    rng = np.random.default_rng(0)
    s, lw, lt, nfft, out = 8, 7200, 4800, 8192, 2401
    work = rng.standard_normal((s, lw)).astype(np.float32)
    tmpl = (
        rng.standard_normal((s, lt)).astype(np.float32)
        * (np.arange(lt) < 3000)
    )
    shift = rng.integers(-1440, 2400, size=s).astype(np.int32)
    got = np.asarray(
        corr_dots(jnp.asarray(work), jnp.asarray(tmpl), jnp.asarray(shift),
                  nfft, out)
    )
    want = _reference(work, tmpl, shift, nfft, out)
    # full-f32 class: bf16x3-class dots would land at ~3e-3 here (the
    # inverse DFT's cancellation amplifies elementwise error ~1000x)
    assert np.abs(got - want).max() / np.abs(want).max() < 5e-6


def test_corr_dots_delta_template_extracts_windows():
    from openmeters_tpu.ops.pallas_corr import corr_dots

    rng = np.random.default_rng(1)
    s, nfft, out = 4, 8192, 2401
    work = rng.standard_normal((s, 7200)).astype(np.float32)
    tmpl = np.zeros((s, 4800), np.float32)
    tmpl[:, 777] = 1.0  # dots[o] = work[o + shift + 777]
    shift = np.full((s,), 100, np.int32)
    got = np.asarray(
        corr_dots(jnp.asarray(work), jnp.asarray(tmpl), jnp.asarray(shift),
                  nfft, out)
    )
    want = work[:, 877 : 877 + out]
    assert np.abs(got - want).max() < 1e-5


def test_corr_dots_row_padding_and_odd_batch():
    from openmeters_tpu.ops.pallas_corr import corr_dots

    rng = np.random.default_rng(2)
    s, nfft, out = 5, 8192, 130  # not a tile multiple; tiny out_len
    work = rng.standard_normal((s, 6000)).astype(np.float32)
    tmpl = rng.standard_normal((s, 4000)).astype(np.float32)
    shift = np.zeros((s,), np.int32)
    got = np.asarray(
        corr_dots(jnp.asarray(work), jnp.asarray(tmpl), jnp.asarray(shift),
                  nfft, out)
    )
    want = _reference(work, tmpl, shift, nfft, out)
    assert got.shape == (s, out)
    assert np.abs(got - want).max() / np.abs(want).max() < 5e-6


def test_corr_dots_sums_matches_reference():
    """Fused dots+sliding-sums kernel vs direct numpy windows."""
    from openmeters_tpu.ops.pallas_corr import corr_dots_sums

    rng = np.random.default_rng(7)
    s, wcap, kcap, out_len, nfft = 6, 7200, 4800, 2401, 8192
    work = rng.standard_normal((s, wcap)).astype(np.float32)
    tmpl = rng.standard_normal((s, kcap)).astype(np.float32)
    klen = rng.integers(1920, kcap + 1, s).astype(np.int32)
    mask = (np.arange(kcap)[None, :] < klen[:, None]).astype(np.float32)
    shift = rng.integers(-1440, 1, s).astype(np.int32)

    wlen = np.minimum(klen + 1000, wcap).astype(np.int32)
    dots, sx, sxx, wmean = (
        np.asarray(o)
        for o in corr_dots_sums(
            jnp.asarray(work), jnp.asarray(tmpl), jnp.asarray(klen),
            jnp.asarray(wlen), jnp.asarray(shift), nfft, out_len,
        )
    )
    for i in range(s):
        ref_wm = float(work[i, : wlen[i]].sum() / wlen[i])
        assert abs(wmean[i] - ref_wm) < 1e-4 * max(abs(ref_wm), 1.0)

    wp = np.pad(work, ((0, 0), (0, nfft - wcap)))
    tp = np.pad(tmpl, ((0, 0), (0, nfft - kcap)))
    mp = np.pad(mask, ((0, 0), (0, nfft - kcap)))
    for i in range(s):
        for o in (0, 1, 17, 1000, out_len - 1):
            idx = (o + shift[i] + np.arange(nfft)) % nfft
            ref = float(np.dot(wp[i, idx], tp[i]))
            assert abs(dots[i, o] - ref) < 2e-2 + 1e-4 * abs(ref), (i, o)
            idx0 = (o + np.arange(nfft)) % nfft
            ref_sx = float(np.dot(wp[i, idx0], mp[i]))
            ref_sxx = float(np.dot(wp[i, idx0] ** 2, mp[i]))
            assert abs(sx[i, o] - ref_sx) < 2e-2 + 1e-4 * abs(ref_sx)
            assert abs(sxx[i, o] - ref_sxx) < 1e-4 * max(abs(ref_sxx), 1.0)


def test_corr_dots_sums_ring_matches_materialized():
    """The in-kernel ring gather (corr_dots_sums_ring) equals
    corr_dots_sums on the materialized window for every output, including
    start positions that force the coarse-block clamp."""
    from openmeters_tpu.ops.pallas_corr import corr_dots_sums, corr_dots_sums_ring

    rng = np.random.default_rng(9)
    s, wcap, kcap, out_len, nfft = 6, 7200, 4800, 2401, 8192
    lanes = 19456  # the oscilloscope's mirrored ring width
    ring = rng.standard_normal((s, lanes)).astype(np.float32)
    starts = np.array([0, 1, 127, 5000, 9727, 12256], np.int32)[:s]
    tmpl = rng.standard_normal((s, kcap)).astype(np.float32)
    klen = rng.integers(1920, kcap + 1, s).astype(np.int32)
    wlen = np.minimum(klen + 1000, wcap).astype(np.int32)
    shift = rng.integers(-1440, 1, s).astype(np.int32)

    work = np.stack([ring[i, st : st + wcap] for i, st in enumerate(starts)])
    want = corr_dots_sums(
        jnp.asarray(work), jnp.asarray(tmpl), jnp.asarray(klen),
        jnp.asarray(wlen), jnp.asarray(shift), nfft, out_len,
    )
    got = corr_dots_sums_ring(
        jnp.asarray(ring), jnp.asarray(starts), jnp.asarray(tmpl),
        jnp.asarray(klen), jnp.asarray(wlen), jnp.asarray(shift), nfft,
        out_len, wcap=wcap,
    )
    for a, b, name in zip(got, want, ("dots", "sx", "sxx", "wmean")):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1.0)
        assert np.abs(a - b).max() < 1e-5 * scale, name
