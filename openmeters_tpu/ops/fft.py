"""MXU-native FFTs: six-step Cooley–Tukey as batched matmuls.

XLA's TPU ``fft`` lowering runs on the VPU at well under 1 TFLOP/s; for the
hop-rate STFT workloads here (tens of thousands of 1k–16k point transforms
per hop) the MXU is the right unit.  A length-``N = N1*N2`` DFT decomposes
into dense ``[N1, N1]`` / ``[N2, N2]`` DFT matmuls plus a twiddle — ~N(N1+N2)
complex MACs instead of N log N, a >20x FLOP inflation that still wins by
>5x wall-clock because the MXU has ~100x the VPU's throughput.

    X[k1*N2 + k2] = sum_{n1} W_N1^{n1 k1} * [ W_N^{n1 k2} *
                    sum_{n2} x[n1 + N1*n2] * W_N2^{n2 k2} ]

All factor matrices/twiddles are host-precomputed float32 constants; matmuls
run at ``Precision.HIGHEST`` (f32-accurate on MXU) — spectral parity tests
hold the result to ~1e-6 of numpy's f64 FFT.

Used by the spectrogram/spectrum analyzers for rFFT, complex FFT (Hilbert)
and inverse FFT.  Shapes are static per config; radix split is chosen
automatically (balanced halves).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# MXU pass count for the DFT matmuls.  HIGHEST (full f32) measures the same
# analyzer-level speed as HIGH (bf16_3x) on v5e — the hot spots are memory
# passes, not matmul throughput — while HIGH costs ~45 dB of spectral floor.
# Keep HIGHEST; override with OPENMETERS_FFT_PRECISION for experiments.
_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}[os.environ.get("OPENMETERS_FFT_PRECISION", "highest").lower()]


@functools.lru_cache(maxsize=None)
def _factors(n: int) -> tuple[int, int]:
    """Balanced power-of-two split n = n1 * n2 (n1 >= n2)."""
    assert n & (n - 1) == 0 and n >= 4, f"fft size must be a power of two >= 4: {n}"
    lg = n.bit_length() - 1
    n1 = 1 << ((lg + 1) // 2)
    return n1, n // n1


@functools.lru_cache(maxsize=None)
def _dft_mats(n: int):
    """(cos, -sin) [n, n] float32 so that F = cos + i*(-sin) is the DFT."""
    k = np.arange(n)
    ang = 2.0 * np.pi * np.outer(k, k) / n
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _twiddle(n: int):
    """W_N^{n1 k2} as (re, im) [n1, n2] float32."""
    n1, n2 = _factors(n)
    ang = 2.0 * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def _mm(x, mat, precision):
    if precision == "bf16x3":
        # f32-class accuracy in 3 bf16 MXU passes: hi/lo split of the data
        # against a pre-split constant matrix (vs HIGHEST's 6 passes).
        # ~1e-6 relative — for consumers whose outputs are ratios/peaks
        # (oscilloscope NSDF + correlation), not the spectral-parity path.
        hi, lo = mat
        xh = x.astype(jnp.bfloat16).astype(jnp.float32)
        xl = x - xh
        p = jax.lax.Precision.DEFAULT
        return (
            jnp.einsum("...n,nk->...k", xh, hi, precision=p)
            + jnp.einsum("...n,nk->...k", xh, lo, precision=p)
            + jnp.einsum("...n,nk->...k", xl, hi, precision=p)
        )
    return jnp.einsum("...n,nk->...k", x, mat, precision=_PRECISION)


def _stage(re, im, mat_re, mat_im, precision=None):
    """Complex matmul (re + i*im) @ (mat_re + i*mat_im) over the last axis."""
    rr = _mm(re, mat_re, precision)
    ri = _mm(re, mat_im, precision)
    if im is None:
        return rr, ri
    ir = _mm(im, mat_re, precision)
    ii = _mm(im, mat_im, precision)
    return rr - ii, ri + ir


@functools.lru_cache(maxsize=None)
def _dft_mats_split(n: int):
    """bf16 hi/lo splits of the DFT matrices for the bf16x3 mode."""
    import ml_dtypes

    c, s = _dft_mats(n)

    def split(m):
        hi = m.astype(ml_dtypes.bfloat16).astype(np.float32)
        return hi, m - hi

    return split(c), split(s)


def _slice_rows(mat, rows: int):
    if isinstance(mat, tuple):  # bf16x3 (hi, lo) split
        return mat[0][:rows], mat[1][:rows]
    return mat[:rows]


def _slice_cols(mat, cols: int):
    if isinstance(mat, tuple):
        return mat[0][:, :cols], mat[1][:, :cols]
    return mat[:, :cols]


def _fft_core(x_re, x_im, n: int, precision=None, in_len=None, out_len=None):
    """Six-step DFT over the last axis.  Returns (re, im).

    ``in_len``: inputs beyond this index are known zero (zero-padded
    frames) — the first stage contracts only the ``ceil(in_len/n1)``
    non-zero n2 rows.  ``out_len``: only outputs ``[0, out_len)`` are
    needed — the second stage computes only ``ceil(out_len/n2)`` k1
    columns (the outputs are k1-major), cutting the dominant matmul.
    Returns length ``out_len`` when given, else ``n``.
    """
    n1, n2 = _factors(n)
    batch = x_re.shape[:-1]
    n2_cap = n2
    if in_len is not None and in_len < n:
        n2_cap = -(-int(in_len) // n1)
        x_re = x_re[..., : n2_cap * n1]
        x_im = None if x_im is None else x_im[..., : n2_cap * n1]
    # x[n1 + N1*n2] -> A[n1, n2]
    a_re = jnp.swapaxes(x_re.reshape(*batch, n2_cap, n1), -1, -2)
    a_im = (
        None
        if x_im is None
        else jnp.swapaxes(x_im.reshape(*batch, n2_cap, n1), -1, -2)
    )

    if precision == "bf16x3":
        f2_re, f2_im = _dft_mats_split(n2)
        f1_re, f1_im = _dft_mats_split(n1)
    else:
        f2_re, f2_im = _dft_mats(n2)
        f1_re, f1_im = _dft_mats(n1)
    if n2_cap < n2:
        f2_re, f2_im = _slice_rows(f2_re, n2_cap), _slice_rows(f2_im, n2_cap)
    b_re, b_im = _stage(a_re, a_im, f2_re, f2_im, precision)  # [.., n1, n2(k2)]

    tw_re, tw_im = _twiddle(n)
    c_re = b_re * tw_re - b_im * tw_im
    c_im = b_re * tw_im + b_im * tw_re

    k1_cap = n1
    if out_len is not None and out_len < n:
        k1_cap = -(-int(out_len) // n2)
        f1_re, f1_im = _slice_cols(f1_re, k1_cap), _slice_cols(f1_im, k1_cap)

    # D[k2, k1] = sum_n1 C[n1, k2] F1[n1, k1]
    c_re = jnp.swapaxes(c_re, -1, -2)  # [.., k2, n1]
    c_im = jnp.swapaxes(c_im, -1, -2)
    d_re, d_im = _stage(c_re, c_im, f1_re, f1_im, precision)  # [.., k2, k1]

    # X[k1*N2 + k2] <- D[k2, k1]
    x_re_out = jnp.swapaxes(d_re, -1, -2).reshape(*batch, k1_cap * n2)
    x_im_out = jnp.swapaxes(d_im, -1, -2).reshape(*batch, k1_cap * n2)
    if out_len is not None and out_len < k1_cap * n2:
        x_re_out = x_re_out[..., :out_len]
        x_im_out = x_im_out[..., :out_len]
    return x_re_out, x_im_out


def _is_pow2(n: int) -> bool:
    return n >= 4 and (n & (n - 1)) == 0


def rfft_mxu(x, n: int | None = None, precision=None, in_len=None):
    """Real-input FFT -> complex one-sided spectrum ``[..., n//2+1]``.

    Pads/truncates the last axis to ``n`` like ``jnp.fft.rfft(x, n)``.
    Non-power-of-two sizes fall back to XLA's fft.

    ``in_len``: promise that inputs beyond this index are zero (zero-padded
    frames) — skips the corresponding first-stage matmul rows.

    When the flattened batch is even, two real frames ride one complex
    transform (z = a + ib; A = (Z(k) + conj(Z(-k)))/2, B = -i(Z(k) -
    conj(Z(-k)))/2) — halving the MXU work and memory traffic.
    """
    n = n or x.shape[-1]
    if not _is_pow2(n):
        return jnp.fft.rfft(x.astype(jnp.float32), n=n, axis=-1)
    if in_len is None and x.shape[-1] < n:
        in_len = x.shape[-1]  # zero-padded frame: stage 1 skips the pad rows
    if in_len is not None:
        in_len = min(max(int(in_len), 1), n)
        if x.shape[-1] > in_len:
            x = x[..., :in_len]  # declared zero beyond in_len
    x = _pad_last(x.astype(jnp.float32), n)
    batch_shape = x.shape[:-1]
    total = int(np.prod(batch_shape)) if batch_shape else 1
    bins = n // 2 + 1

    if total >= 2 and total % 2 == 0:
        flat = x.reshape(total // 2, 2, n)
        fr, fi = _fft_core(flat[:, 0], flat[:, 1], n, precision, in_len=in_len)
        # Z(-k) = Z((n-k) mod n): full-spectrum mirror, then one-sided slice
        mr = jnp.concatenate([fr[..., :1], fr[..., 1:][..., ::-1]], axis=-1)[..., :bins]
        mi = jnp.concatenate([fi[..., :1], fi[..., 1:][..., ::-1]], axis=-1)[..., :bins]
        fr, fi = fr[..., :bins], fi[..., :bins]
        a_re = 0.5 * (fr + mr)
        a_im = 0.5 * (fi - mi)
        b_re = 0.5 * (fi + mi)
        b_im = 0.5 * (mr - fr)
        out_re = jnp.stack([a_re, b_re], axis=1).reshape(*batch_shape, bins)
        out_im = jnp.stack([a_im, b_im], axis=1).reshape(*batch_shape, bins)
        return jax.lax.complex(out_re, out_im)

    re, im = _fft_core(x, None, n, precision, in_len=in_len)
    return jax.lax.complex(re[..., :bins], im[..., :bins])


def fft_mxu(re, im, n: int | None = None, precision=None):
    """Complex FFT over the last axis; takes/returns (re, im) float32 pairs."""
    n = n or re.shape[-1]
    if not _is_pow2(n):
        z = _pad_last(re.astype(jnp.float32), n) + (
            1j * _pad_last(im.astype(jnp.float32), n) if im is not None else 0.0
        )
        out = jnp.fft.fft(z, n=n, axis=-1)
        return jnp.real(out), jnp.imag(out)
    re = _pad_last(re.astype(jnp.float32), n)
    im = _pad_last(im.astype(jnp.float32), n) if im is not None else None
    return _fft_core(re, im, n, precision)


def ifft_mxu(re, im, n: int | None = None, precision=None, out_len=None):
    """Normalized inverse complex FFT via conjugation: ifft(z) = conj(fft(conj(z)))/n.

    ``out_len``: only outputs ``[0, out_len)`` are needed — skips the
    corresponding second-stage matmul columns (the dominant cost)."""
    n = n or re.shape[-1]
    if not _is_pow2(n):
        out = jnp.fft.ifft(_pad_last(re, n) + 1j * _pad_last(im, n), n=n, axis=-1)
        if out_len is not None:
            out = out[..., :out_len]
        return jnp.real(out), jnp.imag(out)
    fr, fi = _fft_core(
        _pad_last(re, n), -_pad_last(im, n), n, precision, out_len=out_len
    )
    inv = 1.0 / n
    return fr * inv, -fi * inv


def irfft_mxu(spec_re, spec_im, n: int, precision=None, out_len=None):
    """Inverse of :func:`rfft_mxu`: one-sided ``[..., n//2+1]`` (re, im) ->
    real ``[..., n]`` (or ``[..., out_len]``).  Rebuilds the hermitian
    spectrum with a static mirror (cheap permutation) and runs the MXU
    inverse FFT; ``out_len`` skips second-stage matmul columns for callers
    that only read a prefix (autocorrelation lags, search offsets).

    Mirror of the forward pair-packing: when the flattened batch is even, two
    hermitian spectra ride one complex inverse transform (Z = A + iB with A, B
    hermitian ⇒ ifft(Z) = a + i·b, a and b real) — halving the MXU work.
    """
    if not _is_pow2(n):
        out = jnp.fft.irfft(spec_re + 1j * spec_im, n=n, axis=-1)
        if out_len is not None:
            out = out[..., :out_len]
        return out.astype(jnp.float32)
    half = n // 2  # bins = half + 1; remaining bins k = half+1..n-1 = conj(spec[n-k])
    full_re = jnp.concatenate([spec_re, spec_re[..., 1:half][..., ::-1]], axis=-1)
    full_im = jnp.concatenate([spec_im, -spec_im[..., 1:half][..., ::-1]], axis=-1)

    out_n = n if out_len is None else min(int(out_len), n)
    batch_shape = full_re.shape[:-1]
    total = int(np.prod(batch_shape)) if batch_shape else 1
    if total >= 2 and total % 2 == 0:
        fr = full_re.reshape(total // 2, 2, n)
        fi = full_im.reshape(total // 2, 2, n)
        z_re = fr[:, 0] - fi[:, 1]  # A + iB with both hermitian
        z_im = fi[:, 0] + fr[:, 1]
        a, b = ifft_mxu(z_re, z_im, n, precision, out_len=out_len)
        return jnp.stack([a, b], axis=1).reshape(*batch_shape, out_n)

    re, _ = ifft_mxu(full_re, full_im, n, precision, out_len=out_len)
    return re


def _pad_last(x, n: int):
    if x.shape[-1] == n:
        return x
    if x.shape[-1] > n:
        return x[..., :n]
    pad = [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])]
    return jnp.pad(x, pad)
