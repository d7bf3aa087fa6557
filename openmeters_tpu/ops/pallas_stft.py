"""Fused Pallas STFT kernel: DC-removal -> window -> DFT -> power, in VMEM.

The XLA path for the classic spectrogram/spectrum column spends most of its
time in HBM passes (frame tensor in/out around each fused stage, plus the
six-step FFT's reshape/transpose round-trips).  This kernel keeps one frame
tile resident in VMEM through the whole column: subtract the frame mean,
apply the analysis window, run the two DFT matmul stages + twiddle on the
MXU, and emit per-bin power — one HBM read of the frames and one write of
the spectrum.

DFT math is identical to :mod:`openmeters_tpu.ops.fft` (six-step Cooley–
Tukey); factor matrices and twiddles arrive as tiny f32 operands.  Output is
one-sided power (``|X[k]|^2 * norm[k]``), ready for dB/packing outside (those
are cheap elementwise on a [N, bins] tensor).

Falls back transparently to the unfused path on CPU test runs (interpret
mode is used automatically off-TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openmeters_tpu.ops.fft import _dft_mats, _factors, _twiddle


def _kernel(frames_ref, window_ref, norm_ref, f2_re_ref, f2_im_ref,
            f1_re_ref, f1_im_ref, tw_re_ref, tw_im_ref, out_ref,
            *, n1: int, n2: int, bins: int, remove_dc: bool):
    x = frames_ref[:]  # [TILE, n]
    tile = x.shape[0]
    n = n1 * n2
    if remove_dc:
        x = x - jnp.mean(x, axis=-1, keepdims=True)
    x = x * window_ref[0, :]

    # x[n1 + N1*n2] -> A[f, n1, n2]
    a = jnp.swapaxes(x.reshape(tile, n2, n1), -1, -2)
    # stage 1: B[f, n1, k2] = sum_n2 A F2
    f2_re, f2_im = f2_re_ref[:], f2_im_ref[:]
    b_re = jax.lax.dot_general(
        a.reshape(tile * n1, n2), f2_re,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(tile, n1, n2)
    b_im = jax.lax.dot_general(
        a.reshape(tile * n1, n2), f2_im,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(tile, n1, n2)
    # twiddle
    c_re = b_re * tw_re_ref[:] - b_im * tw_im_ref[:]
    c_im = b_re * tw_im_ref[:] + b_im * tw_re_ref[:]
    # stage 2: D[f, k2, k1] = sum_n1 C[f, n1, k2] F1[n1, k1]
    c_re = jnp.swapaxes(c_re, -1, -2).reshape(tile * n2, n1)
    c_im = jnp.swapaxes(c_im, -1, -2).reshape(tile * n2, n1)
    f1_re, f1_im = f1_re_ref[:], f1_im_ref[:]
    d_re = (
        jax.lax.dot_general(c_re, f1_re, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        - jax.lax.dot_general(c_im, f1_im, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    )
    d_im = (
        jax.lax.dot_general(c_re, f1_im, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(c_im, f1_re, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    )
    power = (d_re * d_re + d_im * d_im).reshape(tile, n2, n1)
    # X[k1*N2 + k2] <- D[k2, k1]: transpose then flatten, keep one side
    power = jnp.swapaxes(power, -1, -2).reshape(tile, n)[:, :bins]
    out_ref[:] = power * norm_ref[0, :]


@functools.partial(
    jax.jit, static_argnames=("fft_size", "bins", "remove_dc", "tile")
)
def stft_power_fused(frames, window, norms, fft_size: int, bins: int,
                     remove_dc: bool = True, tile: int = 256):
    """One-sided STFT power of ``[N, fft_size]`` frames via one fused kernel.

    Args:
      frames: ``[N, fft_size]`` float32 (N padded to a tile multiple by the
        caller or internally here).
      window: ``[fft_size]`` analysis window.
      norms: ``[bins]`` per-bin power normalization.

    Returns ``[N, bins]`` float32 power.
    """
    n_frames = frames.shape[0]
    n1, n2 = _factors(fft_size)
    f2_re, f2_im = _dft_mats(n2)
    f1_re, f1_im = _dft_mats(n1)
    tw_re, tw_im = _twiddle(fft_size)

    pad = (-n_frames) % tile
    if pad:
        frames = jnp.pad(frames, ((0, pad), (0, 0)))
    total = frames.shape[0]

    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(
            _kernel, n1=n1, n2=n2, bins=bins, remove_dc=remove_dc
        ),
        grid=(total // tile,),
        in_specs=[
            pl.BlockSpec((tile, fft_size), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fft_size), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bins), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, n1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, n1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, bins), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, bins), jnp.float32),
        interpret=interpret,
    )(
        frames.astype(jnp.float32),
        jnp.asarray(window, jnp.float32)[None, :],
        jnp.asarray(norms, jnp.float32)[None, :],
        jnp.asarray(f2_re), jnp.asarray(f2_im),
        jnp.asarray(f1_re), jnp.asarray(f1_im),
        jnp.asarray(tw_re), jnp.asarray(tw_im),
    )
    return out[:n_frames]


def stft_power_supported(fft_size: int) -> bool:
    """The fused kernel covers power-of-two sizes with square-ish factors."""
    return fft_size >= 256 and (fft_size & (fft_size - 1)) == 0


def stft_power_enabled(fft_size: int) -> bool:
    """Fused kernel gate: currently opt-in (OPENMETERS_FUSED_STFT=1) — the
    Mosaic TPU compiler in this environment rejects the kernel's reshape ops
    ("unsupported shape cast"); the XLA six-step path is the default."""
    import os

    return bool(os.environ.get("OPENMETERS_FUSED_STFT")) and stft_power_supported(
        fft_size
    )
