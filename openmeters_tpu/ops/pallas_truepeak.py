"""Fused Pallas true-peak kernel: polyphase FIR + peak reduction in VMEM.

The XLA formulation (ops/truepeak.py) evaluates the 12-tap x 3-phase
(or 24-tap x 1) interpolator as ~36 shifted multiply-adds over the
``[T, lanes]`` block — partially fused, it re-reads the block many times
(~1.3 ms at 16k stereo streams).  This kernel reads the block ONCE per
lane tile, keeps every shifted product in VMEM/registers, and writes only
the per-lane peak plus the D-1-sample carry tail.

Layout: time in sublanes, lanes = flattened [streams * channels] in the
lane dim — the same ``[B, S, C]`` array the loudness step already builds,
viewed as ``[B, S*C]`` (free reshape).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openmeters_tpu.ops.pallas_sliding import _interpret, pallas_enabled
from openmeters_tpu.ops.truepeak import polyphase_taps


def truepeak_supported() -> bool:
    """Opt-in (OPENMETERS_PALLAS_TRUEPEAK=1): the kernel alone beats the
    XLA shifted-multiply form, but inside the fused loudness graph the
    custom-call boundary costs more than it saves (2.56 -> 3.04 ms at 16k
    streams on v5e) — the same layout-assignment trap as the K-weighting
    hop kernel (NOTES.md).  Kept for standalone use and other toolchains."""
    import os

    if not os.environ.get("OPENMETERS_PALLAS_TRUEPEAK"):
        return False
    return pallas_enabled() or _interpret()


@functools.partial(jax.jit, static_argnames=("factor", "lane_tile"))
def truepeak_block(x, tail, *, factor: int, lane_tile: int = 512):
    """Block peak of |x| and its polyphase-interpolated phases.

    Args:
      x: ``[B, L]`` time-major samples (lanes = streams*channels).
      tail: ``[D-1, L]`` delay history from the previous block.
      factor: 4 or 2 (oversampling; 1 is handled by the caller).

    Returns ``(peak [L], new_tail [D-1, L])``.
    """
    taps = polyphase_taps(factor)  # [D, P]
    d, phases = taps.shape
    b, lanes = x.shape
    assert tail.shape == (d - 1, lanes)

    lt = lane_tile
    pad = (-lanes) % lt
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
        tail = jnp.pad(tail, ((0, 0), (0, pad)))
    lp = lanes + pad

    tap_consts = tuple(tuple(float(v) for v in taps[:, p]) for p in range(phases))

    def kern(tail_ref, x_ref, peak_ref, newtail_ref):
        xx = jnp.concatenate([tail_ref[:], x_ref[:]], axis=0)  # [B+D-1, lt]
        peak = jnp.max(jnp.abs(x_ref[:]), axis=0, keepdims=True)
        for p in range(phases):
            y = jnp.zeros((b, lt), jnp.float32)
            for i in range(d):
                y = y + tap_consts[p][i] * xx[d - 1 - i : d - 1 - i + b, :]
            peak = jnp.maximum(peak, jnp.max(jnp.abs(y), axis=0, keepdims=True))
        peak_ref[:] = peak
        newtail_ref[:] = x_ref[b - (d - 1) :, :]

    grid_spec = pl.GridSpec(
        grid=(lp // lt,),
        in_specs=[
            pl.BlockSpec((d - 1, lt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, lt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, lt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d - 1, lt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
    )
    peak, new_tail = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, lp), jnp.float32),
            jax.ShapeDtypeStruct((d - 1, lp), jnp.float32),
        ],
        interpret=_interpret(),
    )(tail, x)
    return peak[0, :lanes], new_tail[:, :lanes]
