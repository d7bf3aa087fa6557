"""Fused Pallas biquad-cascade kernel for the K-weighting hop.

The XLA formulation (ops/iir.py biquad_cascade_scan) runs 256 sequential
scan steps whose bodies are tiny ``[S, C]`` elementwise ops — each step
round-trips HBM and under-fills the VPU.  This kernel runs the whole hop's
recurrence in VMEM: streams x channels pack the full ``(8, 128)`` vector
tile (sublanes AND lanes), the 256-sample time loop is a ``fori_loop``
whose carries are the DF2T section states, and the filtered output writes
once per sample row.  Identical recurrence and operation order to
``_biquad_step`` (finite_reset=False), so results match the XLA path to
f32 rounding.

Input layout: ``[T, 8, L]`` — time-major with the lane dimension split
``(sublane, lane)`` so every per-sample op is a stack of full vector tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openmeters_tpu.ops.pallas_sliding import _interpret, pallas_enabled  # noqa: F401


def _build(n_t, coeffs):
    sections = [tuple(float(v) for v in c) for c in coeffs]

    def kern(x_ref, z_ref, y_ref, z2_ref):
        # static time unroll: every access is a fixed VMEM offset (dynamic
        # leading-dim indexing per sample measured ~300x slower)
        z = tuple(z_ref[i] for i in range(2 * len(sections)))
        for t in range(n_t):
            y = x_ref[t]
            nz = []
            for i, (b0, b1, b2, a1, a2) in enumerate(sections):
                z0, z1 = z[2 * i], z[2 * i + 1]
                out = b0 * y + z0
                nz.append(b1 * y - a1 * out + z1)
                nz.append(b2 * y - a2 * out)
                y = out
            y_ref[t] = y
            z = tuple(nz)
        for i in range(2 * len(sections)):
            z2_ref[i] = z[i]

    return kern


@functools.partial(jax.jit, static_argnames=("coeffs",))
def biquad_cascade_hop(x, state, coeffs: tuple):
    """Run the cascade over one hop.

    Args:
      x: ``[T, lanes]`` f32 time-major samples (lanes = streams*channels).
      state: ``[n_sections*2, lanes]`` DF2T states, ordered
        ``(z0_sec0, z1_sec0, z0_sec1, ...)``.
      coeffs: tuple of ``(b0, b1, b2, a1, a2)`` per section.

    Returns ``(y [T, lanes], new_state)``.
    """
    t, lanes = x.shape
    ns2 = state.shape[0]
    pad = (-lanes) % 1024  # full (8, 128) tiles after the (8, L) split
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
        state = jnp.pad(state, ((0, 0), (0, pad)))
    lp = lanes + pad
    l8 = lp // 8
    x3 = x.reshape(t, 8, l8)
    z3 = state.reshape(ns2, 8, l8)

    # in/out blocks are double-buffered by the pipeline: (t, 8, tl) f32 x4
    # must stay well under the 16 MB VMEM budget
    tl = min(256, l8)
    grid = (l8 // tl,) if l8 % tl == 0 else (pl.cdiv(l8, tl),)
    kern = _build(t, coeffs)
    y3, z2 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, 8, tl), lambda i: (0, 0, i)),
            pl.BlockSpec((ns2, 8, tl), lambda i: (0, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((t, 8, tl), lambda i: (0, 0, i)),
            pl.BlockSpec((ns2, 8, tl), lambda i: (0, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, 8, l8), jnp.float32),
            jax.ShapeDtypeStruct((ns2, 8, l8), jnp.float32),
        ],
        interpret=_interpret(),
    )(x3, z3)
    y = y3.reshape(t, lp)
    z = z2.reshape(ns2, lp)
    if pad:
        y, z = y[:, :lanes], z[:, :lanes]
    return y, z
