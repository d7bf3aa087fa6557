"""Batched per-row contiguous window extraction (a TPU "row gather").

``out[s, w] = x[s, start[s, w] : start[s, w] + length]`` — the core access
pattern of the oscilloscope trigger (per-stream work windows, cumsum sliding
sums, candidate segments, snapshot capture windows).

XLA lowers ``vmap(dynamic_slice)`` on TPU to a **serial while-loop over
rows** (~1.4 µs/row ⇒ ~1.5 ms per call at 1024 streams, independent of the
window length), and ``take_along_axis`` to an element gather that is far
slower still.  This Pallas kernel instead does, per row:

1. a 128-aligned dynamic lane slice of ``Lp = next_pow2(length + 128)``
   lanes (Mosaic requires lane-dim dynamic slices to be 128-aligned), then
2. ``pltpu.roll`` by the residual ``start mod 128`` (dynamic lane roll;
   Mosaic computes it wrongly for non-power-of-two lane counts, hence the
   pow2 ``Lp``), then
3. a static ``[:length]`` slice.

Measured ~4x faster than ``vmap(dynamic_slice)`` at [1024, 9603] → 7200-lane
windows; multiple windows per row amortize the block load further.

Non-TPU backends (the CPU test mesh) fall back to ``vmap(dynamic_slice)``;
``OPENMETERS_PALLAS_ROWS=0`` forces the fallback everywhere.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def _pow2(n: int) -> int:
    return 1 << max(n - 1, 1).bit_length()


def _use_pallas() -> bool:
    if os.environ.get("OPENMETERS_PALLAS_ROWS", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing
        return False


def window_rows(x, starts, length: int, row_tile: int = 8):
    """Per-row contiguous windows.

    Args:
      x: ``[S, N]`` float32 source rows.
      starts: ``[S]`` or ``[S, W]`` int32 window starts; clipped to
        ``[0, N - length]`` (matching ``dynamic_slice`` semantics).
      length: static window length (≤ N).

    Returns ``[S, length]`` (1-D starts) or ``[S, W, length]``.
    """
    s, n = x.shape
    assert length <= n, (length, n)
    squeeze = starts.ndim == 1
    st = starts[:, None] if squeeze else starts
    st = jnp.clip(st.astype(jnp.int32), 0, n - length)

    if not _use_pallas():
        out = jax.vmap(
            lambda row, ss: jax.vmap(
                lambda s0: jax.lax.dynamic_slice(row, (s0,), (length,))
            )(ss)
        )(x, st)
        return out[:, 0] if squeeze else out

    out = _window_rows_tpu(x, st, length, row_tile)
    return out[:, 0] if squeeze else out


@functools.partial(jax.jit, static_argnums=(2, 3))
def _window_rows_tpu(x, starts, length: int, row_tile: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s, n = x.shape
    w = starts.shape[1]
    lp = _pow2(length + 128)
    # pad only up to a 128-lane multiple (usually zero): instead of padding
    # the whole source so every coarse+lp read fits, clamp the coarse slice
    # to end at the buffer edge and roll by the larger residual — the roll
    # amount stays < lp because starts are clipped to n - length and
    # lp >= length + 128.  (The old full pad copied the entire source per
    # call — ~0.3 ms per oscilloscope window read at 1024 x 19k lanes.)
    np_lanes = max(-(-n // 128) * 128, lp)
    if np_lanes > n:
        x = jnp.pad(x, ((0, 0), (0, np_lanes - n)))

    ts = row_tile
    if s % ts != 0:
        ts = 1

    def kernel(starts_ref, x_ref, o_ref):
        t = pl.program_id(0)
        for r in range(ts):
            for k in range(w):
                st = starts_ref[(t * ts + r) * w + k]
                coarse = jnp.minimum((st // 128) * 128, np_lanes - lp)
                fine = st - coarse
                row = x_ref[r, pl.ds(pl.multiple_of(coarse, 128), lp)]
                rolled = pltpu.roll(row.reshape(1, lp), -fine, 1)
                o_ref[r, k * length : (k + 1) * length] = rolled[0, :length]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s // ts,),
        in_specs=[pl.BlockSpec((ts, np_lanes), lambda t, sref: (t, 0))],
        out_specs=pl.BlockSpec((ts, w * length), lambda t, sref: (t, 0)),
    )
    flat = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, w * length), x.dtype),
        interpret=bool(os.environ.get("OPENMETERS_PALLAS_INTERPRET")),
    )(starts.reshape(-1), x)
    return flat.reshape(s, w, length)
