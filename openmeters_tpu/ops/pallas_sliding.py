"""Fused Pallas TPU kernel for the sliding-DFT hop.

The XLA sliding path (ops/sliding_stft.py) is HBM-bound: every hop runs
~20 elementwise passes over the ``[S, bins]`` spectrum state per column
(phasor rotation, frequency-domain window stencil, DC removal, power, dB,
pack), each materializing to HBM.  This kernel keeps the state in VMEM for
the whole hop: one read of (re, im), all ``cols`` slide+window+power
evaluations in registers/VMEM, one write of the new state and the output
columns.  The delta matmuls ``[T, hop] x [hop, bins]`` run on the MXU inside
the same kernel.

Mosaic constraints shaped the formulation (NOTES.md round-1 item 7):

- no reshapes across lanes — the hermitian window stencil uses
  ``pltpu.roll`` along the lane axis plus per-edge masked fixes instead of
  the XLA path's concatenations;
- the odd ``bins = N/2 + 1`` lane count is left to Mosaic's internal
  padding (blocks cover the full lane extent);
- the hop's column count is a static unroll (``cols_cap`` is 4 for the
  stock 2048/64/256 config).

The kernel is exact w.r.t. the XLA path's math (same operations, same
order per column); the periodic exact re-anchor lives outside as an
algebraic carry substitution (see ``SlidingSTFT._step_fused``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_TO_DB = 4.3429448  # matches utils/level.py / reference level.rs:5
STORE_LO = -144.0  # spectrogram u16 code domain (processor.rs:63-68)
STORE_SCALE = 65535.0 / 156.0


def pallas_enabled() -> bool:
    if os.environ.get("OPENMETERS_NO_PALLAS"):
        return False
    if os.environ.get("OPENMETERS_PALLAS_INTERPRET"):
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing
        return False


def _interpret() -> bool:
    return bool(os.environ.get("OPENMETERS_PALLAS_INTERPRET"))


def _build(T, cols, hop, bins, n, coeffs, floor_db, emit_codes):
    a0 = float(coeffs[0])
    halves = [0.5 * float(a) for a in coeffs[1:]]

    def kern(ready_ref, fr_ref, fi_ref, *rest):
        # rest = cols delta refs, updr, updi, rotr, roti, dc, norm,
        #        ofr, ofi, cols out refs   (all 2D — Mosaic rejects 3D
        #        block slicing as an unsupported shape cast)
        d_refs = rest[:cols]
        (updr_ref, updr_lo_ref, updi_ref, updi_lo_ref, rotr_ref, roti_ref,
         dc_ref, norm_ref, ofr_ref, ofi_ref) = rest[cols : cols + 10]
        out_refs = rest[cols + 10 :]
        ready = ready_ref[0]
        fr = fr_ref[:]
        fi = fi_ref[:]
        rotr = rotr_ref[:]
        roti = roti_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, bins), 1)

        for k in range(cols):
            d = d_refs[k][:]
            # f32-accurate slide via bf16x3 (hi/lo split of the deltas
            # against host-pre-split update matrices): ~1e-6 relative per
            # slide, bounded by the 8-step exact re-anchor — half the MXU
            # passes of precision=HIGHEST
            d_hi = d.astype(jnp.bfloat16).astype(jnp.float32)
            d_lo = d - d_hi

            def b3(hi_ref, lo_ref):
                dn = (((1,), (0,)), ((), ()))
                return (
                    jax.lax.dot_general(
                        d_hi, hi_ref[:], dimension_numbers=dn,
                        preferred_element_type=jnp.float32,
                    )
                    + jax.lax.dot_general(
                        d_hi, lo_ref[:], dimension_numbers=dn,
                        preferred_element_type=jnp.float32,
                    )
                    + jax.lax.dot_general(
                        d_lo, hi_ref[:], dimension_numbers=dn,
                        preferred_element_type=jnp.float32,
                    )
                )

            dr = b3(updr_ref, updr_lo_ref)
            di = b3(updi_ref, updi_lo_ref)
            tr = fr + dr
            ti = fi + di
            nfr = tr * rotr - ti * roti
            nfi = tr * roti + ti * rotr
            emit = jnp.int32(k) < ready
            fr = jnp.where(emit, nfr, fr)
            fi = jnp.where(emit, nfi, fi)

            # frequency-domain cosine-sum window: stencil with hermitian
            # edge reflection (real input: F[-k] = conj(F[k]))
            wr = a0 * fr
            wi = a0 * fi
            for j, half in enumerate(halves, start=1):
                lo_r = pltpu.roll(fr, j, 1)
                lo_i = pltpu.roll(fi, j, 1)
                hi_r = pltpu.roll(fr, bins - j, 1)  # roll by -j (mod bins)
                hi_i = pltpu.roll(fi, bins - j, 1)
                for e in range(j):
                    m = lane == e
                    lo_r = jnp.where(m, fr[:, j - e : j - e + 1], lo_r)
                    lo_i = jnp.where(m, -fi[:, j - e : j - e + 1], lo_i)
                    m2 = lane == (bins - 1 - e)
                    hi_r = jnp.where(
                        m2, fr[:, bins - 1 - j + e : bins - j + e], hi_r
                    )
                    hi_i = jnp.where(
                        m2, -fi[:, bins - 1 - j + e : bins - j + e], hi_i
                    )
                wr = wr + half * (lo_r + hi_r)
                wi = wi + half * (lo_i + hi_i)

            mean = fr[:, 0:1] * (1.0 / n)
            wr = wr - mean * dc_ref[:]
            p = (wr * wr + wi * wi) * norm_ref[:]
            if emit_codes:
                db = jnp.maximum(
                    jnp.log(jnp.maximum(p, 1e-45)) * LN_TO_DB, floor_db
                )
                code = jnp.clip(
                    jnp.round((db - STORE_LO) * STORE_SCALE), 0.0, 65535.0
                )
                # biased i16 out (Mosaic has no u16 cast but i32->i16 is
                # exact for code-32768): halves the HBM write vs i32; the
                # +32768 un-bias fuses into the stack pass outside
                out_refs[k][:] = (code.astype(jnp.int32) - 32768).astype(
                    jnp.int16
                )
            else:
                out_refs[k][:] = p

        ofr_ref[:] = fr
        ofi_ref[:] = fi

    return kern


@functools.partial(
    jax.jit,
    static_argnames=(
        "cols", "hop", "bins", "n", "coeffs", "floor_db", "emit_codes",
    ),
)
def sliding_hop(
    ready, fr, fi, deltas, updr, updi, rotr, roti, dc_corr, norm,
    *, cols: int, hop: int, bins: int, n: int, coeffs: tuple,
    floor_db: float, emit_codes: bool,
):
    """One fused hop.

    Args:
      ready: scalar int32 — columns to emit this hop.
      fr, fi: ``[S, bins]`` sliding spectrum state.
      deltas: ``[S, cols, hop]`` per-column sample deltas.
      updr/updi: ``[hop, bins]`` DFT update matrices.
      rotr/roti/dc_corr/norm: ``[1, bins]`` rows.

    Returns ``(fr2, fi2, out)`` with ``out`` ``[S, cols, bins]`` u16 codes
    (``emit_codes``) or f32 power.
    """
    s = fr.shape[0]
    T = min(128, s)
    pad = (-s) % T
    if pad:
        fr = jnp.pad(fr, ((0, pad), (0, 0)))
        fi = jnp.pad(fi, ((0, pad), (0, 0)))
        deltas = jnp.pad(deltas, ((0, pad), (0, 0), (0, 0)))
    sp = s + pad
    d_cols = [deltas[:, k, :] for k in range(cols)]

    kern = _build(T, cols, hop, bins, n, coeffs, floor_db, emit_codes)
    out_dtype = jnp.int16 if emit_codes else jnp.float32
    row = pl.BlockSpec((1, bins), lambda i, *_: (0, 0))
    tile = pl.BlockSpec((T, bins), lambda i, *_: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(sp // T,),
        in_specs=[
            tile, tile,
            *[pl.BlockSpec((T, hop), lambda i, *_: (i, 0)) for _ in range(cols)],
            *[pl.BlockSpec((hop, bins), lambda i, *_: (0, 0)) for _ in range(4)],
            row, row, row, row,
        ],
        out_specs=[tile, tile, *[tile for _ in range(cols)]],
    )
    # host-side bf16 hi/lo split of the update matrices (the data operand
    # splits in-kernel)
    updr_hi = updr.astype(jnp.bfloat16).astype(jnp.float32)
    updi_hi = updi.astype(jnp.bfloat16).astype(jnp.float32)
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((sp, bins), jnp.float32),
            jax.ShapeDtypeStruct((sp, bins), jnp.float32),
            *[jax.ShapeDtypeStruct((sp, bins), out_dtype) for _ in range(cols)],
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)  # stream tiles are independent
        ),
        interpret=_interpret(),
    )(
        jnp.asarray([ready], jnp.int32).astype(jnp.int32),
        fr, fi, *d_cols,
        updr_hi, updr - updr_hi, updi_hi, updi - updi_hi,
        rotr, roti, dc_corr, norm,
    )
    fr2, fi2 = outs[0], outs[1]
    out = jnp.stack(outs[2:], axis=1)
    if emit_codes:
        # un-bias the i16 codes; XLA fuses this into the stack pass
        out = (out.astype(jnp.int32) + 32768).astype(jnp.uint16)
    if pad:
        fr2, fi2, out = fr2[:s], fi2[:s], out[:s]
    return fr2, fi2, out
