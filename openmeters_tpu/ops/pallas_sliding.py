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


BIN_TILE = 512  # lane width of one bin tile in the tiled kernel


def fits_vmem(hop: int, bins: int) -> bool:
    """Whole-row kernel: the ``[hop, bins]`` re+im update constants must
    fit the scoped-VMEM budget."""
    return 2 * 4 * hop * bins <= 6 * 2**20


def fused_supported(hop: int, bins: int) -> bool:
    """Small configs ride the whole-row kernel; larger ones need the
    bin-tiled grid, which requires the Nyquist bin on a tile boundary
    (every pow2 fft >= 1024)."""
    return fits_vmem(hop, bins) or (bins - 1) % 512 == 0


HALO = 8  # halo lanes per side; bounds the stencil reach (len(coeffs) - 1)


def _dot3(d_hi, d_lo, hi_ref, lo_ref):
    """bf16x3 matmul of a pre-split data operand against pre-split
    constants (~1e-6 relative): half the MXU passes of HIGHEST."""
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


def _pack(db, out_ref):
    code = jnp.clip(jnp.round((db - STORE_LO) * STORE_SCALE), 0.0, 65535.0)
    # biased i16 out (Mosaic has no u16 cast but i32->i16 is exact for
    # code-32768): halves the HBM write vs i32; the +32768 un-bias fuses
    # into the stack pass outside
    out_ref[:] = (code.astype(jnp.int32) - 32768).astype(jnp.int16)


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
            # slide, bounded by the 8-step exact re-anchor
            d_hi = d.astype(jnp.bfloat16).astype(jnp.float32)
            d_lo = d - d_hi

            dr = _dot3(d_hi, d_lo, updr_ref, updr_lo_ref)
            di = _dot3(d_hi, d_lo, updi_ref, updi_lo_ref)
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
                _pack(db, out_refs[k])
            else:
                out_refs[k][:] = p

        ofr_ref[:] = fr
        ofi_ref[:] = fi

    return kern


def _build_tiled(T, cols, hop, bins, n, coeffs, floor_db, emit_codes, BT):
    """Bin-tiled variant for configs whose ``[hop, bins]`` update constants
    exceed VMEM (the stock 16384/1024 spectrum): grid ``(n_bt, n_st)`` with
    the bin tile OUTER.  Unlike the whole-row kernel, the delta SPECTRA
    arrive precomputed (``sliding_hop`` runs a partial-input six-step MXU
    rFFT outside the kernel): for a 1024-sample delta against 8193 bins the
    dense ``[hop, bins]`` update matmul costs ~200 GFLOP-bf16 per hop while
    the O(n log n) transform costs ~30 — and the ``[S, bins]`` delta-spectrum
    read replaces the update-constant stream, so HBM traffic is unchanged.
    The kernel keeps the slide additions, phasor rotation, window stencil
    and power in VMEM.  The window stencil's cross-tile reach comes from
    8-lane halo states slid with halo slices of the same delta spectra; the
    hermitian edge fixes read the tile-0 / last-tile halos (their masks
    are on global lane indices, so they are no-ops elsewhere).

    Halo convention: ``hlo`` covers global bins ``[j*BT-HALO, j*BT)`` for
    tile ``j>0`` and bins ``[0, HALO)`` for tile 0 (= the hermitian lo
    edge); ``hhi`` covers bins ``[(j+1)*BT, (j+1)*BT+HALO)``.  For pow2
    ``bins-1`` divisible by BT, the Nyquist fix values live in the last
    tile's ``hlo``.
    """
    a0 = float(coeffs[0])
    halves = [0.5 * float(a) for a in coeffs[1:]]
    assert len(halves) < HALO
    assert (bins - 1) % BT == 0, "Nyquist must sit at lane 0 of a tile"

    def kern(ready_ref, fr_ref, fi_ref, *rest):
        d_refs = rest[: 2 * cols]  # (dr, di) per column
        (rotr_ref, roti_ref, dc_ref, norm_ref,
         hfr_ref, hfi_ref, rhr_ref, rhi_ref,
         gfr_ref, gfi_ref, rgr_ref, rgi_ref) = rest[2 * cols : 2 * cols + 12]
        hd_refs = rest[2 * cols + 12 : 2 * cols + 12 + 4 * cols]
        ofr_ref, ofi_ref = rest[2 * cols + 12 + 4 * cols : 2 * cols + 14 + 4 * cols]
        out_refs = rest[2 * cols + 14 + 4 * cols :]
        ready = ready_ref[0]
        fr = fr_ref[:]
        fi = fi_ref[:]
        hfr = hfr_ref[:]
        hfi = hfi_ref[:]
        gfr = gfr_ref[:]
        gfi = gfi_ref[:]
        rotr = rotr_ref[:]
        roti = roti_ref[:]
        rhr = rhr_ref[0:1]  # tile's rot row, repeated to an 8-sublane block
        rhi = rhi_ref[0:1]
        rgr = rgr_ref[0:1]
        rgi = rgi_ref[0:1]
        jt = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, BT), 1)
        glane = lane + jt * BT

        for k in range(cols):
            emit = jnp.int32(k) < ready

            def slide(sr, si, dr, di, rr, ri):
                tr = sr + dr
                ti = si + di
                nr = tr * rr - ti * ri
                ni = tr * ri + ti * rr
                return (
                    jnp.where(emit, nr, sr),
                    jnp.where(emit, ni, si),
                )

            fr, fi = slide(
                fr, fi, d_refs[2 * k][:], d_refs[2 * k + 1][:], rotr, roti
            )
            hfr, hfi = slide(
                hfr, hfi, hd_refs[4 * k][:], hd_refs[4 * k + 1][:], rhr, rhi
            )
            gfr, gfi = slide(
                gfr, gfi, hd_refs[4 * k + 2][:], hd_refs[4 * k + 3][:],
                rgr, rgi,
            )

            wr = a0 * fr
            wi = a0 * fi
            for j, half in enumerate(halves, start=1):
                lo_r = pltpu.roll(fr, j, 1)
                lo_i = pltpu.roll(fi, j, 1)
                hi_r = pltpu.roll(fr, BT - j, 1)  # roll by -j (mod BT)
                hi_i = pltpu.roll(fi, BT - j, 1)
                for e in range(j):
                    # local halo fill: lane e reads prev-tile bin
                    # j*BT + e - j  = hlo column HALO + e - j
                    m = lane == e
                    hc = HALO + e - j
                    lo_r = jnp.where(m, hfr[:, hc : hc + 1], lo_r)
                    lo_i = jnp.where(m, hfi[:, hc : hc + 1], lo_i)
                    # lane BT-j+e reads next-tile bin (j+1)*BT + e
                    m2 = lane == (BT - j + e)
                    hi_r = jnp.where(m2, gfr[:, e : e + 1], hi_r)
                    hi_i = jnp.where(m2, gfi[:, e : e + 1], hi_i)
                for e in range(j):
                    # hermitian lo edge (tile 0 only: hlo = bins [0, HALO))
                    m = glane == e
                    lo_r = jnp.where(m, hfr[:, j - e : j - e + 1], lo_r)
                    lo_i = jnp.where(m, -hfi[:, j - e : j - e + 1], lo_i)
                    # hermitian Nyquist edge: value bin bins-1-j+e.  With
                    # bins-1 on a tile boundary, lane bins-1 (e=0) sits at
                    # lane 0 of tile L — its value lives in that tile's
                    # prev-halo (column HALO-1-j) — while lanes bins-1-e
                    # (e>=1) sit at the TOP of tile L-1, where the value
                    # bin is in-tile at local lane BT-1-j+e.
                    m2 = glane == (bins - 1 - e)
                    if e == 0:
                        # tile L's hlo covers bins [bins-1-HALO, bins-1):
                        # bin bins-1-j -> column HALO-j
                        qr = hfr[:, HALO - j : HALO - j + 1]
                        qi = hfi[:, HALO - j : HALO - j + 1]
                    else:
                        # tile L-1 starts at bins-1-BT: bin bins-1-j+e ->
                        # local lane BT-j+e
                        qr = fr[:, BT - j + e : BT - j + e + 1]
                        qi = fi[:, BT - j + e : BT - j + e + 1]
                    hi_r = jnp.where(m2, qr, hi_r)
                    hi_i = jnp.where(m2, -qi, hi_i)
                wr = wr + half * (lo_r + hi_r)
                wi = wi + half * (lo_i + hi_i)

            # DC correction: mean = post-slide bin 0 / n.  dc_corr is
            # nonzero only at bins [0, len(coeffs)) (tile 0), where hlo
            # column 0 IS bin 0; elsewhere dc block is all zeros.
            mean = hfr[:, 0:1] * (1.0 / n)
            wr = wr - mean * dc_ref[:]
            p = (wr * wr + wi * wi) * norm_ref[:]
            if emit_codes:
                db = jnp.maximum(
                    jnp.log(jnp.maximum(p, 1e-45)) * LN_TO_DB, floor_db
                )
                _pack(db, out_refs[k])
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
    out_dtype = jnp.int16 if emit_codes else jnp.float32
    # host-side bf16 hi/lo split of the update matrices (the data operand
    # splits in-kernel)
    updr_hi = updr.astype(jnp.bfloat16).astype(jnp.float32)
    updi_hi = updi.astype(jnp.bfloat16).astype(jnp.float32)

    if fits_vmem(hop, bins):
        kern = _build(T, cols, hop, bins, n, coeffs, floor_db, emit_codes)
        row = pl.BlockSpec((1, bins), lambda i, *_: (0, 0))
        tile = pl.BlockSpec((T, bins), lambda i, *_: (i, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(sp // T,),
            in_specs=[
                tile, tile,
                *[
                    pl.BlockSpec((T, hop), lambda i, *_: (i, 0))
                    for _ in range(cols)
                ],
                *[
                    pl.BlockSpec((hop, bins), lambda i, *_: (0, 0))
                    for _ in range(4)
                ],
                row, row, row, row,
            ],
            out_specs=[tile, tile, *[tile for _ in range(cols)]],
        )
        outs = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((sp, bins), jnp.float32),
                jax.ShapeDtypeStruct((sp, bins), jnp.float32),
                *[
                    jax.ShapeDtypeStruct((sp, bins), out_dtype)
                    for _ in range(cols)
                ],
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)  # stream tiles independent
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

    # ---- bin-tiled path (large-FFT configs) ----
    BT = BIN_TILE
    assert (bins - 1) % BT == 0, (bins, BT)
    n_bt = (bins + BT - 1) // BT
    bpad = n_bt * BT - bins

    def padb(x):
        return jnp.pad(x, ((0, 0), (0, bpad))) if bpad else x

    # the sliding state is STORED padded to the tile grid
    # (SlidingSTFT.store_bins) so steady-state hops move no pad copies
    assert fr.shape[1] in (bins, n_bt * BT), fr.shape
    frp = padb(fr) if fr.shape[1] == bins else fr
    fip = padb(fi) if fi.shape[1] == bins else fi
    rotp, rotip = padb(rotr), padb(roti)
    dcp, normp = padb(dc_corr), padb(norm)

    # delta SPECTRA via the partial-input six-step rFFT (in_len = hop
    # promises the zero pad): ~6x fewer MXU FLOPs than the dense
    # [hop, bins] update matmuls the kernel used to run, at the bf16x3
    # error class the in-kernel dots had (bounded by the exact re-anchor)
    from openmeters_tpu.ops.fft import rfft_mxu

    dspecs = []
    for k in range(cols):
        spec = rfft_mxu(
            d_cols[k], n, precision=jax.lax.Precision.HIGH, in_len=hop
        )
        dspecs.append(padb(jnp.real(spec)))
        dspecs.append(padb(jnp.imag(spec)))

    def halo_state(x):
        # hlo[j] = bins [j*BT-HALO, j*BT) (tile 0: the hermitian lo edge
        # bins [0, HALO)); hhi[j] = bins [(j+1)*BT, +HALO) (last: zeros).
        # Tiles stack along ROWS ([n_bt*sp, HALO]) — a HALO-wide lane block
        # is only legal when it spans the whole array width.
        lo = jnp.concatenate(
            [x[:, :HALO]]
            + [x[:, j * BT - HALO : j * BT] for j in range(1, n_bt)],
            axis=0,
        )
        hi = jnp.concatenate(
            [x[:, (j + 1) * BT : (j + 1) * BT + HALO]
             for j in range(n_bt - 1)]
            + [jnp.zeros((x.shape[0], HALO), x.dtype)],
            axis=0,
        )
        return lo, hi

    hfr, gfr = halo_state(frp)
    hfi, gfi = halo_state(fip)

    # halo slices of the delta spectra, same [n_bt*sp, HALO] tiling as the
    # halo states they slide
    hdspecs = []
    for k in range(cols):
        hdr, gdr = halo_state(dspecs[2 * k])
        hdi, gdi = halo_state(dspecs[2 * k + 1])
        hdspecs += [hdr, hdi, gdr, gdi]

    def halo_row1(v):
        # [n_bt*8, HALO] from a [1, bins_pad] row (each tile's row repeated
        # to a full 8-sublane block — a 1-sublane block is not addressable
        # mid-array)
        lo = jnp.concatenate(
            [v[:, :HALO]]
            + [v[:, j * BT - HALO : j * BT] for j in range(1, n_bt)],
            axis=0,
        )
        hi = jnp.concatenate(
            [v[:, (j + 1) * BT : (j + 1) * BT + HALO]
             for j in range(n_bt - 1)]
            + [jnp.ones((1, HALO), v.dtype)],
            axis=0,
        )
        return jnp.repeat(lo, 8, axis=0), jnp.repeat(hi, 8, axis=0)

    rhr, rgr = halo_row1(rotp)
    rhi, rgi = halo_row1(rotip)

    kern = _build_tiled(
        T, cols, hop, bins, n, coeffs, floor_db, emit_codes, BT
    )
    tile = pl.BlockSpec((T, BT), lambda j, i, *_: (i, j))
    row = pl.BlockSpec((1, BT), lambda j, i, *_: (0, j))
    n_st = sp // T
    hstate = pl.BlockSpec((T, HALO), lambda j, i, *_: (j * n_st + i, 0))
    hrow1 = pl.BlockSpec((8, HALO), lambda j, i, *_: (j, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        # bin tile OUTER, stream tile inner (kept from the constant-
        # streaming formulation; both axes are parallel)
        grid=(n_bt, sp // T),
        in_specs=[
            tile, tile,
            *[tile for _ in range(2 * cols)],
            row, row, row, row,
            hstate, hstate, hrow1, hrow1,
            hstate, hstate, hrow1, hrow1,
            *[hstate for _ in range(4 * cols)],
        ],
        out_specs=[tile, tile, *[tile for _ in range(cols)]],
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((sp, n_bt * BT), jnp.float32),
            jax.ShapeDtypeStruct((sp, n_bt * BT), jnp.float32),
            *[
                jax.ShapeDtypeStruct((sp, n_bt * BT), out_dtype)
                for _ in range(cols)
            ],
        ],
        # the sliding state updates in place: each grid step reads its
        # input tile before writing the aliased output tile (indices are
        # post-scalar-prefetch: 1 = frp -> out 0, 2 = fip -> out 1)
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=_interpret(),
    )(
        jnp.asarray([ready], jnp.int32).astype(jnp.int32),
        frp, fip, *dspecs,
        rotp, rotip, dcp, normp,
        hfr, hfi, rhr, rhi,
        gfr, gfi, rgr, rgi,
        *hdspecs,
    )
    # state returns at the caller's store width; outputs slice to real bins
    store_w = fr.shape[1]
    fr2, fi2 = outs[0][:s, :store_w], outs[1][:s, :store_w]
    out = jnp.stack([o[:s, :bins] for o in outs[2:]], axis=1)
    if emit_codes:
        out = (out.astype(jnp.int32) + 32768).astype(jnp.uint16)
    return fr2, fi2, out
