"""Fused Pallas TPU kernel for the sliding-analytic reassigned hop.

The XLA formulation (ops/sliding_reassigned.py) is HBM-bound: per column it
reads and writes all eight ``[S, bins]`` sliding-state arrays and runs the
stencil/correction chains as separate fusion islands around the delta
matmuls.  This kernel keeps the whole state in VMEM for the hop: one read
of the eight states, all ``cols`` slide + stencil + correction evaluations
in VMEM, one write of the new states and the per-column
freq/time/power outputs.  The ``[T, 2*hop] x [2*hop, 4*bins]`` delta
matmuls run on the MXU inside the kernel at bf16x3 (hi/lo split of the
deltas against host-pre-split update matrices — the proven
ops/pallas_sliding.py recipe, half the passes of precision=HIGHEST).

Mosaic constraints (NOTES.md): 2D blocks only (per-column delta inputs and
per-column outputs are separate refs), static-shift ``pltpu.roll`` along
lanes for the window stencils with per-edge masked fixes, and the analytic
spectrum's edge reflection (U[-m] and U[n/2+m] combine the hermitian raw
and Hilbert halves with flipped imaginary signs) implemented as masked
lane writes.

The periodic exact re-anchor stays outside as an algebraic carry
substitution: column 0's update is affine, so substituting

    u' = conj(rot) * U0_exact - dU0
    v' = conj(rot) * V0_exact + hop * u' - dV0

makes the branch-free kernel land exactly on the freshly computed spectra
(see SlidingReassigned.step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openmeters_tpu.ops.pallas_sliding import _interpret, pallas_enabled  # noqa: F401

_STATE = 8  # uxr uxi uhr uhi vxr vxi vhr vhi


def _build(T, cols, hop, bins, n, coeffs, inv_2pi, inv_hop, latency_hops,
           zpf: int = 1):
    import numpy as np

    a0 = float(coeffs[0])
    halves = [0.5 * float(c) for c in coeffs[1:]]
    gs = [np.pi * j * float(coeffs[j]) / n for j in range(1, len(coeffs))]
    # zero padding scales the stencil offsets: cos(2*pi*j*m/n) shifts a
    # length-(n*zpf) transform by +-(zpf*j) bins (sliding_reassigned.py)
    jzs = [zpf * j for j in range(1, len(coeffs))]

    def kern(ready_ref, *refs):
        st_refs = refs[:_STATE]
        dx_refs = refs[_STATE : _STATE + cols]
        dh_refs = refs[_STATE + cols : _STATE + 2 * cols]
        (updh_ref, updl_ref, rotr_ref, roti_ref, normq_ref, freqb_ref) = refs[
            _STATE + 2 * cols : _STATE + 2 * cols + 6
        ]
        out_refs = refs[_STATE + 2 * cols + 6 :]
        new_st_refs = out_refs[:_STATE]
        col_refs = out_refs[_STATE:]  # freq, time, pow per column

        ready = ready_ref[0]
        rotr = rotr_ref[:]
        roti = roti_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, bins), 1)

        st = [r[:] for r in st_refs]  # uxr uxi uhr uhi vxr vxi vhr vhi

        def b3(d):
            """[T, 2*hop] x [2*hop, 4*bins] bf16x3 matmul (hi/lo split of
            the deltas against host-pre-split f32 update matrices)."""
            d_hi = d.astype(jnp.bfloat16).astype(jnp.float32)
            d_lo = d - d_hi
            dn = (((1,), (0,)), ((), ()))
            out = jax.lax.dot_general(
                d_hi, updh_ref[:], dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            out = out + jax.lax.dot_general(
                d_hi, updl_ref[:], dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            out = out + jax.lax.dot_general(
                d_lo, updh_ref[:], dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            return (
                out[:, :bins],
                out[:, bins : 2 * bins],
                out[:, 2 * bins : 3 * bins],
                out[:, 3 * bins :],
            )

        def rotate(re, im):
            return re * rotr - im * roti, re * roti + im * rotr

        def ext_edges(xr, xi, hr, hi):
            """Stencil neighbor arrays for the complex spectrum
            Z = (xr - hi) + i(xi + hr) over bins [0, n/2], with analytic
            edge reflection Z[p<0] / Z[p>n/2] = (xr[m]+hi[m]) + i(hr[m]-xi[m])
            at the mirrored index m.  Returns per-j (lo_r, lo_i, hi_r, hi_i)."""
            er = xr - hi
            ei = xi + hr
            out = []
            for jz in jzs:
                lo_r = pltpu.roll(er, jz, 1)
                lo_i = pltpu.roll(ei, jz, 1)
                hi_r = pltpu.roll(er, bins - jz, 1)
                hi_i = pltpu.roll(ei, bins - jz, 1)
                for e in range(jz):
                    m = lane == e  # position p = e - jz < 0, mirror jz - e
                    src = slice(jz - e, jz - e + 1)
                    lo_r = jnp.where(m, xr[:, src] + hi[:, src], lo_r)
                    lo_i = jnp.where(m, hr[:, src] - xi[:, src], lo_i)
                    m2 = lane == (bins - 1 - e)  # p = half + jz - e
                    src2 = slice(bins - 1 - jz + e, bins - jz + e)
                    hi_r = jnp.where(m2, xr[:, src2] + hi[:, src2], hi_r)
                    hi_i = jnp.where(m2, hr[:, src2] - xi[:, src2], hi_i)
                out.append((lo_r, lo_i, hi_r, hi_i))
            return er, ei, out

        for k in range(cols):
            dUxr, dUxi, dVxr, dVxi = b3(dx_refs[k][:])
            dUhr, dUhi, dVhr, dVhi = b3(dh_refs[k][:])
            uxr, uxi, uhr, uhi, vxr, vxi, vhr, vhi = st
            nuxr, nuxi = rotate(uxr + dUxr, uxi + dUxi)
            nuhr, nuhi = rotate(uhr + dUhr, uhi + dUhi)
            nvxr, nvxi = rotate(
                vxr - hop * uxr + dVxr, vxi - hop * uxi + dVxi
            )
            nvhr, nvhi = rotate(
                vhr - hop * uhr + dVhr, vhi - hop * uhi + dVhi
            )
            emit = jnp.int32(k) < ready
            new = [nuxr, nuxi, nuhr, nuhi, nvxr, nvxi, nvhr, nvhi]
            st = [jnp.where(emit, nv, ov) for nv, ov in zip(new, st)]
            uxr, uxi, uhr, uhi, vxr, vxi, vhr, vhi = st

            ur, ui, u_edges = ext_edges(uxr, uxi, uhr, uhi)
            vr, vi, v_edges = ext_edges(vxr, vxi, vhr, vhi)

            br, bi = a0 * ur, a0 * ui
            tr, ti = a0 * vr, a0 * vi
            dr = jnp.zeros_like(br)
            di = jnp.zeros_like(bi)
            for h, g, (ulr, uli, uhr_, uhi_), (vlr, vli, vhr_, vhi_) in zip(
                halves, gs, u_edges, v_edges
            ):
                br = br + h * (ulr + uhr_)
                bi = bi + h * (uli + uhi_)
                tr = tr + h * (vlr + vhr_)
                ti = ti + h * (vli + vhi_)
                dr = dr - g * (uli - uhi_)
                di = di + g * (ulr - uhr_)

            pow_raw = br * br + bi * bi
            inv_pow = 1.0 / jnp.maximum(pow_raw, 1e-38)
            d_omega = -(di * br - dr * bi) * inv_pow
            col_refs[3 * k][:] = freqb_ref[:] + d_omega * inv_2pi
            col_refs[3 * k + 1][:] = (
                (tr * br + ti * bi) * inv_pow * inv_hop - latency_hops
            )
            col_refs[3 * k + 2][:] = pow_raw * normq_ref[:]

        for r, v in zip(new_st_refs, st):
            r[:] = v

    return kern


@functools.partial(
    jax.jit,
    static_argnames=(
        "cols", "hop", "bins", "n", "coeffs", "inv_2pi", "inv_hop",
        "latency_hops", "zpf",
    ),
)
def reassigned_sliding_hop(
    ready, states, dx, dh, upd, rotr, roti, normq, freqb,
    *, cols: int, hop: int, bins: int, n: int, coeffs: tuple,
    inv_2pi: float, inv_hop: float, latency_hops: float, zpf: int = 1,
):
    """One fused reassigned hop.

    Args:
      ready: scalar int32 — columns to emit.
      states: tuple of 8 ``[S, bins]`` arrays (uxr uxi uhr uhi vxr vxi vhr vhi).
      dx, dh: ``[S, cols, 2*hop]`` per-column (new|old) raw / Hilbert samples.
      upd: ``[2*hop, 4*bins]`` fused delta matrix (U_re|U_im|V_re|V_im).
      rotr/roti/normq/freqb: ``[1, bins]`` rows (normq = 0.25 * bin norm).

    Returns ``(new_states_tuple, freq, time, power)`` with per-column
    outputs ``[S, cols, bins]``.
    """
    s = states[0].shape[0]
    T = min(64, s)
    pad = (-s) % T
    if pad:
        states = tuple(jnp.pad(a, ((0, pad), (0, 0))) for a in states)
        dx = jnp.pad(dx, ((0, pad), (0, 0), (0, 0)))
        dh = jnp.pad(dh, ((0, pad), (0, 0), (0, 0)))
    sp = s + pad

    kern = _build(
        T, cols, hop, bins, n, coeffs, inv_2pi, inv_hop, latency_hops, zpf
    )
    row = pl.BlockSpec((1, bins), lambda i, *_: (0, 0))
    tile = pl.BlockSpec((T, bins), lambda i, *_: (i, 0))
    dtile = pl.BlockSpec((T, 2 * hop), lambda i, *_: (i, 0))
    upd_hi = upd.astype(jnp.bfloat16).astype(jnp.float32)
    upd_lo = upd - upd_hi
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(sp // T,),
        in_specs=[
            *[tile] * _STATE,
            *[dtile] * (2 * cols),
            pl.BlockSpec((2 * hop, 4 * bins), lambda i, *_: (0, 0)),
            pl.BlockSpec((2 * hop, 4 * bins), lambda i, *_: (0, 0)),
            row, row, row, row,
        ],
        out_specs=[*[tile] * _STATE, *[tile] * (3 * cols)],
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            *[jax.ShapeDtypeStruct((sp, bins), jnp.float32)] * _STATE,
            *[jax.ShapeDtypeStruct((sp, bins), jnp.float32)] * (3 * cols),
        ],
        # donate the 8 state buffers to the 8 new-state outputs: each grid
        # step reads its input tile before writing the aliased output tile,
        # and in-place update lets XLA drop the per-hop carry copies
        # (8 x [S, bins] HBM copies measured around this call)
        input_output_aliases={i + 1: i for i in range(_STATE)},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),  # stream tiles independent
            # eight states + twelve column outputs + the fused delta matrix
            # legitimately exceed the default 16 MB scoped budget at T=64;
            # v5e has 128 MB of VMEM
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(
        jnp.asarray([ready], jnp.int32),
        *states,
        *[dx[:, k, :] for k in range(cols)],
        *[dh[:, k, :] for k in range(cols)],
        upd_hi, upd_lo,
        rotr, roti, normq, freqb,
    )
    new_states = tuple(a[:s] if pad else a for a in outs[:_STATE])
    cols_out = outs[_STATE:]
    freq = jnp.stack([cols_out[3 * k] for k in range(cols)], axis=1)
    time = jnp.stack([cols_out[3 * k + 1] for k in range(cols)], axis=1)
    power = jnp.stack([cols_out[3 * k + 2] for k in range(cols)], axis=1)
    if pad:
        freq, time, power = freq[:s], time[:s], power[:s]
    return new_states, freq, time, power
