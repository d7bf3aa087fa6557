"""Fused Pallas TPU kernel for the oscilloscope's dense correlation search.

``dots[s, o] = Σ_k work[s, o + shift[s] + k] · tmpl[s, k]`` for offsets
``o ∈ [0, out_len)`` — the stable trigger's sliding normalized-correlation
numerator (reference ``oscilloscope/processor.rs:441-475``; here the dense
FFT superset of its coarse-to-fine CPU search).

The XLA formulation (six-step rfft of [work; template], conj-product, phase
rotation, six-step irfft) is HBM-bound: every stage of both transforms
materializes ``[rows, nfft]``-class intermediates plus pair-packing
reshapes, mirrors, pads and layout copies — measured ~3.9 ms of an 8.2 ms
oscilloscope step at S=1024.  This kernel runs the WHOLE chain in VMEM per
stream tile, with every matmul at FULL MXU width:

- the complex re/im planes live LANE-PACKED (``[.., 128] = [re(0..63) |
  im(0..63)]``), so each six-step stage is ONE ``dot_general`` with
  K=128/N=128 instead of four K=64/N=64 quarter-dots (the MXU processes a
  K=64 or N=64 dot in the same cycles as a K=128/N=128 one — half the
  array idles);
- complex multiplies (twiddle, conj-product, phase anchor) use a single
  half-width ``pltpu.roll`` (lane half-swap, direction-free at shift 64)
  plus two full-width FMAs;
- real inputs compute only the ONE-SIDED ``k1 < N1/2`` half of the
  spectrum grid (the packed lane dim is exactly ``[re | im]`` of that
  half), the Nyquist bin as a masked reduction;
- the inverse is the real ``2·Re Σ'`` one-sided sum (DC halved, the
  Nyquist term an explicit ``(-1)^q`` rank-1 correction), computing only
  the ``ceil(out_len/128)`` needed output column groups; the final
  ``[q, r] -> [r, q]`` transpose happens on the XLA side (a cheap HBM
  copy) instead of per-tile in VMEM.

Matmuls run at ``Precision.HIGHEST`` (6 MXU passes, full f32) by default:
bf16x3-class dots leave ~2^-17 relative error on the spectral products,
which the inverse DFT's cancellation amplifies to ~3e-3 of the correlation
peak — measured, enough to jitter the trigger argmax and swamp the
parabolic refinement for low-f0 streams.  Full f32 lands at ~1e-6 of the
peak.  Callers that re-verify the peak exactly (local rescore) may pass
``precision=HIGH`` for 3-pass dots.

Non-TPU backends fall back to the XLA path in the caller;
``OPENMETERS_PALLAS_INTERPRET=1`` runs this kernel in interpret mode for
CPU parity tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openmeters_tpu.ops.pallas_sliding import _interpret, pallas_enabled  # noqa: F401


@functools.lru_cache(maxsize=None)
def _factors(n: int) -> tuple[int, int]:
    """n = n1 * n2 with n1 >= n2 (n1 is the lane dim of the input tile)."""
    assert n & (n - 1) == 0 and n >= 1024, f"pow2 >= 1024 required: {n}"
    lg = n.bit_length() - 1
    n1 = 1 << ((lg + 1) // 2)
    return n1, n // n1


@functools.lru_cache(maxsize=None)
def _consts(n: int, r_cap: int):
    """Host DFT constants (float32), packed for full-width dots.

    Forward (input ``A[n2, n1] = x[n1 + N1*n2]``), one-sided ``k1 < h1``:
      M2[n2, 2k2]   = [cos | -sin](2π n2 k2 / N2)     (stage 1, K=n2)
      TA/TB[n1,2k2] = packed twiddle e^{-2πi n1 k2/N} (roll-FMA pair)
      M1[n1, 2k1]   = [cos | -sin](2π n1 k1 / N1)     (stage 2 quad-dot)
    Inverse (input the packed [k2, re|im(k1)] grid; output y[q + N1*r]):
      G1[2k1, 2q] = [[cos; -sin] | [sin; cos]](2π k1 q / N1)
      TWIC/TWIS[k2, q] = cos/sin(2π k2 q / N)
      G2[2k2, r] = 2/N · [cos; -sin](2π k2 r / N2), r < r_cap
    """
    n1, n2 = _factors(n)
    h1 = n1 // 2

    a2 = 2.0 * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2
    m2 = np.concatenate([np.cos(a2), -np.sin(a2)], axis=1)  # [n2, 2*n2]

    atw = 2.0 * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n
    twc, tws = np.cos(atw), -np.sin(atw)
    ta = np.concatenate([twc, twc], axis=1)  # [n1, 2*n2]
    tb = np.concatenate([-tws, tws], axis=1)

    a1 = 2.0 * np.pi * np.outer(np.arange(n1), np.arange(h1)) / n1
    m1 = np.concatenate([np.cos(a1), -np.sin(a1)], axis=1)  # [n1, 2*h1]

    g1 = 2.0 * np.pi * np.outer(np.arange(h1), np.arange(n1)) / n1
    g1c, g1s = np.cos(g1), np.sin(g1)
    g_re = np.concatenate([g1c, -g1s], axis=0)  # [2*h1, n1]
    g_im = np.concatenate([g1s, g1c], axis=0)
    g1cat = np.concatenate([g_re, g_im], axis=1)  # [2*h1, 2*n1]

    twi = 2.0 * np.pi * np.outer(np.arange(n2), np.arange(n1)) / n
    twic, twis = np.cos(twi), np.sin(twi)

    g2 = 2.0 * np.pi * np.outer(np.arange(n2), np.arange(r_cap)) / n2
    g2cat = (2.0 / n) * np.concatenate([np.cos(g2), -np.sin(g2)], axis=0)

    # DC bin (k1 = 0, k2 = 0) half-weighted for the 2·Re one-sided inverse:
    # lanes 0 (re) and h1 (im) of sublane k2 = 0
    dcm = np.ones((n2, 2 * h1))
    dcm[0, 0] = dcm[0, h1] = 0.5

    alt = (1.0 - 2.0 * (np.arange(n1) % 2)).reshape(1, n1, 1)  # (-1)^{n1}
    sgq = (1.0 - 2.0 * (np.arange(n1) % 2)).reshape(1, n1, 1)  # (-1)^{q}

    return tuple(
        m.astype(np.float32)
        for m in (m2, ta, tb, m1, g1cat, twic, twis, g2cat, dcm, alt, sgq)
    )


def _dot(x, m, dims, precision):
    return jax.lax.dot_general(
        x, m, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _half_swap(x):
    """Swap the two 64-lane halves of a 128-lane dim (direction-free)."""
    if _interpret():
        return jnp.roll(x, x.shape[-1] // 2, axis=-1)
    return pltpu.roll(x, x.shape[-1] // 2, axis=x.ndim - 1)


def _kernel(n: int, n1: int, n2: int, r_cap: int, T: int,
            rows_w: int, rows_t: int, precision):
    dn_mid = (((1,), (0,)), ((), ()))  # contract dim-1 of [T, a, b]
    dn_lane = (((2,), (0,)), ((), ()))  # contract dim-2
    h1 = n1 // 2

    def fwd(a_ref, rows, m2, ta, tb, m1, alt):
        """Real [T, n2, n1] tile -> lane-packed one-sided spectrum
        ``z[T, k2, re|im(k1)]`` + the Nyquist bin [T, 1].  ``rows``: input
        rows beyond this n2 index are known zero (skipped)."""
        a = a_ref[:, :rows, :]
        # stage 1: one K=rows, N=2*n2 dot -> [T, n1, re(k2)|im(k2)]
        b = _dot(a, m2[:rows], dn_mid, precision)
        # twiddle: complex mult as roll + 2 full-width FMAs
        c = b * ta + _half_swap(b) * tb
        # Nyquist bin (k1 = h1, k2 = 0): F1[n1, h1] = (-1)^{n1}
        nyv = jnp.sum(c * alt, axis=1)  # [T, 2*n2]
        ny_re = nyv[:, 0:1]
        ny_im = nyv[:, n2 : n2 + 1]
        # stage 2 quad-dot: [T, n1, 2n2] x [n1, 2h1] -> [T, 2n2, 2h1]
        # sublane halves = (re|im of c), lane halves = (cos|sin of F1)
        q = _dot(c, m1, dn_mid, precision)
        qt, qb = q[:, :n2, :], q[:, n2:, :]
        # z_re = d_rr - d_ii, z_im = d_ri + d_ir, packed via one half-swap
        sgn = jnp.concatenate(
            [jnp.full((1, 1, h1), -1.0, jnp.float32),
             jnp.full((1, 1, h1), 1.0, jnp.float32)], axis=2
        )
        z = qt + sgn * _half_swap(qb)
        return z, ny_re, ny_im

    def kern(*refs):
        (w_ref, t_ref, shift_ref,
         m2, ta, tb, m1, g1cat, twic, twis, g2cat, dcm, alt, sgq,
         out_ref, ny_ref) = refs

        w, wn_re, wn_im = fwd(w_ref, rows_w, m2[:], ta[:], tb[:], m1[:], alt[:])
        t, tn_re, tn_im = fwd(t_ref, rows_t, m2[:], ta[:], tb[:], m1[:], alt[:])

        # P = W · conj(T): with packed lanes, U = W*T = [wr*tr | wi*ti],
        # V = swap(W)*T = [wi*tr | wr*ti]; U + swap(U) = [p_re | p_re],
        # V - swap(V) = [p_im | -p_im]  ->  mask-combine into [p_re | p_im]
        u = w * t
        v = _half_swap(w) * t
        a1 = u + _half_swap(u)
        a2 = v - _half_swap(v)  # [p_im | -p_im]
        lane = jax.lax.broadcasted_iota(jnp.int32, (T, n2, n1), 2)
        lo = (lane < h1).astype(jnp.float32)
        p = a1 * lo - a2 * (1.0 - lo)

        # per-stream anchor e^{+2πik·shift/n} on the packed grid:
        # k = k1*n2 + k2 with k1 = lane mod h1; int32-exact angle reduction
        k1g = jax.lax.rem(lane, h1)
        k2g = jax.lax.broadcasted_iota(jnp.int32, (T, n2, n1), 1)
        k = k1g * n2 + k2g
        shift = shift_ref[:].reshape(T, 1, 1).astype(jnp.int32)
        m = (k * shift) % n  # python-mod semantics: non-negative
        ang = (2.0 * np.pi / n) * m.astype(jnp.float32)
        # y = p * e^{+iθ}: lane<h1 carries re (cos·p_re - sin·p_im),
        # lane>=h1 carries im (cos·p_im + sin·p_re)
        pb = (2.0 * (1.0 - lo) - 1.0) * jnp.sin(ang)
        y = (p * jnp.cos(ang) + _half_swap(p) * pb) * dcm[:]

        # Nyquist product: phase there is (-1)^shift
        pn_re = wn_re * tn_re + wn_im * tn_im  # [T, 1]
        sgn = (1 - 2 * (shift_ref[:] & 1)).astype(jnp.float32)
        ny_ref[:] = pn_re * sgn / n

        # inverse stage 1: [T, k2, 2h1] x [2h1, 2n1] -> [T, k2, g_re|g_im]
        g = _dot(y, g1cat[:], dn_lane, precision)
        g_re, g_im = g[:, :, :n1], g[:, :, n1:]
        h_re = g_re * twic[:] - g_im * twis[:]
        h_im = g_re * twis[:] + g_im * twic[:]
        # inverse stage 2 (stacked-K): [T, 2k2, q] x [2k2, r] -> [T, q, r]
        h2 = jnp.concatenate([h_re, h_im], axis=1)
        o = _dot(h2, g2cat[:], dn_mid, precision)
        # + Nyquist rank-1 correction Re(Y_ny)·(-1)^q / n
        out_ref[:] = o + ny_ref[:].reshape(T, 1, 1) * sgq[:]

    return kern


def corr_dots(work, tmpl, shift, nfft: int, out_len: int, row_tile: int = 16,
              precision=jax.lax.Precision.HIGHEST):
    """Fused sliding correlation: returns ``[S, out_len]`` with
    ``out[s, o] = Σ_k work[s, o + shift[s] + k] · tmpl[s, k]`` (circular over
    ``nfft``; exact while every read index stays < nfft, the caller's
    static-shape invariant).

    work/tmpl: ``[S, L]`` float32 rows (zero-padded to nfft internally);
    shift: ``[S]`` int32 anchor (may be negative).
    """
    s, lw = work.shape
    lt = tmpl.shape[1]
    n1, n2 = _factors(nfft)
    r_cap = -(-out_len // n1)
    T = min(row_tile, s)
    rows = -(-s // T) * T
    rows_w = min(-(-lw // n1), n2)
    rows_t = min(-(-lt // n1), n2)

    def grid3(x):
        pad = [(0, rows - s), (0, nfft - x.shape[1])]
        x = jnp.pad(x, pad) if any(p[1] for p in pad) else x
        return x.reshape(rows, n2, n1)

    w3 = grid3(work.astype(jnp.float32))
    t3 = grid3(tmpl.astype(jnp.float32))
    sh = jnp.pad(shift.astype(jnp.int32), (0, rows - s)).reshape(rows, 1)

    consts = _consts(nfft, r_cap)
    tile3 = pl.BlockSpec((T, n2, n1), lambda i: (i, 0, 0))
    const_spec = [
        pl.BlockSpec(c.shape, lambda i, nd=c.ndim: (0,) * nd) for c in consts
    ]
    out, _ny = pl.pallas_call(
        _kernel(nfft, n1, n2, r_cap, T, rows_w, rows_t, precision),
        grid=(rows // T,),
        in_specs=[tile3, tile3, pl.BlockSpec((T, 1), lambda i: (i, 0)),
                  *const_spec],
        out_specs=[pl.BlockSpec((T, n1, r_cap), lambda i: (i, 0, 0)),
                   pl.BlockSpec((T, 1), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((rows, n1, r_cap), jnp.float32),
                   jax.ShapeDtypeStruct((rows, 1), jnp.float32)],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2**20,
        ),
    )(w3, t3, sh, *[jnp.asarray(c) for c in consts])
    # [rows, q, r] -> flat index q + n1*r: one cheap XLA transpose copy
    out = jnp.swapaxes(out, 1, 2).reshape(rows, r_cap * n1)
    return out[:s, :out_len]
