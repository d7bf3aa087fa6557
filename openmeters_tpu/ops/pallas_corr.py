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


def _sums_kernel(n: int, n1: int, n2: int, r_cap: int, T: int,
                 rows_w: int, rows_t: int, precision,
                 wcap: int | None = None, ring_lanes: int | None = None):
    """corr_dots + EXACT sliding window sums in one fused chain.

    The trigger search (dots) runs the packed six-step forward/inverse at
    ``precision``.  The sliding-sum normalizers (processor.rs:441-475) are
    NOT transforms at all here: an in-VMEM cumsum (0/1 triangular dots —
    exact at HIGHEST, the data mantissa splits across the passes) plus
    per-stream one-hot shift MATMULS (0/1 matrices, batched on the MXU —
    no serial per-row rolls) read ``cs[o+klen-1] - cs[o-1]`` for every
    searched lag, so ``sx``/``sxx`` are exact f32-class, 3 transforms
    cheaper than computing them as mask-correlations, and the region mean
    rides along as a one-hot prefix read.
    """
    dn_mid = (((1,), (0,)), ((), ()))
    dn_lane = (((2,), (0,)), ((), ()))
    dn_b = (((2,), (1,)), ((0,), (0,)))  # batched: contract my dim2, x dim1
    h1 = n1 // 2

    def kern(*refs):
        if wcap is not None:
            (starts_ref, w_ref, t_ref, klen_ref, wlen_ref, shift_ref,
             m2, ta, tb, m1, g1cat, twic, twis, g2cat, dcm, alt, sgq,
             out_d, out_sx, out_sxx, out_wm) = refs
            # in-kernel gather from the mirrored history ring: per row,
            # one 128-aligned contiguous read + a lane roll (the
            # window_rows recipe), masked to the wcap window — replaces
            # the XLA-side [S, wcap] work materialization, its pad, and
            # the tiled-layout copy feeding this kernel
            lp = rows_w * n1
            t0 = pl.program_id(0)
            rows_g = []
            for r in range(T):
                st = starts_ref[t0 * T + r]
                coarse = jnp.minimum((st // n1) * n1, ring_lanes - lp)
                fine = st - coarse
                row = w_ref[r, pl.ds(pl.multiple_of(coarse, n1), lp)]
                if _interpret():
                    rolled = jnp.roll(row.reshape(1, lp), -fine, axis=1)
                else:
                    rolled = pltpu.roll(row.reshape(1, lp), -fine, 1)
                rows_g.append(rolled)
            w2 = jnp.concatenate(rows_g, axis=0)  # [T, lp]
            lanei = jax.lax.broadcasted_iota(jnp.int32, (T, lp), 1)
            w2 = jnp.where(lanei < wcap, w2, 0.0)
            w3 = w2.reshape(T, rows_w, n1)
        else:
            (w_ref, t_ref, klen_ref, wlen_ref, shift_ref,
             m2, ta, tb, m1, g1cat, twic, twis, g2cat, dcm, alt, sgq,
             out_d, out_sx, out_sxx, out_wm) = refs

            w3 = w_ref[:]  # [T, rows_w, n1] — known-zero tail rows dropped
        # forward stage 1 per input (different K), then one batched rest
        b = jnp.concatenate(
            [_dot(w3, m2[:rows_w], dn_mid, precision),
             _dot(t_ref[:], m2[:rows_t], dn_mid, precision)], axis=0
        )
        c = b * ta[:] + _half_swap(b) * tb[:]
        nyv = jnp.sum(c * alt[:], axis=1)  # [2T, 2n2]
        ny_re = nyv[:, 0:1]
        ny_im = nyv[:, n2 : n2 + 1]
        q = _dot(c, m1[:], dn_mid, precision)
        qt, qb = q[:, :n2, :], q[:, n2:, :]
        sgn = jnp.concatenate(
            [jnp.full((1, 1, h1), -1.0, jnp.float32),
             jnp.full((1, 1, h1), 1.0, jnp.float32)], axis=2
        )
        z = qt + sgn * _half_swap(qb)
        zw, zt = z[:T], z[T:]

        lane = jax.lax.broadcasted_iota(jnp.int32, (T, n2, n1), 2)
        lo = (lane < h1).astype(jnp.float32)

        # P = W·conj(T) with the per-stream integer-exact phase anchor
        u = zw * zt
        v = _half_swap(zw) * zt
        a1 = u + _half_swap(u)
        a2 = v - _half_swap(v)  # [p_im | -p_im]
        p1 = a1 * lo - a2 * (1.0 - lo)
        k1g = jax.lax.rem(lane, h1)
        k2g = jax.lax.broadcasted_iota(jnp.int32, (T, n2, n1), 1)
        k = k1g * n2 + k2g
        shift = shift_ref[:].reshape(T, 1, 1).astype(jnp.int32)
        m = (k * shift) % n
        ang = (2.0 * np.pi / n) * m.astype(jnp.float32)
        pb = (2.0 * (1.0 - lo) - 1.0) * jnp.sin(ang)
        y1 = (p1 * jnp.cos(ang) + _half_swap(p1) * pb) * dcm[:]

        wn_re, wn_im = ny_re[:T], ny_im[:T]
        tn_re, tn_im = ny_re[T:], ny_im[T:]
        sgn_s = (1 - 2 * (shift_ref[:] & 1)).astype(jnp.float32)
        ny1 = (wn_re * tn_re + wn_im * tn_im) * sgn_s / n

        g = _dot(y1, g1cat[:], dn_lane, precision)
        g_re, g_im = g[:, :, :n1], g[:, :, n1:]
        h_re = g_re * twic[:] - g_im * twis[:]
        h_im = g_re * twis[:] + g_im * twic[:]
        h2 = jnp.concatenate([h_re, h_im], axis=1)
        o = _dot(h2, g2cat[:], dn_mid, precision)
        # write lag-ordered [r, q] directly: the in-VMEM transpose replaces
        # an XLA-side [S, n1, r_cap] copy per output
        out_d[:] = jnp.swapaxes(o + ny1.reshape(T, 1, 1) * sgq[:], 1, 2)

        # ---- exact sliding sums: in-VMEM cumsum + one-hot shift matmuls
        HI = jax.lax.Precision.HIGHEST  # 0/1 matrices: exact data split
        w2x = jnp.concatenate([w3, w3 * w3], axis=0)  # [2T, rows_w, n1]
        triu = (
            jax.lax.broadcasted_iota(jnp.int32, (n1, n1), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (n1, n1), 1)
        ).astype(jnp.float32)
        cs = _dot(w2x, triu, dn_lane, HI)  # inclusive intra-block prefix
        # block totals broadcast to every lane (row-(n1-1) 0/1 matmul —
        # lane-1 arrays hit Mosaic layout bugs), then an inclusive
        # log-step Hillis-Steele scan over the n2 block dim
        lastrow = (
            jax.lax.broadcasted_iota(jnp.int32, (n1, n1), 0) == n1 - 1
        ).astype(jnp.float32)
        totb = _dot(cs, lastrow, dn_lane, HI)  # all-lane block totals
        acc = totb
        step = 1
        while step < rows_w:
            acc = acc + jnp.concatenate(
                [jnp.zeros_like(acc[:, :step]), acc[:, :-step]], axis=1
            )
            step *= 2
        cs = cs + (acc - totb)  # + exclusive block prefix

        # lo[o] = cs_inc[o-1]: one static flat shift (lane roll + block fix)
        a_roll = _lane_roll1(cs)
        prevb = jnp.concatenate(
            [jnp.zeros_like(cs[:, :1]), cs[:, :-1]], axis=1
        )
        b_roll = _lane_roll1(prevb)
        lane2 = jax.lax.broadcasted_iota(
            jnp.int32, (2 * T, rows_w, n1), 2
        )
        lo_full = jnp.where(lane2 == 0, b_roll, a_roll)

        # hi[o] = cs_inc[o + klen - 1]: block one-hot + lane one-hot matmuls
        d1 = (klen_ref[:] - 1).astype(jnp.int32)  # [T, 1]
        qd = d1 // n1
        rem = d1 % n1
        rb = jax.lax.broadcasted_iota(jnp.int32, (T, rows_w, r_cap), 1)
        rc = jax.lax.broadcasted_iota(jnp.int32, (T, rows_w, r_cap), 2)
        ohb0 = (rb == rc + qd.reshape(T, 1, 1)).astype(jnp.float32)
        ohb1 = (rb == rc + 1 + qd.reshape(T, 1, 1)).astype(jnp.float32)
        ohb0 = jnp.concatenate([ohb0, ohb0], axis=0)
        ohb1 = jnp.concatenate([ohb1, ohb1], axis=0)
        csb0 = jax.lax.dot_general(
            ohb0, cs, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=HI,
        )  # [2T, r_cap, n1] = cs[·, rb+q, ·]
        csb1 = jax.lax.dot_general(
            ohb1, cs, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=HI,
        )
        csb2 = jnp.concatenate([csb0, csb1], axis=2)  # [2T, r_cap, 2n1]
        li = jax.lax.broadcasted_iota(jnp.int32, (T, 2 * n1, n1), 1)
        lj = jax.lax.broadcasted_iota(jnp.int32, (T, 2 * n1, n1), 2)
        ohl = (li == lj + rem.reshape(T, 1, 1)).astype(jnp.float32)
        ohl = jnp.concatenate([ohl, ohl], axis=0)
        hi_full = jax.lax.dot_general(
            csb2, ohl, dimension_numbers=dn_b,
            preferred_element_type=jnp.float32, precision=HI,
        )  # [2T, r_cap, n1]
        sums = hi_full - lo_full[:, :r_cap, :]
        out_sx[:] = sums[:T]
        out_sxx[:] = sums[T:]

        # region mean prefix read: cs_inc[wlen-1] over the work half
        flat = jax.lax.broadcasted_iota(
            jnp.int32, (T, rows_w, n1), 1
        ) * n1 + jax.lax.broadcasted_iota(jnp.int32, (T, rows_w, n1), 2)
        wl1 = wlen_ref[:].reshape(T, 1, 1).astype(jnp.int32) - 1
        wsel = cs[:T] * (flat == wl1).astype(jnp.float32)
        out_wm[:] = jnp.sum(
            jnp.sum(wsel, axis=2, keepdims=True), axis=1
        )

    return kern


def _lane_roll1(x):
    """Static +1 roll along the lane dim: out[.., l] = x[.., l-1] (cyclic)."""
    if _interpret():
        return jnp.roll(x, 1, axis=x.ndim - 1)
    return pltpu.roll(x, 1, axis=x.ndim - 1)


def corr_dots_sums(work, tmpl, klen, wlen, shift, nfft: int, out_len: int,
                   row_tile: int = 16,
                   precision=jax.lax.Precision.HIGHEST):
    """Fused trigger search + exact sliding window sums + region mean.

    Returns ``(dots, sx, sxx, wmean)``; dots/sx/sxx are ``[S, out_len]``,
    wmean is ``[S]``:
      ``dots[s,o]  = Σ_k work[s, o+shift[s]+k]·tmpl[s,k]``  (six-step FFT)
      ``sx[s,o]    = Σ_{k<klen[s]} work[s, o+k]``      (exact, via cumsum)
      ``sxx[s,o]   = Σ_{k<klen[s]} work²[s, o+k]``     (exact, via cumsum)
      ``wmean[s]   = Σ_{i<wlen[s]} work[s, i] / wlen[s]``
    """
    s, lw = work.shape
    lt = tmpl.shape[1]
    n1, n2 = _factors(nfft)
    r_cap = -(-out_len // n1)
    T = min(row_tile, s)
    rows = -(-s // T) * T
    # row counts rounded to a sublane multiple (Mosaic relayouts whole
    # tiles when the second-minor block dim is not a multiple of 8)
    rows_w = min(-(-lw // (8 * n1)) * 8, n2)
    rows_t = min(-(-lt // (8 * n1)) * 8, n2)
    # hi reads need block rb + klen//n1 + 1 < rows_w for every valid lag
    assert r_cap + (lt - 1) // n1 + 1 <= rows_w, (r_cap, lt, rows_w)

    def grid3(x, rx):
        pad = [(0, rows - s), (0, rx * n1 - x.shape[1])]
        x = jnp.pad(x, pad) if any(p[1] for p in pad) else x
        return x.reshape(rows, rx, n1)

    w3 = grid3(work.astype(jnp.float32), rows_w)
    t3 = grid3(tmpl.astype(jnp.float32), rows_t)
    kl = jnp.pad(klen.astype(jnp.int32), (0, rows - s)).reshape(rows, 1)
    wl = jnp.pad(wlen.astype(jnp.int32), (0, rows - s)).reshape(rows, 1)
    sh = jnp.pad(shift.astype(jnp.int32), (0, rows - s)).reshape(rows, 1)

    consts = _consts(nfft, r_cap)
    tile_w = pl.BlockSpec((T, rows_w, n1), lambda i: (i, 0, 0))
    tile_t = pl.BlockSpec((T, rows_t, n1), lambda i: (i, 0, 0))
    row1 = pl.BlockSpec((T, 1), lambda i: (i, 0))
    const_spec = [
        pl.BlockSpec(c.shape, lambda i, nd=c.ndim: (0,) * nd) for c in consts
    ]
    out_rq = pl.BlockSpec((T, r_cap, n1), lambda i: (i, 0, 0))
    dots, sx, sxx, wm = pl.pallas_call(
        _sums_kernel(nfft, n1, n2, r_cap, T, rows_w, rows_t, precision),
        grid=(rows // T,),
        in_specs=[tile_w, tile_t, row1, row1, row1, *const_spec],
        out_specs=[out_rq, out_rq, out_rq,
                   pl.BlockSpec((T, 1), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((rows, r_cap, n1), jnp.float32),
                   jax.ShapeDtypeStruct((rows, r_cap, n1), jnp.float32),
                   jax.ShapeDtypeStruct((rows, r_cap, n1), jnp.float32),
                   jax.ShapeDtypeStruct((rows, 1), jnp.float32)],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2**20,
        ),
    )(w3, t3, kl, wl, sh, *[jnp.asarray(c) for c in consts])
    dots = dots.reshape(rows, r_cap * n1)[:s, :out_len]
    sx = sx.reshape(rows, r_cap * n1)[:s, :out_len]
    sxx = sxx.reshape(rows, r_cap * n1)[:s, :out_len]
    wmean = wm.reshape(rows)[:s] / jnp.maximum(wlen.astype(jnp.float32), 1.0)
    return dots, sx, sxx, wmean


def corr_dots_sums_ring(ring, starts, tmpl, klen, wlen, shift, nfft: int,
                        out_len: int, wcap: int, row_tile: int = 16,
                        precision=jax.lax.Precision.HIGHEST):
    """:func:`corr_dots_sums` reading the work window DIRECTLY from the
    mirrored history ring: ``work[s, j] = ring[s, starts[s] + j]`` for
    ``j < wcap`` (zero beyond), gathered in-kernel per stream tile.  Skips
    the [S, wcap] work materialization, its pad and the tiled-layout copy
    (~0.3 ms/hop at S=1024 on v5e)."""
    s, lanes = ring.shape
    lt = tmpl.shape[1]
    n1, n2 = _factors(nfft)
    r_cap = -(-out_len // n1)
    T = min(row_tile, s)
    rows = -(-s // T) * T
    rows_w = min(-(-wcap // (8 * n1)) * 8, n2)
    rows_t = min(-(-lt // (8 * n1)) * 8, n2)
    lp = rows_w * n1
    assert lanes % n1 == 0 and lanes >= lp, (lanes, lp)
    assert r_cap + (lt - 1) // n1 + 1 <= rows_w, (r_cap, lt, rows_w)

    ring = ring.astype(jnp.float32)
    if rows > s:
        ring = jnp.pad(ring, ((0, rows - s), (0, 0)))
    t3 = jnp.pad(
        tmpl.astype(jnp.float32),
        ((0, rows - s), (0, rows_t * n1 - lt)),
    ).reshape(rows, rows_t, n1)
    st = jnp.pad(
        jnp.clip(starts.astype(jnp.int32), 0, lanes - wcap), (0, rows - s)
    )
    kl = jnp.pad(klen.astype(jnp.int32), (0, rows - s)).reshape(rows, 1)
    wl = jnp.pad(wlen.astype(jnp.int32), (0, rows - s)).reshape(rows, 1)
    sh = jnp.pad(shift.astype(jnp.int32), (0, rows - s)).reshape(rows, 1)

    consts = _consts(nfft, r_cap)
    ring_tile = pl.BlockSpec((T, lanes), lambda i, sref: (i, 0))
    tile_t = pl.BlockSpec((T, rows_t, n1), lambda i, sref: (i, 0, 0))
    row1 = pl.BlockSpec((T, 1), lambda i, sref: (i, 0))
    const_spec = [
        pl.BlockSpec(c.shape, lambda i, sref, nd=c.ndim: (0,) * nd)
        for c in consts
    ]
    out_rq = pl.BlockSpec((T, r_cap, n1), lambda i, sref: (i, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rows // T,),
        in_specs=[ring_tile, tile_t, row1, row1, row1, *const_spec],
        out_specs=[out_rq, out_rq, out_rq,
                   pl.BlockSpec((T, 1), lambda i, sref: (i, 0))],
    )
    dots, sx, sxx, wm = pl.pallas_call(
        _sums_kernel(nfft, n1, n2, r_cap, T, rows_w, rows_t, precision,
                     wcap=wcap, ring_lanes=lanes),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rows, r_cap, n1), jnp.float32),
                   jax.ShapeDtypeStruct((rows, r_cap, n1), jnp.float32),
                   jax.ShapeDtypeStruct((rows, r_cap, n1), jnp.float32),
                   jax.ShapeDtypeStruct((rows, 1), jnp.float32)],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2**20,
        ),
    )(st, ring, t3, kl, wl, sh, *[jnp.asarray(c) for c in consts])
    dots = dots.reshape(rows, r_cap * n1)[:s, :out_len]
    sx = sx.reshape(rows, r_cap * n1)[:s, :out_len]
    sxx = sxx.reshape(rows, r_cap * n1)[:s, :out_len]
    wmean = wm.reshape(rows)[:s] / jnp.maximum(wlen.astype(jnp.float32), 1.0)
    return dots, sx, sxx, wmean


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
    rows_w = min(-(-lw // (8 * n1)) * 8, n2)
    rows_t = min(-(-lt // (8 * n1)) * 8, n2)

    def grid3(x, rx):
        pad = [(0, rows - s), (0, rx * n1 - x.shape[1])]
        x = jnp.pad(x, pad) if any(p[1] for p in pad) else x
        return x.reshape(rows, rx, n1)

    w3 = grid3(work.astype(jnp.float32), rows_w)
    t3 = grid3(tmpl.astype(jnp.float32), rows_t)
    sh = jnp.pad(shift.astype(jnp.int32), (0, rows - s)).reshape(rows, 1)

    consts = _consts(nfft, r_cap)
    tile_w = pl.BlockSpec((T, rows_w, n1), lambda i: (i, 0, 0))
    tile_t = pl.BlockSpec((T, rows_t, n1), lambda i: (i, 0, 0))
    const_spec = [
        pl.BlockSpec(c.shape, lambda i, nd=c.ndim: (0,) * nd) for c in consts
    ]
    out, _ny = pl.pallas_call(
        _kernel(nfft, n1, n2, r_cap, T, rows_w, rows_t, precision),
        grid=(rows // T,),
        in_specs=[tile_w, tile_t, pl.BlockSpec((T, 1), lambda i: (i, 0)),
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
