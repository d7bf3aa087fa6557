"""Fused Pallas TPU kernel for the oscilloscope trigger-correlation search.

Reference semantics: ``src/visuals/oscilloscope/processor.rs:358-475`` — the
StableTrigger locates the capture by a normalized-correlation search of a
template (Gaussian-edged slope + optional waveform reference) over ~1.5
periods of recent samples.  The XLA formulation (analyzers/oscilloscope.py)
is a dense FFT cross-correlation, but it pays ~4 ms/step at S=1024 in many
small pieces: an rfft of the work window, an rfft of the template, an irfft
of the product, two 7200-wide prefix-sum chains + Pallas row-window reads
for the sliding normalization sums, ~15 masked elementwise passes for the
score normalization and peak pick, and — because *some* stream resets its
template nearly every hop at 1k streams — a second full correlation pass
under a ``lax.cond``.

This kernel runs the whole search in VMEM per stream tile:

1. four real forward six-step FFTs (work, work^2, edge template, full
   template = edges + reference) as 3D ``dot_general`` stages contracting
   the middle/lane dims (the pallas_reassigned.py recipe — no transposes);
2. spectral products for the four correlations — work x template,
   work x edge-template, and the *sliding window sums* ``sx = work * boxcar``
   and ``sxx = work^2 * boxcar`` (the boxcar spectrum is a closed-form
   geometric series per stream, replacing both prefix-sum chains), all
   phase-shifted by the per-stream search base (time-shift theorem, int32
   angle reduction);
3. two *packed* complex inverse FFTs (the four product spectra are
   conjugate-symmetric, so pairs ride one complex transform: real part ->
   dots, imag part -> the partner's dots);
4. normalized scores, masked argmax (earliest max), one-hot neighbor reads
   and parabolic refinement for BOTH templates — the template-reset
   re-search costs one extra product instead of a second pass.

Outputs per stream: best offset + parabolic fraction for the full and the
edge-only template, and the window mean at each best offset (what the
candidate extraction needs).  bf16x3 matmul precision (~5e-6 relative) is
far below the 0.3/0.5 correlation thresholds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openmeters_tpu.ops.pallas_sliding import _interpret, pallas_enabled


def _factors(n: int) -> tuple[int, int]:
    assert n & (n - 1) == 0 and n >= 256
    lg = n.bit_length() - 1
    n1 = 1 << ((lg + 1) // 2)
    return n1, n // n1


def _split_hi(m: np.ndarray) -> np.ndarray:
    import ml_dtypes

    return m.astype(ml_dtypes.bfloat16).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _consts(nfft: int):
    """DFT/twiddle tables for the [T, A2, A1] six-step layout (flat index
    t = a1 + A1*a2, spectrum k = k1*A2 + k2, time output t = b1 + A1*b2)."""
    a1, a2 = _factors(nfft)  # lane, middle sizes

    def fused(k: int, sign: float):
        a = np.arange(k)
        ang = 2.0 * np.pi * np.outer(a, a) / k
        return np.concatenate(
            [np.cos(ang), sign * np.sin(ang)], axis=1
        ).astype(np.float32)  # [k, 2k] = [cos | sign*sin]

    fwd1 = fused(a2, -1.0)  # forward S1: contract a2
    fwd2 = fused(a1, -1.0)  # forward S2: contract a1
    inv1 = fused(a1, +1.0)  # inverse S1: contract k1 (lane, size a1)
    inv2 = fused(a2, +1.0)  # inverse S2: contract k2 (middle, size a2)

    ang_f = 2.0 * np.pi * np.outer(np.arange(a1), np.arange(a2)) / nfft
    twf_c = np.cos(ang_f).astype(np.float32)[None]  # [1, a1, k2]
    twf_s = (-np.sin(ang_f)).astype(np.float32)[None]
    ang_i = 2.0 * np.pi * np.outer(np.arange(a2), np.arange(a1)) / nfft
    twi_c = np.cos(ang_i).astype(np.float32)[None]  # [1, k2, b1]
    twi_s = np.sin(ang_i).astype(np.float32)[None]

    mats = {"fwd1": fwd1, "fwd2": fwd2, "inv1": inv1, "inv2": inv2}
    pack = {
        **{k: _split_hi(v) for k, v in mats.items()},
        **{f"{k}_lo": v - _split_hi(v) for k, v in mats.items()},
        "twf_c": twf_c, "twf_s": twf_s, "twi_c": twi_c, "twi_s": twi_s,
    }
    # boxcar denominator 1 - e^{-i phi_k} on the spectrum grid [k2, k1]
    k2g, k1g = np.meshgrid(np.arange(a2), np.arange(a1), indexing="ij")
    kflat = (k1g * a2 + k2g).astype(np.int64)
    phi = 2.0 * np.pi * kflat / nfft
    pack["den_c"] = (1.0 - np.cos(phi)).astype(np.float32)[None]
    pack["den_s"] = np.sin(phi).astype(np.float32)[None]  # -Im(1 - e^{-i phi})
    inv_d = np.where(kflat == 0, 0.0, 1.0 / np.maximum(2.0 - 2.0 * np.cos(phi), 1e-12))
    pack["inv_den"] = inv_d.astype(np.float32)[None]
    return pack


def _build_kernel(T, nfft, scap):
    A1, A2 = _factors(nfft)
    MID = (((1,), (0,)), ((), ()))
    LANE = (((2,), (0,)), ((), ()))

    def dot3(x, f_hi, f_lo, dn):
        xh = x.astype(jnp.bfloat16).astype(jnp.float32)
        xl = x - xh
        out = (
            jax.lax.dot_general(
                xh, f_hi, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                xh, f_lo, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                xl, f_hi, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
        )
        half = out.shape[-1] // 2
        return out[..., :half], out[..., half:]

    def kern(work_ref, tmpl_ref, edge_ref, klen_ref, base_ref, search_ref,
             fwd1h, fwd1l, fwd2h, fwd2l, inv1h, inv1l, inv2h, inv2l,
             twf_c, twf_s, twi_c, twi_s, den_c, den_s, inv_den,
             out_bf, out_ff, out_be, out_fe, out_cf, out_ce, out_wm):
        tfc = twf_c[:]
        tfs = twf_s[:]

        def cstage(xc, xs, f_hi, f_lo, dn):
            rc, rs = dot3(xc, f_hi, f_lo, dn)
            ic, is_ = dot3(xs, f_hi, f_lo, dn)
            return rc - is_, rs + ic

        def rfft(x3):
            """Real [T, a2, a1] -> spectrum [T, k2, k1]."""
            yc, ys = dot3(x3, fwd1h[:], fwd1l[:], MID)  # [T, a1, k2]
            yc, ys = yc * tfc - ys * tfs, yc * tfs + ys * tfc
            return cstage(yc, ys, fwd2h[:], fwd2l[:], MID)  # [T, k2, k1]

        def ifft(zc, zs):
            """Spectrum [T, k2, k1] -> time [T, b1, b2], t = b1 + A1*b2."""
            yc, ys = cstage(zc, zs, inv1h[:], inv1l[:], LANE)  # [T, k2, b1]
            tic = twi_c[:]
            tis = twi_s[:]
            yc, ys = yc * tic - ys * tis, yc * tis + ys * tic
            oc, os_ = cstage(yc, ys, inv2h[:], inv2l[:], MID)  # [T, b1, b2]
            inv_n = 1.0 / nfft
            return oc * inv_n, os_ * inv_n

        work = work_ref[:]
        tmpl = tmpl_ref[:]
        edge = edge_ref[:]
        klen = klen_ref[:]  # [T, 1] f32
        base = base_ref[:]  # [T, 1] i32
        search = search_ref[:]  # [T, 1] f32

        # ONE batched forward transform for all four real signals: stacking
        # along the leading dim turns 12 small dots into 3 large ones (the
        # MXU is K-starved at K=64; at least keep M large)
        x4 = jnp.concatenate([work, work * work, tmpl, edge], axis=0)
        c4, s4 = rfft(x4)
        wc, w2c, tc, ec = (
            c4[:T], c4[T : 2 * T], c4[2 * T : 3 * T], c4[3 * T :]
        )
        ws, w2s, ts, es = (
            s4[:T], s4[T : 2 * T], s4[2 * T : 3 * T], s4[3 * T :]
        )

        # per-stream phase e^{+2pi i k base / nfft} (time-shift by `base`),
        # and the boxcar spectrum B[k] = (1 - e^{-i phi klen}) / (1 - e^{-i
        # phi}); exact int32 angle reduction (k * m mod nfft, nfft pow2)
        k2i = jax.lax.broadcasted_iota(jnp.int32, (T, A2, A1), 1)
        k1i = jax.lax.broadcasted_iota(jnp.int32, (T, A2, A1), 2)
        kflat = k1i * A2 + k2i
        two_pi = 2.0 * np.pi / nfft

        def angle(m):  # m: [T, 1] int32 -> [T, A2, A1] radians of k*m
            red = (kflat * m[:, :, None]) & (nfft - 1)
            return red.astype(jnp.float32) * two_pi

        ph = angle(base)
        phc = jnp.cos(ph)
        phs = jnp.sin(ph)
        pwc = wc * phc - ws * phs  # W * e^{+i theta}
        pws = wc * phs + ws * phc
        p2c = w2c * phc - w2s * phs
        p2s = w2c * phs + w2s * phc

        kl_i = klen[:, :, None].astype(jnp.int32)
        bang = angle(kl_i[:, :, 0])
        num_c = 1.0 - jnp.cos(bang)
        num_s = jnp.sin(bang)  # -Im(1 - e^{-i phi klen})
        # B = num * conj(den) * inv_den ; conj(B) = (bc, -bs); k=0 -> klen
        dc = den_c[:]
        dsn = den_s[:]
        idn = inv_den[:]
        bc = (num_c * dc + num_s * dsn) * idn
        bs = (num_s * dc - num_c * dsn) * idn
        kl_f = klen[:, :, None]
        bc = jnp.where(kflat == 0, kl_f, bc)
        bs = jnp.where(kflat == 0, 0.0, bs)

        def corr_product(ac, as_):
            # (phased W) * conj(template spectrum)
            return pwc * ac + pws * as_, pws * ac - pwc * as_

        d1c, d1s = corr_product(tc, ts)  # full template dots
        d2c, d2s = corr_product(ec, es)  # edge template dots
        # sliding sums: (phased W) * conj(B) and (phased W^2) * conj(B)
        s1c = pwc * bc + pws * bs
        s1s = pws * bc - pwc * bs
        s2c = p2c * bc + p2s * bs
        s2s = p2s * bc - p2c * bs
        # packed pairs — ifft(P1 + i P2) = (real: dots_full, imag:
        # dots_edge) since each product spectrum is conjugate-symmetric —
        # and ONE batched inverse transform for both pairs
        zc = jnp.concatenate([d1c - d2s, s1c - s2s], axis=0)
        zs = jnp.concatenate([d1s + d2c, s1s + s2c], axis=0)
        oc2, os2 = ifft(zc, zs)
        dots_f, sx = oc2[:T], oc2[T:]
        dots_e, sxx = os2[:T], os2[T:]

        # ---- normalized scores on the time-output grid ----
        # (multi-axis reductions crash the Mosaic layout pass — always
        # reduce lane dim first, then sublane, keepdims throughout)
        def rsum(x):
            return jnp.sum(
                jnp.sum(x, axis=2, keepdims=True), axis=1, keepdims=True
            )

        def rmax(x):
            return jnp.max(
                jnp.max(x, axis=2, keepdims=True), axis=1, keepdims=True
            )

        def rmin(x):
            return jnp.min(
                jnp.min(x, axis=2, keepdims=True), axis=1, keepdims=True
            )

        b1i = jax.lax.broadcasted_iota(jnp.int32, (T, A1, A2), 1)
        b2i = jax.lax.broadcasted_iota(jnp.int32, (T, A1, A2), 2)
        oflat = b1i + A1 * b2i
        n = jnp.maximum(kl_f, 1.0)  # [T, 1, 1]
        st = rsum(tmpl)
        stt = rsum(tmpl * tmpl)
        se = rsum(edge)
        see = rsum(edge * edge)
        ex = jnp.maximum(sxx - sx * sx / n, 0.0)

        valid = oflat <= search[:, :, None].astype(jnp.int32)
        valid = valid & (oflat <= scap)

        def scores_of(dots, s_, ss_):
            dot = dots - sx * s_ / n
            ey = jnp.maximum(ss_ - s_ * s_ / n, 0.0)
            den = jnp.sqrt(ex * ey)
            return jnp.where(
                den > 1e-7,
                jnp.clip(dot / jnp.maximum(den, 1e-30), -1.0, 1.0),
                0.0,
            )

        srch = search[:, :, None]

        def pick(scores):
            m = jnp.where(valid, scores, jnp.float32(-3.0e38))
            best_v = rmax(m)
            is_best = (m == best_v) & valid
            big = jnp.int32(nfft)
            best = rmin(  # earliest max, matching argmax's first-True
                jnp.where(is_best, oflat, big)
            )

            def sel(src, t):
                return rsum(jnp.where(oflat == t, src, 0.0))

            y0 = sel(scores, best - 1)
            y1 = sel(scores, best)
            y2 = sel(scores, best + 1)
            bf = best.astype(jnp.float32)
            interior = (best > 0) & (bf < srch)
            denom = y0 - 2.0 * y1 + y2
            small = jnp.abs(denom) < 1e-7
            delta = jnp.where(
                small, 0.0, 0.5 * (y0 - y2) / jnp.where(small, 1.0, denom)
            )
            # mirror _parabolic_refine exactly: refined = max(best +
            # clip(delta, -1, 1), 1.0), then frac = clip(refined - best,
            # -0.5, 0.5) — the max(...) floor matters at best == 1
            refined = jnp.maximum(bf + jnp.clip(delta, -1.0, 1.0), 1.0)
            frac = jnp.where(interior, jnp.clip(refined - bf, -0.5, 0.5), 0.0)
            cmean = sel(sx, best) / n
            return bf, frac, cmean

        bff, frf, cmf = pick(scores_of(dots_f, st, stt))
        bfe, fre, cme = pick(scores_of(dots_e, se, see))

        # region mean over work[base : base + klen + search) — the raw
        # window mean the caller's mean_state EMA tracks (the pad beyond
        # the window is zero, so a masked full-grid reduction suffices)
        a2i = jax.lax.broadcasted_iota(jnp.int32, (T, A2, A1), 1)
        a1i = jax.lax.broadcasted_iota(jnp.int32, (T, A2, A1), 2)
        t_in = a1i + A1 * a2i
        wlen = jnp.maximum(kl_f + srch, 1.0)
        wmean = rsum(
            jnp.where(t_in >= base[:, :, None], work, 0.0)
        ) / wlen

        def put(ref, v):
            ref[:] = jnp.broadcast_to(v[:, 0], (T, A2))

        put(out_bf, bff)
        put(out_ff, frf)
        put(out_be, bfe)
        put(out_fe, fre)
        put(out_cf, cmf)
        put(out_ce, cme)
        put(out_wm, wmean)

    return kern


@functools.partial(jax.jit, static_argnames=("nfft", "scap", "row_tile"))
def corr_search(
    work, tmpl, edge, klen, base, search, *, nfft: int, scap: int,
    row_tile: int = 16,
):
    """Dense normalized-correlation search, fused.

    Args:
      work: ``[S, L<=nfft]`` mean-subtracted, masked work window.
      tmpl: ``[S, K<=nfft]`` full template (edges + masked reference).
      edge: ``[S, K<=nfft]`` edge-only template.
      klen: ``[S]`` int32 runtime template lengths.
      base: ``[S]`` int32 first searched work index.
      search: ``[S]`` int32 search lengths (offsets 0..search are valid).
      nfft: transform size (pow2, >= work length + max offset).
      scap: static max offset capacity.

    Returns ``(best_f, frac_f, cmean_f, best_e, frac_e, cmean_e, wmean)`` —
    the full-template and edge-template picks, the sliding window mean at
    each pick, and the raw region mean over ``[base, base+klen+search)``
    (all ``[S]``; best_* are int32).
    """
    s = work.shape[0]
    A1, A2 = _factors(nfft)
    T = row_tile
    pad = (-s) % T
    if pad:
        work = jnp.pad(work, ((0, pad), (0, 0)))
        tmpl = jnp.pad(tmpl, ((0, pad), (0, 0)))
        edge = jnp.pad(edge, ((0, pad), (0, 0)))
        klen = jnp.pad(klen, (0, pad), constant_values=1)
        base = jnp.pad(base, (0, pad))
        search = jnp.pad(search, (0, pad), constant_values=1)
    sp = s + pad

    def grid3(x):
        if x.shape[1] < nfft:
            x = jnp.pad(x, ((0, 0), (0, nfft - x.shape[1])))
        return x.reshape(sp, A2, A1)

    cp = _consts(nfft)
    cvals = [
        cp["fwd1"], cp["fwd1_lo"], cp["fwd2"], cp["fwd2_lo"],
        cp["inv1"], cp["inv1_lo"], cp["inv2"], cp["inv2_lo"],
        cp["twf_c"], cp["twf_s"], cp["twi_c"], cp["twi_s"],
        cp["den_c"], cp["den_s"], cp["inv_den"],
    ]

    tile3 = pl.BlockSpec((T, A2, A1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    col = pl.BlockSpec((T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def cspec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec((T, A2), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kern = _build_kernel(T, nfft, scap)
    outs = pl.pallas_call(
        kern,
        grid_spec=pl.GridSpec(
            grid=(sp // T,),
            in_specs=[tile3, tile3, tile3, col, col, col]
            + [cspec(v.shape) for v in cvals],
            out_specs=[out_spec] * 7,
        ),
        out_shape=[jax.ShapeDtypeStruct((sp, A2), jnp.float32)] * 7,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=_interpret(),
    )(
        grid3(work), grid3(tmpl), grid3(edge),
        klen.astype(jnp.float32)[:, None],
        base.astype(jnp.int32)[:, None],
        search.astype(jnp.float32)[:, None],
        *[jnp.asarray(v) for v in cvals],
    )
    best_f, frac_f, best_e, frac_e, cmean_f, cmean_e, wmean = [
        o[:s, 0] for o in outs
    ]
    return (
        best_f.astype(jnp.int32), frac_f, cmean_f,
        best_e.astype(jnp.int32), frac_e, cmean_e, wmean,
    )


def corr_supported(nfft: int) -> bool:
    # Opt-in (OPENMETERS_PALLAS_OSC=1): measured 8.60 ms/step e1 @1024 vs
    # 7.12 for the XLA path — the six-step FFTs' K=64/128 contractions run
    # at ~22% MXU in-kernel while XLA's batched FFT overlaps better.  Kept
    # for parity tests and re-evaluation; see NOTES.md round 3.
    import os

    if not os.environ.get("OPENMETERS_PALLAS_OSC"):
        return False
    if not pallas_enabled() and not _interpret():
        return False
    return nfft >= 256 and nfft & (nfft - 1) == 0


# ---------------------------------------------------------------------------
# NSDF period-estimation kernel (processor.rs:93-181)
# ---------------------------------------------------------------------------


def _build_nsdf_kernel(T, nfft, p, max_lag, min_period):
    A1, A2 = _factors(nfft)
    MID = (((1,), (0,)), ((), ()))
    LANE = (((2,), (0,)), ((), ()))

    def dot3(x, f_hi, f_lo, dn):
        xh = x.astype(jnp.bfloat16).astype(jnp.float32)
        xl = x - xh
        out = (
            jax.lax.dot_general(
                xh, f_hi, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                xh, f_lo, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                xl, f_hi, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
        )
        half = out.shape[-1] // 2
        return out[..., :half], out[..., half:]

    BIG = float(3.0e38)

    def kern(c_ref, l_ref, r_ref, total_ref,
             fwd1h, fwd1l, fwd2h, fwd2l, inv1h, inv1l, inv2h, inv2l,
             twf_c, twf_s, twi_c, twi_s,
             out_period, out_conf, out_det, out_peak):
        c = c_ref[:]  # [T, A2, A1] mean-subtracted probe, zero-padded
        left = l_ref[:]  # [T, A1, A2] e[p - tau] on the output grid
        right = r_ref[:]  # [T, A1, A2] total - e[tau]
        total = total_ref[:]  # [T, 1]

        def rsum(x):
            return jnp.sum(
                jnp.sum(x, axis=2, keepdims=True), axis=1, keepdims=True
            )

        def rmax(x):
            return jnp.max(
                jnp.max(x, axis=2, keepdims=True), axis=1, keepdims=True
            )

        def rmin(x):
            return jnp.min(
                jnp.min(x, axis=2, keepdims=True), axis=1, keepdims=True
            )

        last_peak = rmax(jnp.abs(c))

        def cstage(xc, xs, f_hi, f_lo, dn):
            rc, rs = dot3(xc, f_hi, f_lo, dn)
            ic, is_ = dot3(xs, f_hi, f_lo, dn)
            return rc - is_, rs + ic

        # forward real FFT
        yc, ys = dot3(c, fwd1h[:], fwd1l[:], MID)
        tfc = twf_c[:]
        tfs = twf_s[:]
        yc, ys = yc * tfc - ys * tfs, yc * tfs + ys * tfc
        sc, ss = cstage(yc, ys, fwd2h[:], fwd2l[:], MID)
        power = sc * sc + ss * ss  # real spectrum

        # inverse FFT of the real power spectrum -> autocorrelation
        yc, ys = dot3(power, inv1h[:], inv1l[:], LANE)  # [T, k2, b1]
        tic = twi_c[:]
        tis = twi_s[:]
        yc, ys = yc * tic - ys * tis, yc * tis + ys * tic
        ac, _ = cstage(yc, ys, inv2h[:], inv2l[:], MID)  # [T, b1, b2]
        ac = ac * (1.0 / nfft)

        # ---- NSDF + earliest-peak pick on the output grid ----
        b1i = jax.lax.broadcasted_iota(jnp.int32, (T, A1, A2), 1)
        b2i = jax.lax.broadcasted_iota(jnp.int32, (T, A1, A2), 2)
        tau = b1i + A1 * b2i
        in_lag = tau <= max_lag

        denom = left + right
        nsdf = jnp.where(
            (denom > 1e-7) & in_lag,
            2.0 * ac / jnp.maximum(denom, 1e-30),
            0.0,
        )

        # first zero crossing at tau >= 1
        nonpos = (nsdf <= 0.0) & (tau >= 1) & in_lag
        zc = rmin(jnp.where(nonpos, tau, jnp.int32(nfft)))
        has_zc = zc < nfft
        first_tau = jnp.maximum(jnp.int32(min_period), zc)

        # neighbors via flat +-1 rolls (t = b1 + A1*b2: carry on b1 edges)
        def roll_prev(x):  # out[t] = x[t-1], out[0] = x[0] (clamped pad)
            a = pltpu.roll(x, 1, 1)
            b = pltpu.roll(a, 1, 2)
            out = jnp.where(b1i == 0, b, a)
            return jnp.where(tau == 0, x, out)

        def roll_next(x):  # out[t] = x[t+1], out[last] = x[last]
            a = pltpu.roll(x, A1 - 1, 1)
            b = pltpu.roll(a, A2 - 1, 2)
            out = jnp.where(b1i == A1 - 1, b, a)
            return jnp.where(tau == nfft - 1, x, out)

        prev = roll_prev(nsdf)
        nxt = roll_next(nsdf)
        in_range = (tau >= first_tau) & (tau < max_lag) & in_lag
        cand = (
            in_range
            & (nsdf >= 0.5)  # MIN_PERIODICITY
            & (nsdf >= prev)
            & (nsdf >= nxt)
        )
        any_cand = rmax(jnp.where(cand, 1.0, 0.0)) > 0.5
        best_val = rmax(jnp.where(cand, nsdf, -BIG))
        best_idx = rmin(
            jnp.where(cand & (nsdf == best_val), tau, jnp.int32(nfft))
        )
        cutoff = best_val * 0.93  # PEAK_CUTOFF
        early = cand & (nsdf >= cutoff) & (tau <= best_idx)
        peak = rmin(jnp.where(early, tau, jnp.int32(nfft)))
        peak = jnp.where(any_cand, jnp.minimum(peak, best_idx), 0)

        def sel(src, t):
            return rsum(jnp.where(tau == t, src, 0.0))

        y0 = sel(nsdf, peak - 1)
        y1 = sel(nsdf, peak)
        y2 = sel(nsdf, peak + 1)
        pden = y0 - 2.0 * y1 + y2
        small = jnp.abs(pden) < 1e-7
        delta = jnp.where(
            small, 0.0, 0.5 * (y0 - y2) / jnp.where(small, 1.0, pden)
        )
        period = jnp.maximum(
            peak.astype(jnp.float32) + jnp.clip(delta, -1.0, 1.0), 1.0
        )
        confidence = jnp.clip(y1, 0.0, 1.0)

        detected = (
            (last_peak >= 0.001)  # MIN_SIGNAL_PEAK
            & jnp.bool_(max_lag > min_period + 1)
            & has_zc
            & (first_tau < max_lag)
            & any_cand
            & (total[:, :, None] > 1e-7)
        )

        def put(ref, v):
            ref[:] = jnp.broadcast_to(v[:, 0], (T, A2))

        put(out_period, period)
        put(out_conf, confidence)
        put(out_det, detected.astype(jnp.float32))
        put(out_peak, last_peak)

    return kern


@functools.partial(
    jax.jit, static_argnames=("nfft", "p", "max_lag", "min_period", "row_tile")
)
def nsdf_search(
    c, left, right, total, *, nfft: int, p: int, max_lag: int,
    min_period: int, row_tile: int = 16,
):
    """Fused NSDF period estimation.

    Args:
      c: ``[S, P]`` mean-subtracted probe.
      left: ``[S, max_lag + 1]`` prefix energies ``e[p - tau]``.
      right: ``[S, max_lag + 1]`` suffix energies ``total - e[tau]``.
      total: ``[S]`` total energy.

    Returns ``(period, confidence, detected, last_peak)`` (all ``[S]``,
    detected as bool).
    """
    s = c.shape[0]
    A1, A2 = _factors(nfft)
    T = row_tile
    pad = (-s) % T
    if pad:
        c = jnp.pad(c, ((0, pad), (0, 0)))
        left = jnp.pad(left, ((0, pad), (0, 0)))
        right = jnp.pad(right, ((0, pad), (0, 0)))
        total = jnp.pad(total, (0, pad))
    sp = s + pad

    def grid_in(x):
        if x.shape[1] < nfft:
            x = jnp.pad(x, ((0, 0), (0, nfft - x.shape[1])))
        return x.reshape(sp, A2, A1)

    def grid_out(x):
        # value at flat t = b1 + A1*b2 must land at [b1, b2]
        if x.shape[1] < nfft:
            x = jnp.pad(x, ((0, 0), (0, nfft - x.shape[1])))
        return jnp.transpose(x.reshape(sp, A2, A1), (0, 2, 1))

    cp = _consts(nfft)
    cvals = [
        cp["fwd1"], cp["fwd1_lo"], cp["fwd2"], cp["fwd2_lo"],
        cp["inv1"], cp["inv1_lo"], cp["inv2"], cp["inv2_lo"],
        cp["twf_c"], cp["twf_s"], cp["twi_c"], cp["twi_s"],
    ]
    tile_in = pl.BlockSpec((T, A2, A1), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    tile_out = pl.BlockSpec((T, A1, A2), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    col = pl.BlockSpec((T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def cspec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec((T, A2), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kern = _build_nsdf_kernel(T, nfft, p, max_lag, min_period)
    outs = pl.pallas_call(
        kern,
        grid_spec=pl.GridSpec(
            grid=(sp // T,),
            in_specs=[tile_in, tile_out, tile_out, col]
            + [cspec(v.shape) for v in cvals],
            out_specs=[out_spec] * 4,
        ),
        out_shape=[jax.ShapeDtypeStruct((sp, A2), jnp.float32)] * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=_interpret(),
    )(
        grid_in(c), grid_out(left), grid_out(right),
        total.astype(jnp.float32)[:, None],
        *[jnp.asarray(v) for v in cvals],
    )
    period, conf, det, peak = [o[:s, 0] for o in outs]
    return period, conf, det > 0.5, peak
