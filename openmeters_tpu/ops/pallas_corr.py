"""Fused Pallas TPU kernel for the oscilloscope's dense correlation search.

``dots[s, o] = Σ_k work[s, o + shift[s] + k] · tmpl[s, k]`` for offsets
``o ∈ [0, out_len)`` — the stable trigger's sliding normalized-correlation
numerator (reference ``oscilloscope/processor.rs:441-475``; here the dense
FFT superset of its coarse-to-fine CPU search).

The XLA formulation (six-step rfft of [work; template], conj-product, phase
rotation, six-step irfft) is HBM-bound: every stage of both transforms
materializes ``[rows, nfft]``-class intermediates plus pair-packing
reshapes, mirrors and pads — measured ~4 ms of an 8.3 ms oscilloscope step
at S=1024.  This kernel runs the WHOLE chain in VMEM per stream tile:

- forward DFTs of work and template as six-step stages on a ``[T, n2, n1]``
  tile — ``dot_general`` contracting the middle/lane dim absorbs the corner
  turns (the proven ops/pallas_reassigned.py recipe, zero transposes);
  real inputs compute only the ONE-SIDED ``k1 < N1/2`` half of the
  spectrum grid (plus the Nyquist bin as a masked reduction) — no
  hermitian mirror or pair-packing bookkeeping exists anywhere;
- the conj-product ``W·conj(T)`` and the per-stream phase anchor
  ``e^{+2πik·shift/n}`` (int32-exact angle reduction) run elementwise on
  the half grid in VMEM;
- the inverse is the real ``2·Re Σ'`` one-sided sum (DC halved, the
  Nyquist term an explicit ``(-1)^q`` rank-1 correction), computing only
  the ``ceil(out_len/128)`` needed output column groups;
- stage-1 contractions skip the inputs' known-zero tail rows
  (work/template are zero-padded to nfft).

Matmuls run at ``Precision.HIGHEST`` (6 MXU passes, full f32): bf16x3-class
dots leave ~2^-17 relative error on the spectral products, which the
inverse DFT's cancellation amplifies to ~3e-3 of the correlation peak —
measured, enough to jitter the trigger argmax and swamp the parabolic
refinement for low-f0 streams.  Full f32 lands at ~1e-6 of the peak.

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
    """Host DFT constants (float32).

    Forward (input ``A[n2, n1] = x[n1 + N1*n2]``):
      F2[n2, k2] = e^{-2πi n2 k2 / N2}            (stage 1, contract n2)
      TW[n1, k2] = e^{-2πi n1 k2 / N}             (twiddle)
      F1[n1, k1] = e^{-2πi n1 k1 / N1}            (stage 2, contract n1)
      → Z[k1*N2 + k2] on a [k2, k1] grid.
    Inverse (input the [k2, k1] grid; output y[q + N1*r]):
      G1[k1, q]  = e^{+2πi k1 q / N1}             (stage 1, contract k1)
      TWI[k2, q] = e^{+2πi k2 q / N}              (twiddle)
      G2[k2, r]  = e^{+2πi k2 r / N2} / N         (stage 2, contract k2,
                                                   only r < r_cap output
                                                   column groups)
    """
    n1, n2 = _factors(n)
    a2 = 2.0 * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2
    atw = 2.0 * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n
    a1 = 2.0 * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1
    g1 = 2.0 * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1
    twi = 2.0 * np.pi * np.outer(np.arange(n2), np.arange(n1)) / n
    g2 = 2.0 * np.pi * np.outer(np.arange(n2), np.arange(r_cap)) / n2
    return tuple(
        m.astype(np.float32)
        for m in (
            np.cos(a2), -np.sin(a2), np.cos(atw), -np.sin(atw),
            np.cos(a1), -np.sin(a1),
            np.cos(g1), np.sin(g1), np.cos(twi), np.sin(twi),
            np.cos(g2) / n, np.sin(g2) / n,
        )
    )


def _dot(x, m_ref, dims):
    """Full-f32 dot (Mosaic: 6 bf16 passes; interpret/CPU: exact f32)."""
    return jax.lax.dot_general(
        x, m_ref[:], dimension_numbers=dims,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _kernel(n: int, n1: int, n2: int, r_cap: int, T: int,
            rows_w: int, rows_t: int):
    dn_mid = (((1,), (0,)), ((), ()))  # contract dim-1 of [T, a, b]
    dn_lane = (((2,), (0,)), ((), ()))  # contract dim-2
    h1 = n1 // 2  # one-sided k1 range: k = k1*n2 + k2 < n/2 ⇔ k1 < h1

    def fwd(a_ref, rows, f2c, f2s, twc, tws, f1c, f1s, alt):
        """Real [T, n2, n1] tile -> one-sided spectrum (re, im) on the
        [T, k2, k1<h1] half grid + the Nyquist bin [T, 1, 1].  ``rows``:
        input rows beyond this n2 index are known zero (skipped)."""
        a = a_ref[:, :rows, :]
        b_re = _dot(a, f2c, dn_mid)
        b_im = _dot(a, f2s, dn_mid)
        c_re = b_re * twc[:] - b_im * tws[:]
        c_im = b_re * tws[:] + b_im * twc[:]
        d_rr = _dot(c_re, f1c, dn_mid)  # [T, k2, k1<h1]
        d_ri = _dot(c_re, f1s, dn_mid)
        d_ir = _dot(c_im, f1c, dn_mid)
        d_ii = _dot(c_im, f1s, dn_mid)
        # Nyquist bin (k1 = h1, k2 = 0): F1[n1, h1] = (-1)^{n1}
        ny_re = jnp.sum(c_re[:, :, 0:1] * alt[:], axis=1, keepdims=True)
        ny_im = jnp.sum(c_im[:, :, 0:1] * alt[:], axis=1, keepdims=True)
        return d_rr - d_ii, d_ri + d_ir, ny_re, ny_im

    def kern(*refs):
        (w_ref, t_ref, shift_ref,
         f2c_w, f2s_w, f2c_t, f2s_t, twc, tws, f1c, f1s, alt,
         g1c, g1s, twic, twis, g2c, g2s, sgq,
         out_ref) = refs

        w_re, w_im, wn_re, wn_im = fwd(
            w_ref, rows_w, f2c_w, f2s_w, twc, tws, f1c, f1s, alt
        )
        t_re, t_im, tn_re, tn_im = fwd(
            t_ref, rows_t, f2c_t, f2s_t, twc, tws, f1c, f1s, alt
        )

        # P = W · conj(T), then the per-stream anchor e^{+2πik·shift/n};
        # the angle reduces mod n in exact int32 before the float trig
        p_re = w_re * t_re + w_im * t_im
        p_im = w_im * t_re - w_re * t_im
        k2g = jax.lax.broadcasted_iota(jnp.int32, (T, n2, h1), 1)
        k1g = jax.lax.broadcasted_iota(jnp.int32, (T, n2, h1), 2)
        k = k1g * n2 + k2g
        shift = shift_ref[:].reshape(T, 1, 1).astype(jnp.int32)
        m = (k * shift) % n  # python-mod semantics: non-negative
        ang = (2.0 * np.pi / n) * m.astype(jnp.float32)
        ph_re = jnp.cos(ang)
        ph_im = jnp.sin(ang)
        y_re = p_re * ph_re - p_im * ph_im
        y_im = p_re * ph_im + p_im * ph_re
        # DC bin half-weighted for the 2·Re one-sided inverse
        dc = (k == 0).astype(jnp.float32)
        y_re = y_re - 0.5 * dc * y_re
        y_im = y_im - 0.5 * dc * y_im
        # Nyquist product: phase there is (-1)^shift
        pn_re = wn_re * tn_re + wn_im * tn_im  # [T, 1, 1]
        sgn = (1 - 2 * (shift & 1)).astype(jnp.float32)
        yn_re = pn_re * sgn

        # inverse: y[q + n1·r] = (2/n)·Re Σ'_{k1<h1,k2} Y e^{+2πik(q+n1 r)/n}
        #          + Re(Y_ny)·(-1)^q / n
        g_rr = _dot(y_re, g1c, dn_lane)  # [T, k2, q]
        g_ri = _dot(y_re, g1s, dn_lane)
        g_ir = _dot(y_im, g1c, dn_lane)
        g_ii = _dot(y_im, g1s, dn_lane)
        g_re = g_rr - g_ii
        g_im = g_ri + g_ir
        h_re = g_re * twic[:] - g_im * twis[:]
        h_im = g_re * twis[:] + g_im * twic[:]
        o_re = 2.0 * (_dot(h_re, g2c, dn_mid) - _dot(h_im, g2s, dn_mid))
        o_re = o_re + (yn_re / n) * sgq[:]  # sgq: [1, n1, 1] = (-1)^q
        # [T, q, r] -> [T, r, q] so the flattened output index is q + n1·r
        out_ref[:] = jnp.transpose(o_re, (0, 2, 1))

    return kern


def corr_dots(work, tmpl, shift, nfft: int, out_len: int, row_tile: int = 32):
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
    h1 = n1 // 2
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

    (f2c, f2s, twc, tws, f1c, f1s, g1c, g1s, twic, twis, g2c, g2s) = _consts(
        nfft, r_cap
    )
    alt = (1.0 - 2.0 * (np.arange(n1) % 2)).astype(np.float32).reshape(1, n1, 1)
    sgq = (1.0 - 2.0 * (np.arange(n1) % 2)).astype(np.float32).reshape(1, n1, 1)
    consts = (
        f2c[:rows_w], f2s[:rows_w], f2c[:rows_t], f2s[:rows_t],
        twc, tws, f1c[:, :h1], f1s[:, :h1], alt,
        g1c[:h1], g1s[:h1], twic, twis, g2c, g2s, sgq,
    )
    tile3 = pl.BlockSpec((T, n2, n1), lambda i: (i, 0, 0))
    const_spec = [
        pl.BlockSpec(c.shape, lambda i, nd=c.ndim: (0,) * nd) for c in consts
    ]
    out = pl.pallas_call(
        _kernel(nfft, n1, n2, r_cap, T, rows_w, rows_t),
        grid=(rows // T,),
        in_specs=[tile3, tile3, pl.BlockSpec((T, 1), lambda i: (i, 0)),
                  *const_spec],
        out_specs=pl.BlockSpec((T, r_cap, n1), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, r_cap, n1), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2**20,
        ),
    )(w3, t3, sh, *[jnp.asarray(c) for c in consts])
    return out.reshape(rows, r_cap * n1)[:s, :out_len]
