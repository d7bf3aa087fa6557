"""Fused Pallas TPU kernel for the reassigned-spectrogram column transform.

This is the north star's "one fused window -> rFFT -> phase-gradient kernel":
per analysis column it runs, entirely in VMEM,

1. the forward ``h``-point FFT of the raw frame (``h = 2n`` Hilbert length),
2. the one-sided analytic-signal selection (zero DC + negative bins),
3. the inverse ``h``-point FFT and the center ``n``-sample crop,
4. the two ``n``-point FFTs ``U`` (analytic crop) and ``V`` (ramp * crop),
5. the frequency-domain window stencils producing the three windowed
   spectra B, D (spectral-derivative window), T ((t-c)*h window), and
6. the per-bin reassignment corrections (power, freq offset, time offset),

writing only the three ``[rows, n]``-sized correction grids to HBM.  The XLA
path (analyzers/spectrogram.py::_reassigned) materializes ~40 HBM passes for
the same chain — layout corner turns around every six-step transform
dominate its cost (tools/profile_step.py: ~45 of 51 ms/step at S=4096).

Mosaic formulation (all probed on v5e):

- Every FFT stage is a 3D ``dot_general`` contracting either the MIDDLE or
  the LANE dimension of a ``[T, d1, d2]`` tile.  The six-step corner turn is
  absorbed by alternating the contracted dimension — no transposes, no
  lane-crossing reshapes anywhere.  Data layout through the chain:

      frames   [T, n2, n1]      t  = n1 + N1*n2        (free bitcast in HBM)
      spectrum [T, k2, k1]      k  = k1*N2 + k2        (S1 contracts middle,
                                                        S2 contracts middle)
      analytic [T, c2, c1]      t' = c1*N2 + c2        (S1 contracts lane,
                                                        S2 contracts middle)
      U, V     [T, u2, u1]      u  = u1*M2 + u2        (S1 contracts lane
                                                        with the crop folded
                                                        into zero rows of the
                                                        DFT matrix, S2
                                                        contracts middle)

- cos/-sin DFT matrices ride one fused ``[K, 2K]`` rhs (both real products
  per dot, full MXU column occupancy); complex inputs take two dots.
- f32 accuracy via bf16x3 (hi/lo split of the data operand, host-pre-split
  constants): measured ~5e-6 relative per stage — far below the display's
  0.0024 dB code step.  ``OPENMETERS_REASSIGNED_PRECISION=highest`` switches
  to 6-pass exact-f32 dots.
- The crop of the analytic signal (center n of h samples) costs nothing:
  the U/V first-stage DFT matrix simply has zero rows outside the crop.
- Window stencils are circular rolls over the flat bin index expressed in
  the (mod, div) grid: a middle-dim roll plus a lane-dim carry fix.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openmeters_tpu.ops.pallas_sliding import _interpret, pallas_enabled


def _factors(n: int) -> tuple[int, int]:
    assert n & (n - 1) == 0 and n >= 16
    lg = n.bit_length() - 1
    n1 = 1 << ((lg + 1) // 2)
    return n1, n // n1


def _split_hi(m: np.ndarray) -> np.ndarray:
    import ml_dtypes

    return m.astype(ml_dtypes.bfloat16).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _consts(n: int, h: int, window_coeffs: tuple, sample_rate: float, hop: int):
    """Host-side constant pack for the kernel (all float32 numpy)."""
    H1, H2 = _factors(h)
    N1, N2 = _factors(n)
    center = (h - n) // 2

    def dft_fused(k: int):
        a = np.arange(k)
        ang = 2.0 * np.pi * np.outer(a, a) / k
        return np.concatenate(
            [np.cos(ang), -np.sin(ang)], axis=1
        ).astype(np.float32)  # [k, 2k] = [cos | -sin]

    def twiddle(total: int, a: int, b: int):
        ang = 2.0 * np.pi * np.outer(np.arange(a), np.arange(b)) / total
        return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)

    fh = dft_fused(H1)  # h stages both use [64, 128] when H1 == H2
    fh2 = dft_fused(H2) if H2 != H1 else fh
    fn1 = dft_fused(N1)
    fn2 = dft_fused(N2)
    twh_c, twh_s = twiddle(h, H1, H2)  # [n1, k2]
    twn_c, twn_s = twiddle(n, N1, N2)

    # U/V stage-1 matrix with the crop absorbed: contraction runs over the
    # analytic tile's lane dim c1 (t' = c1*H2' ... see layout note); sample
    # m = t' - center contributes F_{N2}[m div N1? ...] -- derived below.
    # analytic layout [T, c2, c1], t' = c1*N2h + c2 with N2h = H2 (the ifft
    # output grid): t' = c1*H2 + c2.  Crop keeps t' in [center, center+n):
    # m = t' - center.  U input index m = u_n1 + N1*u_n2 (N1 lanes-minor
    # convention): u_n1 = m mod N1, u_n2 = m div N1.
    # We contract over c1 (lane) for fixed c2 (middle): m = c1*H2 + c2 -
    # center.  With H2 == N1 and center a multiple of H2, m mod N1 = c2
    # (middle passes through as u_n1) and u_n2 = c1 - center//H2: the
    # stage-1 matrix over c1 is F_{N2}[c1 - center//H2, :] zero-padded.
    assert H2 == N1, (H1, H2, N1, N2)
    assert center % H2 == 0
    off = center // H2
    crop1 = np.zeros((H1, 2 * N2), np.float32)
    crop1[off : off + (n // N1)] = dft_fused(N2)[: n // N1]
    # ramp grid over the analytic tile (values outside the crop are zeroed
    # by the crop matrix; set them to 0 anyway)
    c2g, c1g = np.meshgrid(np.arange(H2), np.arange(H1), indexing="ij")
    t_prime = c1g * H2 + c2g
    m = t_prime - center
    ramp = np.where(
        (m >= 0) & (m < n), m - (n - 1) * 0.5, 0.0
    ).astype(np.float32)[None]  # [1, c2, c1]

    # hilbert keep mask on the spectrum grid [k2, k1], k = k1*H2 + k2
    k2g, k1g = np.meshgrid(np.arange(H2), np.arange(H1), indexing="ij")
    k = k1g * H2 + k2g
    keep = ((k >= 1) & (k <= h // 2)).astype(np.float32)[None]  # [1, k2, k1]

    # output-grid constants: U bins u = u1*N2 + u2, layout [u2, u1]
    u2g, u1g = np.meshgrid(np.arange(N2), np.arange(N1), indexing="ij")
    u = u1g * N2 + u2g  # [N2, N1]
    from openmeters_tpu.utils.windows import fft_bin_normalization

    # rebuild the window from its cosine coefficients to compute norm
    phi = np.arange(n, dtype=np.float64) * (2.0 * np.pi / n)
    w = np.zeros((n,), np.float64)
    for j, c in enumerate(window_coeffs):
        w += c * np.cos(phi * j)
    norm = fft_bin_normalization(w.astype(np.float32), n)  # [bins]
    norm_grid = np.zeros((N2, N1), np.float32)
    norm_grid[u <= n // 2] = norm[u[u <= n // 2]]
    bin_hz = sample_rate / n
    freq_base = (u * bin_hz).astype(np.float32)[None]  # [1, N2, N1]

    pack = {
        "fh1": fh, "fh2": fh2, "fn1": fn1, "crop1": crop1,
        "twh_c": twh_c[None], "twh_s": twh_s[None],
        "twn_c": twn_c[None], "twn_s": twn_s[None],
        "keep": keep, "ramp": ramp,
        "norm_grid": norm_grid[None], "freq_base": freq_base,
    }
    lo = {f"{k}_lo": v - _split_hi(v) for k, v in pack.items()
          if k in ("fh1", "fh2", "fn1", "crop1")}
    hi = {k: (_split_hi(v) if k in ("fh1", "fh2", "fn1", "crop1") else v)
          for k, v in pack.items()}
    return {**hi, **lo}


def _precision():
    return os.environ.get("OPENMETERS_REASSIGNED_PRECISION", "bf16x3")


def _build_kernel(T, n, h, coeffs, inv_2pi, inv_hop, latency_hops, exact):
    H1, H2 = _factors(h)
    N1, N2 = _factors(n)

    def dot3(x, f_hi, f_lo, dims):
        """[T, a, b] x [K, 2K'] fused-rhs dot; returns (cos_part, sin_part)."""
        dn = (dims, ((), ()))
        if exact:
            out = jax.lax.dot_general(
                x, f_hi + f_lo, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
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

    def cstage(xc, xs, f_hi, f_lo, dims):
        """Complex input through the fused cos|-sin rhs."""
        rc, rs = dot3(xc, f_hi, f_lo, dims)
        ic, is_ = dot3(xs, f_hi, f_lo, dims)
        return rc - is_, rs + ic

    MID = (((1,), (0,)),)[0]
    LANE = (((2,), (0,)),)[0]

    def flat_roll(xc, xs, j, m2, m1):
        """Circular roll by +j over the flat index i = i1*m2 + i2 of a
        [T, i2, i1] grid: value_out[i] = value_in[i - j]."""
        if j == 0:
            return xc, xs
        aj = abs(j)
        i2 = jax.lax.broadcasted_iota(jnp.int32, (1, m2, m1), 1)
        if j > 0:
            ac = pltpu.roll(xc, aj, 1)
            as_ = pltpu.roll(xs, aj, 1)
            bc = pltpu.roll(ac, 1, 2)
            bs = pltpu.roll(as_, 1, 2)
            wrap = i2 < aj
        else:
            ac = pltpu.roll(xc, m2 - aj, 1)
            as_ = pltpu.roll(xs, m2 - aj, 1)
            bc = pltpu.roll(ac, m1 - 1, 2)
            bs = pltpu.roll(as_, m1 - 1, 2)
            wrap = i2 >= m2 - aj
        return jnp.where(wrap, bc, ac), jnp.where(wrap, bs, as_)

    a0 = float(coeffs[0])
    halves = [0.5 * float(c) for c in coeffs[1:]]

    def kern(frames_ref, fh1h, fh1l, fh2h, fh2l, fn1h, fn1l, crop1h, crop1l,
             twhc, twhs, twnc, twns, keep, ramp, norm_grid, freq_base,
             freq_out, time_out, pow_out):
        x3 = frames_ref[:]  # [T, H2(n2), H1(n1)]

        # ---- forward h-FFT (real input) ----
        # S1 contracts middle (n2): out [T, n1, k2-fused]
        yc, ys = dot3(x3, fh2h[:], fh2l[:], MID)
        tc = twhc[:]
        tsn = twhs[:]
        yc, ys = yc * tc - ys * tsn, yc * tsn + ys * tc
        # S2 contracts middle (n1): out [T, k2, k1]
        sc, ss = cstage(yc, ys, fh1h[:], fh1l[:], MID)

        # ---- analytic selection ----
        km = keep[:]
        sc = sc * km
        ss = ss * km

        # ---- inverse h-FFT: ifft(z) = conj(DFT(conj(z))) / h ----
        # input grid [T, k2(=n1'), k1(=n2')]: S1 contracts LANE (n2'),
        # S2 contracts middle (n1')
        ss = -ss
        yc, ys = cstage(sc, ss, fh1h[:], fh1l[:], LANE)
        yc, ys = yc * tc - ys * tsn, yc * tsn + ys * tc
        ac, as_ = cstage(yc, ys, fh2h[:], fh2l[:], MID)
        inv_h = 1.0 / h
        ac = ac * inv_h
        as_ = as_ * (-inv_h)
        # analytic tile [T, c2, c1], t' = c1*H2 + c2

        # ---- U = FFT_n(crop), V = FFT_n(ramp * crop) ----
        tnc = twnc[:]
        tns = twns[:]

        def fft_n(zc, zs):
            # S1 contracts LANE (c1) with the crop-absorbed matrix
            uc, us = cstage(zc, zs, crop1h[:], crop1l[:], LANE)
            uc, us = uc * tnc - us * tns, uc * tns + us * tnc
            # S2 contracts middle: out [T, u2, u1]
            return cstage(uc, us, fn1h[:], fn1l[:], MID)

        uc, us = fft_n(ac, as_)
        rp = ramp[:]
        vc, vs = fft_n(ac * rp, as_ * rp)

        # ---- window stencils over the flat bin index ----
        def stencil(xc, xs):
            oc, os_ = a0 * xc, a0 * xs
            for j, hv in enumerate(halves, start=1):
                pc, ps = flat_roll(xc, xs, j, N2, N1)
                mc, ms = flat_roll(xc, xs, -j, N2, N1)
                oc = oc + hv * (pc + mc)
                os_ = os_ + hv * (ps + ms)
            return oc, os_

        bc, bs = stencil(uc, us)
        tc2, ts2 = stencil(vc, vs)
        dc = jnp.zeros_like(uc)
        ds = jnp.zeros_like(us)
        for j, hv in enumerate(halves, start=1):
            g = np.pi * j * float(coeffs[j]) / n  # i*g*(U[k-j] - U[k+j])
            pc, ps = flat_roll(uc, us, j, N2, N1)
            mc, ms = flat_roll(uc, us, -j, N2, N1)
            dc = dc - g * (ps - ms)
            ds = ds + g * (pc - mc)

        # ---- reassignment corrections ----
        pow_raw = bc * bc + bs * bs
        inv_pow = 1.0 / jnp.maximum(pow_raw, 1e-38)
        d_omega = -(ds * bc - dc * bs) * inv_pow
        # outputs transposed to [T, u1, u2] in VMEM so the HBM arrays
        # flatten to bin order u = u1*N2 + u2 with a free reshape
        tp = lambda v: jnp.transpose(v, (0, 2, 1))  # noqa: E731
        freq_out[:] = tp(freq_base[:] + d_omega * inv_2pi)
        time_out[:] = tp(
            (tc2 * bc + ts2 * bs) * inv_pow * inv_hop - latency_hops
        )
        pow_out[:] = tp(pow_raw * norm_grid[:])

    return kern


@functools.partial(
    jax.jit,
    static_argnames=("n", "h", "coeffs", "sample_rate", "hop", "row_tile"),
)
def reassigned_columns(
    frames, *, n: int, h: int, coeffs: tuple, sample_rate: float, hop: int,
    row_tile: int = 32,
):
    """Fused reassigned transform of ``[rows, h]`` raw frames.

    Returns ``(freq_hz, time_offset_hops, scaled_power)`` each ``[rows, n]``
    in flat bin order (only bins ``[0, n//2]`` are meaningful; callers slice).
    """
    rows = frames.shape[0]
    H1, H2 = _factors(h)
    N1, N2 = _factors(n)
    center = (h - n) // 2
    inv_2pi = sample_rate / (2.0 * np.pi)
    inv_hop = 1.0 / hop
    latency_hops = center * inv_hop

    cp = _consts(n, h, coeffs, sample_rate, hop)
    T = row_tile
    pad = (-rows) % T
    if pad:
        frames = jnp.pad(frames, ((0, pad), (0, 0)))
    rp = rows + pad

    frames3 = frames.reshape(rp, H2, H1)
    kern = _build_kernel(
        T, n, h, coeffs, inv_2pi, inv_hop, latency_hops,
        exact=_precision() == "highest",
    )

    def cspec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    tile3 = pl.BlockSpec((T, H2, H1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out3 = pl.BlockSpec((T, N1, N2), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    cvals = [
        cp["fh1"], cp["fh1_lo"], cp["fh2"], cp["fh2_lo"],
        cp["fn1"], cp["fn1_lo"], cp["crop1"], cp["crop1_lo"],
        cp["twh_c"], cp["twh_s"], cp["twn_c"], cp["twn_s"],
        cp["keep"], cp["ramp"], cp["norm_grid"], cp["freq_base"],
    ]
    in_specs = [tile3] + [cspec(v.shape) for v in cvals]
    outs = pl.pallas_call(
        kern,
        grid_spec=pl.GridSpec(
            grid=(rp // T,),
            in_specs=in_specs,
            out_specs=[out3, out3, out3],
        ),
        out_shape=[jax.ShapeDtypeStruct((rp, N1, N2), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)  # row tiles are independent
        ),
        interpret=_interpret(),
    )(frames3, *[jnp.asarray(v) for v in cvals])

    def to_flat(g):
        # [rows, u1, u2] flattens straight to bin order u = u1*N2 + u2
        out = g.reshape(rp, n)
        return out[:rows] if pad else out

    return tuple(to_flat(g) for g in outs)


def reassigned_supported(n: int, h: int) -> bool:
    """Kernel applicability.  The layout trick needs:

    - ``H1 == H2`` (the ifft re-splits the bin index with the roles swapped,
      so both h-stages must share one matrix size — h must be an even power
      of two: 1024, 4096, 16384, ...);
    - ``H2 == N1`` and the crop aligned to the analytic grid stride (true
      for ``h = 2n`` at those sizes).
    """
    if not pallas_enabled() and not _interpret():
        return False
    if n < 512 or n & (n - 1) or h & (h - 1):
        return False
    H1, H2 = _factors(h)
    N1, N2 = _factors(n)
    return H1 == H2 and H2 == N1 and ((h - n) // 2) % H2 == 0
