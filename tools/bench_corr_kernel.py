"""A/B the fused Pallas correlation kernel against the XLA rfft/irfft chain.

Honest scan methodology (bench.py style): K chained iterations inside one
jit, full-result probe, min over repeats.

Usage: python tools/bench_corr_kernel.py [S=1024] [iters=32]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from openmeters_tpu.ops.fft import irfft_mxu, rfft_mxu
    from openmeters_tpu.ops.pallas_corr import corr_dots

    s = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    wcap, kcap, scap, nfft = 7200, 4800, 2400, 8192

    rng = np.random.default_rng(0)
    work = jnp.asarray(rng.standard_normal((s, wcap)).astype(np.float32))
    tmpl = jnp.asarray(rng.standard_normal((s, kcap)).astype(np.float32))
    shift = jnp.asarray(rng.integers(-1440, 0, s).astype(np.int32))

    def xla_dots(w, t, sh):
        stacked = jnp.concatenate([w, jnp.pad(t, ((0, 0), (0, wcap - kcap)))], 0)
        sf = rfft_mxu(stacked, nfft)
        wf, tf = sf[:s], sf[s:]
        c_re = jnp.real(wf) * jnp.real(tf) + jnp.imag(wf) * jnp.imag(tf)
        c_im = jnp.imag(wf) * jnp.real(tf) - jnp.real(wf) * jnp.imag(tf)
        k = jnp.arange(nfft // 2 + 1, dtype=jnp.float32)
        ang = (2.0 * np.pi / nfft) * k[None, :] * sh[:, None].astype(jnp.float32)
        ph_re, ph_im = jnp.cos(ang), jnp.sin(ang)
        d_re = c_re * ph_re - c_im * ph_im
        d_im = c_re * ph_im + c_im * ph_re
        return irfft_mxu(d_re, d_im, nfft, out_len=scap + 1)

    def pallas_dots(w, t, sh):
        return corr_dots(w, t, sh, nfft, scap + 1)

    for name, fn in (("xla", xla_dots), ("pallas", pallas_dots)):
        @jax.jit
        def run_k(w, t, sh):
            def body(carry, _):
                w2 = w + carry * 1e-30
                d = fn(w2, t, sh)
                return jnp.sum(d) * 1e-30, jnp.sum(d)
            return jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))

        out = run_k(work, tmpl, shift)
        float(np.asarray(out[1])[-1])
        dt = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = run_k(work, tmpl, shift)
            float(np.asarray(out[1])[-1])
            dt = min(dt, (time.perf_counter() - t0) / iters)
        print(f"{name}: {dt * 1e3:.3f} ms  (S={s}, nfft={nfft}, out={scap + 1})")

    # parity spot check
    a = np.asarray(xla_dots(work, tmpl, shift))
    b = np.asarray(pallas_dots(work, tmpl, shift))
    scale = np.abs(a).max()
    print(f"parity max|Δ|/peak: {np.abs(a - b).max() / scale:.2e}")


if __name__ == "__main__":
    main()
