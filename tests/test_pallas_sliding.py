"""Fused Pallas sliding-DFT hop: parity vs the XLA path (interpret mode).

On CPU the production path automatically falls back to XLA
(``pallas_enabled()``), so the kernel itself is validated here through the
Pallas interpreter on tiny shapes; real-TPU parity (max 0.017 dB vs exact
f64 over 40 hops at 2048/64) is measured in NOTES.md round-2 notes.
"""

import os

import numpy as np
import pytest

from openmeters_tpu.analyzers.spectrogram import SpectrogramAnalyzer, SpectrogramConfig


def _run(analyzer, blocks, env: dict):
    import jax

    old = {k: os.environ.get(k) for k in env}
    os.environ.update({k: v for k, v in env.items() if v})
    for k, v in env.items():
        if not v:
            os.environ.pop(k, None)
    jax.clear_caches()
    try:
        carry = analyzer.init(blocks.shape[1])
        outs = []
        for b in blocks:
            carry, o = analyzer.step(carry, b)
            outs.append((np.asarray(o.codes), np.asarray(o.valid)))
        return outs
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        jax.clear_caches()


@pytest.mark.slow
def test_fused_hop_matches_xla_path():
    rng = np.random.default_rng(7)
    cfg = SpectrogramConfig(
        fft_size=128, hop_size=32, use_reassignment=False, block_frames=64
    )
    ana = SpectrogramAnalyzer(cfg)
    blocks = (rng.standard_normal((8, 3, 64)) * 0.4).astype(np.float32)

    fused = _run(
        ana, blocks,
        {"OPENMETERS_PALLAS_INTERPRET": "1", "OPENMETERS_NO_PALLAS": ""},
    )
    ref = _run(
        ana, blocks,
        {"OPENMETERS_PALLAS_INTERPRET": "", "OPENMETERS_NO_PALLAS": "1"},
    )
    worst = 0
    for (cf, vf), (cr, vr) in zip(fused, ref):
        np.testing.assert_array_equal(vf, vr)
        d = np.abs(cf.astype(int) - cr.astype(int)) * vr[:, :, None]
        worst = max(worst, int(d.max()))
    assert worst <= 2, f"max u16 code delta {worst} (1 code = 0.0024 dB)"


@pytest.mark.slow
def test_bin_tiled_hop_matches_xla_path():
    """Bin-tiled fused hop (the big-FFT spectrum path): parity vs the XLA
    sliding path through all bin tiles, halos and the hermitian Nyquist
    edge.  4096/2048 forces ``fits_vmem`` False with 5 bin tiles."""
    import jax.numpy as jnp

    from openmeters_tpu.ops.pallas_sliding import fits_vmem, fused_supported
    from openmeters_tpu.ops.sliding_stft import SlidingSTFT
    from openmeters_tpu.utils.windows import WindowKind

    fft, hop, block = 4096, 2048, 256
    sl = SlidingSTFT(fft, hop, block, WindowKind.HANN)
    assert not fits_vmem(hop, sl.bins) and fused_supported(hop, sl.bins)

    os.environ["OPENMETERS_PALLAS_INTERPRET"] = "1"
    try:
        import jax

        jax.clear_caches()
        rng = np.random.default_rng(3)
        fb = sl.frames
        carry_fb = fb.init(3)
        sa, sb = sl.init(3), sl.init(3)
        norm = np.ones((sl.bins,), np.float32)
        worst = 0.0
        for step in range(26):
            blk = (rng.standard_normal((3, block)) * 0.3).astype(np.float32)
            carry_fb, info = fb.advance(carry_fb, jnp.asarray(blk))
            sa, pa = sl.step(sa, info)
            sb, pb = sl.step_fused(sb, info, norm, -144.0, emit_codes=False)
            ready = int(info["ready"])
            if ready:
                a = np.asarray(pa[:, :ready])
                b = np.asarray(pb[:, :ready])
                worst = max(
                    worst, float((np.abs(a - b) / (np.abs(a) + 1e-3)).max())
                )
        assert worst < 5e-3, worst
    finally:
        os.environ.pop("OPENMETERS_PALLAS_INTERPRET", None)
        import jax

        jax.clear_caches()
