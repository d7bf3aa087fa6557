"""Headline benchmark: concurrent realtime 48 kHz stereo streams per chip.

BASELINE config 1: 2048-pt Hann classic STFT spectrogram (hop 64) + the full
BS.1770 loudness suite (short-term/momentary LUFS, RMS fast/slow, 4x true
peak), one fused jitted step per 256-frame hop, batched over streams.

A stream is "realtime" when the engine keeps up with its sample rate: with
block B at rate R, wall time per step must stay under B/R (5.33 ms).  We
measure steady-state step time at increasing batch sizes and report the
largest S whose measured throughput sustains realtime, i.e.
``streams_realtime = S * (B/R) / step_seconds`` at the best S.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the ratio against the 10,000-streams/chip north star
(BASELINE.md) — the reference itself publishes no throughput numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Persistent compile cache: tunnel compiles are slow; cache them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

NORTH_STAR_STREAMS = 10_000.0


def build_engine():
    from openmeters_tpu.analyzers.spectrogram import SpectrogramConfig
    from openmeters_tpu.engine import EngineConfig, MeterEngine

    cfg = EngineConfig(
        spectrogram=SpectrogramConfig(fft_size=2048, hop_size=64, use_reassignment=False),
        spectrum=None,
        channels=2,
    )
    return MeterEngine(cfg)


def measure(engine, n_streams: int, iters: int = 20) -> dict:
    import jax

    from openmeters_tpu.engine import StreamMeta

    cfg = engine.config
    b = cfg.block_frames
    rng = np.random.default_rng(0)
    block = (rng.standard_normal((n_streams, b, cfg.channels)) * 0.25).astype(
        np.float32
    )
    meta = StreamMeta.default(n_streams, channels=2, pad_channels=cfg.channels)
    reset = np.zeros((n_streams,), bool)

    carry = engine.init(n_streams)
    block_dev = jax.device_put(block)
    # warmup / compile
    carry, snaps = engine.step(carry, block_dev, meta, reset)
    jax.block_until_ready(snaps)

    t0 = time.perf_counter()
    for _ in range(iters):
        carry, snaps = engine.step(carry, block_dev, meta, reset)
    jax.block_until_ready((carry, snaps))
    dt = (time.perf_counter() - t0) / iters

    audio_seconds = n_streams * b / cfg.sample_rate
    return {
        "n_streams": n_streams,
        "step_ms": dt * 1e3,
        "hop_ms": b / cfg.sample_rate * 1e3,
        "streams_realtime": audio_seconds / dt,
        "realtime": dt <= b / cfg.sample_rate,
    }


def main():
    engine = build_engine()
    best = None
    results = []
    for n in (256, 1024, 4096, 8192, 16384):
        try:
            r = measure(engine, n)
        except Exception as e:  # OOM etc.
            print(f"# S={n}: {type(e).__name__}: {e}", file=sys.stderr)
            break
        results.append(r)
        print(f"# S={r['n_streams']}: {r['step_ms']:.2f} ms/step, "
              f"{r['streams_realtime']:.0f} streams realtime", file=sys.stderr)
        if best is None or r["streams_realtime"] > best["streams_realtime"]:
            best = r
        # stop scaling once step time far exceeds the realtime budget
        if r["step_ms"] > 4 * r["hop_ms"]:
            break

    value = round(best["streams_realtime"])
    print(
        json.dumps(
            {
                "metric": "concurrent realtime 48kHz stereo streams/chip "
                "(2048-pt Hann spectrogram + BS.1770 loudness)",
                "value": value,
                "unit": "streams",
                "vs_baseline": round(value / NORTH_STAR_STREAMS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
