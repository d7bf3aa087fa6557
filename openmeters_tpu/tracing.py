"""Structured tracing/observability.

Reference parity: ``tracing``/``tracing-subscriber`` with an env filter
defaulting to ``openmeters=info`` and structured scope prefixes in log text
(main.rs:24-35); fault/reconnect counters logged at reader drop
(transport.rs:658-666).

Here: stdlib logging with the same env-filter convention
(``OPENMETERS_LOG=debug`` / ``OPENMETERS_LOG=openmeters_tpu.engine=debug``),
scope helpers, hop-rate engine counters, and an optional JAX profiler trace
for device-side flamegraphs (the analogue of the reference's dedicated
``profiling`` cargo profile, Cargo.toml:66-71).
"""

from __future__ import annotations

import contextlib
import dataclasses
import logging
import os
import time

ROOT = "openmeters_tpu"


def init_tracing(default_level: str = "info") -> None:
    """Install the env-filtered log config (call once, like main.rs:24-35)."""
    spec = os.environ.get("OPENMETERS_LOG", default_level)
    logging.basicConfig(
        format="%(asctime)s %(levelname).1s [%(name)s] %(message)s",
        datefmt="%H:%M:%S",
    )
    for directive in spec.split(","):
        directive = directive.strip()
        if not directive:
            continue
        if "=" in directive:
            target, _, level = directive.partition("=")
        else:
            target, level = ROOT, directive
        logging.getLogger(target).setLevel(level.upper())


@dataclasses.dataclass
class EngineStats:
    """Hop-rate counters (the reference logs fault/reconnect totals on
    shutdown; these additionally track throughput and underruns)."""

    hops: int = 0
    resets: int = 0
    underruns: int = 0
    audio_seconds: float = 0.0
    wall_seconds: float = 0.0

    def record(self, n_streams: int, block_frames: int, sample_rate: float,
               resets: int = 0, underruns: int = 0, wall_dt: float = 0.0) -> None:
        self.hops += 1
        self.resets += int(resets)
        self.underruns += int(underruns)
        self.audio_seconds += n_streams * block_frames / sample_rate
        self.wall_seconds += wall_dt

    @property
    def realtime_factor(self) -> float:
        return self.audio_seconds / self.wall_seconds if self.wall_seconds else 0.0

    def log_summary(self, log: logging.Logger | None = None) -> None:
        (log or logging.getLogger(f"{ROOT}.engine")).info(
            "[engine] hops=%d resets=%d underruns=%d audio=%.1fs rt=%.1fx",
            self.hops, self.resets, self.underruns,
            self.audio_seconds, self.realtime_factor,
        )


@contextlib.contextmanager
def scope(log: logging.Logger, name: str, level: int = logging.DEBUG):
    """Timed structured scope: ``[name] ... done in X ms``."""
    t0 = time.perf_counter()
    log.log(level, "[%s] start", name)
    try:
        yield
    finally:
        log.log(level, "[%s] done in %.2f ms", name, (time.perf_counter() - t0) * 1e3)


@contextlib.contextmanager
def device_trace(out_dir: str | None = None):
    """JAX profiler trace (TensorBoard format) around a block of device work."""
    import jax

    out = out_dir or os.environ.get("OPENMETERS_TRACE_DIR")
    if not out:
        yield
        return
    with jax.profiler.trace(out):
        yield
