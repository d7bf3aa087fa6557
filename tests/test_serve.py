"""Serving-loop tests (CPU, tiny shapes): transport -> device -> drain."""

import numpy as np

from openmeters_tpu.analyzers.spectrogram import SpectrogramConfig
from openmeters_tpu.engine import EngineConfig
from openmeters_tpu.ingest import Feeder
from openmeters_tpu.serve import MeterServer, ServeConfig, ingest_benchmark


def tiny_engine():
    return EngineConfig(
        channels=2,
        spectrogram=SpectrogramConfig(fft_size=256, hop_size=64, use_reassignment=False),
        spectrum=None,
    )


def test_serve_end_to_end_with_feeder():
    server = MeterServer(
        ServeConfig(n_streams=8, channels=2, engine=tiny_engine(), realtime=True,
                    fetch="meters", fetch_every=4)
    )
    feeder = Feeder(server.transport, n_threads=1)
    try:
        report = server.run(2.0)
    finally:
        ok, failed = feeder.stop()
        server.close()
    assert report["hops"] > 30
    assert ok > 0
    # only the initial format-generation resets (one per stream with data)
    assert report["resets"] <= 2 * 8, report
    assert report["latency_ms_p50"] is not None
    assert server.last_snapshot is not None and server.last_snapshot.size > 0


def test_serve_scan_hops_mode():
    server = MeterServer(
        ServeConfig(n_streams=4, channels=2, engine=tiny_engine(), realtime=True,
                    scan_hops=4, fetch_every=8)
    )
    feeder = Feeder(server.transport, n_threads=1)
    try:
        report = server.run(1.5)
    finally:
        feeder.stop()
        server.close()
    assert report["hops"] >= 8 and report["hops"] % 4 == 0
    assert report["latency_ms_p50"] is not None


def test_serve_pause_gates_consumption():
    server = MeterServer(
        ServeConfig(n_streams=4, channels=2, engine=tiny_engine(), realtime=False)
    )
    try:
        server.set_paused(True)
        server.advance()
        assert server.stats.hops == 0  # meter.rs:126-142: paused -> no DSP
        server.set_paused(False)
        server.advance()
        assert server.stats.hops >= 1
    finally:
        server.close()


def test_ingest_benchmark_smoke():
    report = ingest_benchmark(n_streams=32, duration_s=0.5, realtime=False)
    assert report["pushes_ok"] > 0
    assert report["ingest_realtime_streams"] > 0
    assert report["faults"] == 0
