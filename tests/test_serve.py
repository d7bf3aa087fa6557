"""Serving-loop tests (CPU, tiny shapes): transport -> device -> drain."""

import time

import numpy as np
import pytest

from openmeters_tpu.analyzers.spectrogram import SpectrogramConfig
from openmeters_tpu.engine import EngineConfig, MeterEngine, StreamMeta
from openmeters_tpu.ingest import Feeder
from openmeters_tpu.serve import MeterServer, ServeConfig, ingest_benchmark


def tiny_engine():
    return EngineConfig(
        channels=2,
        spectrogram=SpectrogramConfig(fft_size=256, hop_size=64, use_reassignment=False),
        spectrum=None,
        oscilloscope=None, stereometer=None, waveform=None,
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


def test_serve_sharded_over_mesh_with_donation():
    """The production path: MeterServer on an 8-device mesh — shard_map
    step with donated carries, feed, drain, and meter fetch end to end."""
    from openmeters_tpu.engine import make_mesh

    server = MeterServer(
        ServeConfig(n_streams=8, channels=2, engine=tiny_engine(),
                    realtime=False, fetch="meters", fetch_every=2),
        mesh=make_mesh(),
    )
    feeder = Feeder(server.transport, n_threads=1)
    try:
        report = server.run(1.5)
    finally:
        ok, _ = feeder.stop()
        server.close()
    assert report["hops"] > 8 and ok > 0
    meters = server.last_meters()
    assert meters is not None
    key = next(k for k in meters if "momentary" in k)
    assert np.asarray(meters[key]).shape[0] == 8
    assert np.all(np.isfinite(np.asarray(meters[key])))


def test_serve_sharded_scan_hops_mode():
    """scan_hops dispatch amortization composed with the mesh: the K-hop
    scan runs under shard_map (previously the mesh was silently dropped)."""
    from openmeters_tpu.engine import make_mesh

    server = MeterServer(
        ServeConfig(n_streams=8, channels=2, engine=tiny_engine(),
                    realtime=False, scan_hops=4, fetch_every=8),
        mesh=make_mesh(),
    )
    feeder = Feeder(server.transport, n_threads=1)
    try:
        report = server.run(1.5)
    finally:
        feeder.stop()
        server.close()
    assert report["hops"] >= 8 and report["hops"] % 4 == 0
    meters = server.last_meters()
    assert meters is not None
    key = next(k for k in meters if "momentary" in k)
    assert np.all(np.isfinite(np.asarray(meters[key])))


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


def test_multi_rate_serving_lufs_both_buckets(tmp_path):
    """Concurrent 44.1 kHz and 48 kHz producers served by per-rate engines
    (meter.rs:20-25): each bucket's loudness must read the producer's level
    correctly — a 44.1 k stream through a 48 k engine would be ~0.4 LU off
    and fail the tolerance here."""
    import threading

    from openmeters_tpu.ingest.runtime import ProducerClient
    from openmeters_tpu.serve import MultiRateMeterServer

    sock = str(tmp_path / "mr.sock")
    engine = EngineConfig(
        channels=2,
        spectrogram=None,
        spectrum=None,
        oscilloscope=None, stereometer=None, waveform=None,
    )
    server = MultiRateMeterServer(
        ServeConfig(n_streams=2, channels=2, engine=engine, realtime=True,
                    fetch="meters", fetch_every=2),
        rates=(44_100.0, 48_000.0),
        socket_path=sock,
    )

    # Deterministic on a loaded single-core host: each producer bursts a
    # finite 0.9 s of tone (below the 1 s backlog cap) and keeps its link
    # open; the server then drains the buffered PCM flat out so the
    # momentary window ends on >=0.4 s of contiguous tone — no wall-clock
    # pacing anywhere.
    stop = threading.Event()
    done = {name: threading.Event() for name in ("p44", "p48")}
    burst_s = 0.9

    def produce(rate: float, freq: float, name: str):
        c = ProducerClient(sock, {"app_name": name, "channels": 2,
                                  "sample_rate": rate})
        slot = c.connect()
        assert slot is not None and c.sample_rate == rate
        block = 256
        total = int(burst_s * rate)
        n = 0
        while n < total:
            t = np.arange(n, n + block, dtype=np.float64) / rate
            x = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
            c.send_pcm(np.stack([x, x], -1), int(n / rate * 1e9))
            n += block
        done[name].set()
        stop.wait(timeout=60)  # hold the link open until the drain is done
        c.close()

    threads = [
        threading.Thread(target=produce, args=(44_100.0, 997.0, "p44"), daemon=True),
        threading.Thread(target=produce, args=(48_000.0, 997.0, "p48"), daemon=True),
    ]
    for t in threads:
        t.start()
    try:
        # Both bursts must be FULLY buffered before the paced loop runs:
        # serving while a producer thread is starved (loaded CI host) would
        # underrun -> synthesized silence / fault resets mid-timeline, and
        # the momentary window would no longer end on contiguous tone.
        for name, ev in done.items():
            assert ev.wait(timeout=60.0), f"producer {name} did not finish its burst"
        # the pump threads may still be draining the socket: wait for the
        # WHOLE burst to land in each bucket's transport and for the buffer
        # to go quiescent — pacing while tone is still in socket transit
        # would let the assembler pass the late frames' timestamps and turn
        # them into mid-timeline silence gaps inside the momentary window
        deadline = time.monotonic() + 30.0
        want = {rate: int(burst_s * rate) for rate in server.servers}
        last = {rate: -1 for rate in server.servers}
        while time.monotonic() < deadline:
            now = {
                rate: srv.transport.buffered_frames(0)
                for rate, srv in server.servers.items()
            }
            if all(now[r] >= want[r] and now[r] == last[r] for r in now):
                break
            last = now
            time.sleep(0.05)
        for rate, srv in server.servers.items():
            buffered = srv.transport.buffered_frames(0)
            assert buffered >= want[rate], (rate, buffered)
        # Track the PEAK momentary per bucket at display cadence via
        # on_drain: the paced loop coalesces the past-timestamped backlog to
        # catch up to the realtime edge (meter.rs backlog semantics), then
        # the idle watchdog synthesizes silence for the live-but-silent
        # producers — so the FINAL reading always ends on a wall-clock-
        # dependent amount of silence, while the peak (a fully-tone-filled
        # 0.4 s window, >=0.5 s of timeline) is deterministic.
        peaks = {rate: {} for rate in server.servers}

        def track(rate):
            def cb(srv):
                m = srv.last_meters()
                if m:
                    key = next(k for k in m if "momentary" in k)
                    vals = np.asarray(m[key], np.float64)
                    for slot, v in enumerate(vals):
                        peaks[rate][slot] = max(peaks[rate].get(slot, -np.inf), v)
            return cb

        for rate, srv in server.servers.items():
            srv.on_drain = track(rate)
        # exercise the paced serving loop (it drains the whole burst by
        # coalescing), then sweep any remainder
        server.run(0.3)
        for srv in server.servers.values():
            blk = srv.engine.config.block_frames
            while srv.transport.buffered_frames(0) >= blk:
                srv.advance()
            assert srv.fetch_meters_now() is not None
        view = server.runtime.view()  # while both producers are still live
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=5)
        reports = server.report()
        server.close()

    assert set(reports) == {44_100.0, 48_000.0}
    assert view["rates"][44_100.0]["active"] == 1
    assert view["rates"][48_000.0]["active"] == 1
    # -6 dBFS stereo sine -> peak momentary about -6.0 LUFS in BOTH buckets
    for rate, srv_rate in ((44_100.0, "p44"), (48_000.0, "p48")):
        slot = view["links"][f"app.name:{srv_rate}"]["slot"]
        lufs = peaks[rate].get(slot, -np.inf)
        assert abs(lufs + 6.0) < 0.5, (rate, lufs, peaks)


def test_ingest_benchmark_smoke():
    report = ingest_benchmark(n_streams=32, duration_s=0.5, realtime=False)
    assert report["pushes_ok"] > 0
    assert report["ingest_realtime_streams"] > 0
    assert report["faults"] == 0


def test_serve_on_drain_tui_renders():
    """on_drain fires at drain cadence and the TUI formats real meters
    (loudness bars + numbers) from last_meters()."""
    from openmeters_tpu.tui import TuiView

    server = MeterServer(
        ServeConfig(n_streams=4, channels=2, engine=tiny_engine(), realtime=False,
                    fetch="meters", fetch_every=2)
    )
    frames = []
    view = TuiView(stream=0, width=24)

    def on_drain(s):
        meters = s.last_meters()
        assert meters
        frames.append(view.render(meters, now=time.perf_counter()))

    server.on_drain = on_drain
    feeder = Feeder(server.transport, n_threads=1)
    try:
        server.run(1.2)
    finally:
        feeder.stop()
        server.close()
    assert frames, "on_drain never fired"
    last = frames[-1]
    assert "LUFS" in last and "M " in last
    # a -20ish dBFS tone draws a partially-filled momentary bar
    assert "█" in last


def test_serve_checkpoint_resume_continuous_lufs(tmp_path):
    """Kill a serving loop mid-stream, restore its carry into a fresh server
    (new process analogue: new transport, new engine), and verify the LUFS
    timeline is CONTINUOUS — no 400 ms momentary warmup, and the fresh
    transport's first-data generation reset must not wipe the restored
    carry.  Reference analogue: flush-on-exit (main.rs:59)."""
    engine = EngineConfig(
        channels=2, spectrogram=None, spectrum=None,
        oscilloscope=None, stereometer=None, waveform=None,
    )
    cfg = ServeConfig(
        n_streams=2, channels=2, engine=engine, realtime=False, fetch="none"
    )
    rate, block = 48_000.0, 256

    def tone(n0: int, frames: int, amp: float) -> np.ndarray:
        t = np.arange(n0, n0 + frames, dtype=np.float64) / rate
        x = (amp * np.sin(2.0 * np.pi * 997.0 * t)).astype(np.float32)
        return np.stack([x, x], axis=-1)

    def feed_and_advance(server, n0: int, hops: int, amp: float) -> int:
        for _ in range(hops):
            blk = tone(n0, block, amp)
            ts = int(n0 / rate * 1e9)
            for st in range(2):
                server.transport.push_pcm(st, blk, ts)
            n0 += block
            server.advance()
        return n0

    s1 = MeterServer(cfg)
    n = feed_and_advance(s1, 0, 90, amp=0.25)  # 0.48 s: momentary window full
    m1 = s1.fetch_meters_now()
    key = next(k for k in m1 if "momentary" in k)
    l1 = np.asarray(m1[key])
    assert np.all(np.isfinite(l1))
    ckpt = str(tmp_path / "carry.npz")
    s1.checkpoint(ckpt)
    s1.close()  # "kill" the serving process

    # after the restart the program drops 20 dB: a server that truly
    # resumed still reads the loud window (73/75 of it); a fresh one only
    # ever saw the quiet tail — partial-window normalization would
    # otherwise make constant-level warmup invisible
    s2 = MeterServer(cfg)  # restarted process
    s2.restore(ckpt)
    s3 = MeterServer(cfg)  # control: no restore -> the window starts empty
    for server in (s2, s3):
        feed_and_advance(server, n, 2, amp=0.025)
    l2 = np.asarray(s2.fetch_meters_now()[key])
    l3 = np.asarray(s3.fetch_meters_now()[key])
    s2.close()
    s3.close()
    # resumed: momentary LUFS continues (2 quiet hops shave <0.3 LU off a
    # 75-hop loud window)
    assert np.all(np.abs(l2 - l1) < 0.3), (l1, l2)
    # control: only the quiet tail exists -> ~20 LU lower
    assert np.all(l3 < l1 - 15.0), (l1, l3)


def test_multi_rate_co_residency_at_scale():
    """Non-tiny co-residency: 64 streams per rate bucket stepped inside ONE
    jitted function (the tools/bench_multirate.py structure — both buckets
    on the same chip exactly as MultiRateMeterServer's back-to-back
    dispatches, meter.rs:20-25).  Each bucket's momentary LUFS must read its
    own producers' levels: a -6 dBFS 997 Hz tone at 44.1k and a -20 dBFS
    tone at 48k stay separated per bucket across all 128 streams."""
    import jax
    import jax.numpy as jnp

    from conftest import sine_wave

    s = 64
    engines = {
        r: MeterEngine(
            EngineConfig.at_rate(
                r, channels=2,
                spectrogram=None, spectrum=None,
                oscilloscope=None, stereometer=None, waveform=None,
            )
        )
        for r in (44_100.0, 48_000.0)
    }
    amps = {44_100.0: 10 ** (-6.0 / 20.0), 48_000.0: 10 ** (-20.0 / 20.0)}
    hops = 120  # >0.4 s of tone in both buckets

    blocks, metas, resets, carries = {}, {}, {}, {}
    for r, eng in engines.items():
        b = eng.config.block_frames
        tone = sine_wave(997.0, r, b * hops, amp=amps[r]).astype(np.float32)
        blk = tone.reshape(hops, 1, b, 1)
        blocks[r] = jnp.asarray(
            np.broadcast_to(blk, (hops, s, b, 1)) * np.ones((1, 1, 1, 2), np.float32)
        )
        metas[r] = StreamMeta.default(s, channels=2, pad_channels=2)
        resets[r] = np.zeros((s,), bool)
        carries[r] = eng.init(s)

    rates = sorted(engines)

    @jax.jit
    def run(c44, c48, b44, b48):
        def body(cs, i):
            c44, c48 = cs
            c44, sn44 = engines[rates[0]].step(
                c44, b44[i], metas[rates[0]], resets[rates[0]]
            )
            c48, sn48 = engines[rates[1]].step(
                c48, b48[i], metas[rates[1]], resets[rates[1]]
            )
            return (c44, c48), (
                sn44["loudness"].momentary_lufs, sn48["loudness"].momentary_lufs
            )
        return jax.lax.scan(body, (c44, c48), jnp.arange(hops))

    _, (m44, m48) = run(
        carries[rates[0]], carries[rates[1]], blocks[rates[0]], blocks[rates[1]]
    )
    m44 = np.asarray(m44)[-1]  # [s] final momentary per stream
    m48 = np.asarray(m48)[-1]
    # stereo 997 Hz tone at -6/-20 dBFS reads -6/-20 LUFS (selftest anchor)
    assert np.all(np.abs(m44 - m44[0]) < 1e-3), "bucket 44.1k not uniform"
    assert np.all(np.abs(m48 - m48[0]) < 1e-3), "bucket 48k not uniform"
    assert abs(float(m44[0]) - float(m48[0]) - 14.0) < 0.3, (m44[0], m48[0])
    assert abs(float(m44[0]) + 6.0) < 0.5, m44[0]


def test_serve_cadenced_spectrum_updates_every_r_hops():
    """A cadenced spectrum (hop = 4 engine blocks) served per-hop: the
    spectrum snapshot advances only on every 4th hop (its own DspBatcher
    cadence, meter.rs:15-80), holds between hops, and sees a pushed tone."""
    from openmeters_tpu.analyzers.spectrum import SpectrumConfig

    engine = EngineConfig(
        channels=2, spectrogram=None,
        spectrum=SpectrumConfig(fft_size=1024, hop_size=1024),
        oscilloscope=None, stereometer=None, waveform=None,
    )
    cfg = ServeConfig(
        n_streams=2, channels=2, engine=engine, realtime=False,
        fetch="full", fetch_every=1, coalesce_blocks=1,
    )
    server = MeterServer(cfg)
    assert server.engine.spectrum_cadence == 4
    rate, block = 48_000.0, 256
    t = np.arange(0, 24 * block, dtype=np.float64) / rate
    x = (0.5 * np.sin(2.0 * np.pi * 3000.0 * t)).astype(np.float32)
    stereo = np.stack([x, x], axis=-1)

    updated_flags = []
    raws = []
    try:
        for i in range(24):
            # amplitude steps per spectrum hop so consecutive spectrum
            # snapshots are distinguishable
            amp = 0.25 * (1 + i // 4)
            blk = amp * stereo[i * block : (i + 1) * block]
            ts = int(i * block / rate * 1e9)
            for st in range(2):
                server.transport.push_pcm(st, blk, ts)
            server.advance()
            m = server.fetch_meters_now()
            key = next(k for k in m if "spectrum" in k and "updated" in k)
            raw_key = next(k for k in m if "spectrum" in k and "raw_db" in k)
            updated_flags.append(bool(np.asarray(m[key])[0]))
            raws.append(np.asarray(m[raw_key]).copy())
        # before the first spectrum hop completes (i=3) the held snapshot is
        # the init-time "no data" emit: updated False, floor dB
        assert updated_flags == [i >= 3 for i in range(24)], updated_flags
        floor = server.engine.config.spectrum.floor_db
        for i in range(3):
            np.testing.assert_array_equal(raws[i], floor)
        # the snapshot refreshes ONLY at i % 4 == 3 and holds in between
        for i in range(3, 24):
            j = 3 + 4 * ((i - 3) // 4)  # the spectrum hop this i holds
            np.testing.assert_array_equal(raws[i], raws[j])
        for j in range(3, 20, 4):
            assert not np.array_equal(raws[j], raws[j + 4]), (
                f"spectrum did not refresh between hops {j} and {j + 4}"
            )
        raw = raws[-1]  # [S, 2, bins]
        bins = np.fft.rfftfreq(1024, 1.0 / rate)
        peak_bin = int(np.argmax(raw[0, 0]))
        assert abs(bins[peak_bin] - 3000.0) < 100.0
    finally:
        server.close()


def test_serve_apply_settings_live_floor_change():
    """Live reconfiguration: a running server applies a spectrum floor change
    without dropping the loudness window or the spectrum's PCM state
    (reference VisualManager::apply_module_settings -> update_config,
    registry.rs:345, spectrum/processor.rs:300-326)."""
    import dataclasses as dc

    from openmeters_tpu.analyzers.spectrum import SpectrumConfig

    engine = EngineConfig(
        channels=2, spectrogram=None,
        spectrum=SpectrumConfig(fft_size=1024, hop_size=1024),
        oscilloscope=None, stereometer=None, waveform=None,
    )
    cfg = ServeConfig(
        n_streams=2, channels=2, engine=engine, realtime=False,
        fetch="full", fetch_every=1, coalesce_blocks=1,
    )
    server = MeterServer(cfg)
    rate, block = 48_000.0, 256
    t = np.arange(0, 48 * block, dtype=np.float64) / rate
    x = (0.5 * np.sin(2.0 * np.pi * 997.0 * t)).astype(np.float32)
    stereo = np.stack([x, x], axis=-1)

    def hop(i):
        blk = stereo[i * block : (i + 1) * block]
        ts = int(i * block / rate * 1e9)
        for st in range(2):
            server.transport.push_pcm(st, blk, ts)
        server.advance()
        return server.fetch_meters_now()

    try:
        for i in range(16):
            m = hop(i)
        mom_key = next(k for k in m if "momentary" in k)
        raw_key = next(k for k in m if "spectrum" in k and "raw_db" in k)
        mom_before = float(np.asarray(m[mom_key])[0])
        assert mom_before > -10  # window is warm
        assert float(np.asarray(m[raw_key])[0, 0].max()) > -30

        server.apply_settings(
            dc.replace(
                engine, spectrum=dc.replace(engine.spectrum, floor_db=-90.0)
            )
        )
        assert server.engine.config.spectrum.floor_db == -90.0

        # the very next hop: loudness window kept (no warmup dip)
        m = hop(16)
        mom_after = float(np.asarray(m[mom_key])[0])
        assert abs(mom_after - mom_before) < 0.1, (mom_before, mom_after)
        # spectrum PCM kept: the next spectrum-hop boundary re-emits the
        # tone column (never refilled from scratch)
        for i in range(17, 24):
            m = hop(i)
        raw = np.asarray(m[raw_key])
        assert float(raw[0, 0].max()) > -30
        # and the new floor is in effect
        assert float(raw[0, 0].min()) == pytest.approx(-90.0)
        # server continues to serve correct meters across the swap
        assert float(np.asarray(m[mom_key])[0]) > -10
    finally:
        server.close()


def test_serve_apply_settings_rejects_rate_change():
    import dataclasses as dc

    engine = EngineConfig(
        channels=2, spectrogram=None, spectrum=None,
        oscilloscope=None, stereometer=None, waveform=None,
    )
    cfg = ServeConfig(n_streams=1, channels=2, engine=engine, realtime=False)
    server = MeterServer(cfg)
    try:
        with pytest.raises(ValueError, match="sample_rate"):
            server.apply_settings(
                dc.replace(engine, sample_rate=96_000.0, block_frames=512)
            )
    finally:
        server.close()


def test_positions_5_1_through_socket(tmp_path):
    """Channel positions end to end (reference stream.rs:24-264 +
    dsp.rs:79-176): a 5.1 producer announces positions in HELLO; the ingest
    runtime threads them into the serving engine's per-stream weights —
    LFE is excluded from LUFS (weight 0) and surround channels get x1.41
    (loudness/processor.rs:174-183)."""
    import threading

    from openmeters_tpu.ingest.runtime import ProducerClient
    from openmeters_tpu.serve import MultiRateMeterServer

    sock = str(tmp_path / "pos.sock")
    engine = EngineConfig(
        channels=6, spectrogram=None, spectrum=None,
        oscilloscope=None, stereometer=None, waveform=None,
    )
    server = MultiRateMeterServer(
        ServeConfig(n_streams=3, channels=6, engine=engine, realtime=True,
                    fetch="meters", fetch_every=2),
        rates=(48_000.0,),
        socket_path=sock,
    )
    positions = ["FL", "FR", "FC", "LFE", "RL", "RR"]
    rate = 48_000.0
    burst_s = 0.9
    done = {}

    def produce(name: str, tone_channel: int):
        c = ProducerClient(sock, {"app_name": name, "channels": 6,
                                  "sample_rate": rate, "positions": positions})
        slot = c.connect()
        assert slot is not None and c.channels == 6
        assert c.positions == positions  # normalized echo
        block, total, n = 256, int(burst_s * rate), 0
        while n < total:
            t = np.arange(n, n + block, dtype=np.float64) / rate
            x = np.zeros((block, 6), np.float32)
            x[:, tone_channel] = 0.5 * np.sin(2 * np.pi * 997.0 * t)
            c.send_pcm(x, int(n / rate * 1e9))
            n += block
        done[name].set()
        done["stop"].wait(timeout=60)
        c.close()

    producers = {"fl": 0, "lfe": 3, "rl": 4}
    done = {name: threading.Event() for name in producers}
    done["stop"] = threading.Event()
    threads = [
        threading.Thread(target=produce, args=(nm, ch), daemon=True)
        for nm, ch in producers.items()
    ]
    for t in threads:
        t.start()
    try:
        for name in producers:
            assert done[name].wait(timeout=60.0), name
        srv = server.servers[rate]
        deadline = time.monotonic() + 30.0
        want = int(burst_s * rate)
        last = [-1] * 3
        while time.monotonic() < deadline:
            now = [srv.transport.buffered_frames(s) for s in range(3)]
            if all(n >= want and n == l for n, l in zip(now, last)):
                break
            last = now
            time.sleep(0.05)
        slots = {}
        view = server.runtime.view()
        for key, stats in view["links"].items():
            for nm in producers:
                if nm in key:
                    slots[nm] = stats["slot"]
        assert len(slots) == 3, view["links"]

        peaks = {}

        def cb(s):
            m = s.last_meters()
            if m:
                key = next(k for k in m if "momentary" in k)
                vals = np.asarray(m[key], np.float64)
                for slot, v in enumerate(vals):
                    peaks[slot] = max(peaks.get(slot, -np.inf), v)

        srv.on_drain = cb
        server.run(0.3)
        blk = srv.engine.config.block_frames
        while max(srv.transport.buffered_frames(s) for s in range(3)) >= blk:
            srv.advance()
        srv.fetch_meters_now()
        cb(srv)
    finally:
        done["stop"].set()
        server.close()

    fl, lfe, rl = (peaks[slots[n]] for n in ("fl", "lfe", "rl"))
    # a -6 dBFS tone on FL alone reads -0.691 + 10log10(0.5*0.25) ~= -9.7
    assert -11.0 < fl < -8.5, (fl, peaks)
    # the LFE channel is excluded from loudness entirely
    assert lfe < fl - 30.0, (lfe, fl)
    # surround weight 1.41 lifts the rear-left tone by 10log10(1.41) dB
    assert rl - fl == pytest.approx(10 * np.log10(1.41), abs=0.15), (rl, fl)


def test_declare_view_bounds_history_retention():
    """pre_ingest retention feedback (reference registry.rs:181-209): a
    consumer's declared display width bounds the session's history
    retention; a greedy declaration clamps at the reference byte budget
    (spectrogram/processor.rs:60-61,144-158)."""
    from openmeters_tpu.analyzers.waveform import WaveformConfig

    engine = EngineConfig(
        channels=2,
        spectrogram=SpectrogramConfig(fft_size=256, hop_size=64,
                                      use_reassignment=False),
        spectrum=None, oscilloscope=None, stereometer=None,
        waveform=WaveformConfig(analyze_bands=False),
    )
    cfg = ServeConfig(
        n_streams=2, channels=2, engine=engine, realtime=False,
        fetch="full", fetch_every=1, coalesce_blocks=1,
    )
    server = MeterServer(cfg)
    try:
        granted = server.declare_view(
            stream=0, spectrogram_columns=48, waveform_columns=16
        )
        assert granted == {"spectrogram_columns": 48, "waveform_columns": 16}
        # a greedy consumer clamps at the budget caps
        greedy = server.declare_view(
            stream=0, spectrogram_columns=10**9, waveform_columns=10**9
        )
        assert greedy["spectrogram_columns"] <= 8192
        assert greedy["waveform_columns"] == 8192
        server.declare_view(stream=0, spectrogram_columns=48, waveform_columns=16)

        rate, block = 48_000.0, 256
        t = np.arange(0, 120 * block, dtype=np.float64) / rate
        x = (0.5 * np.sin(2.0 * np.pi * 997.0 * t)).astype(np.float32)
        stereo = np.stack([x, x], axis=-1)
        for i in range(120):
            blk = stereo[i * block : (i + 1) * block]
            ts = int(i * block / rate * 1e9)
            for st in range(2):
                server.transport.push_pcm(st, blk, ts)
            server.advance()
        while server._inflight:  # noqa: SLF001
            server._drain_one()  # noqa: SLF001

        sg = server._view_histories["spectrogram"]  # noqa: SLF001
        wf = server._view_histories["waveform"]  # noqa: SLF001
        # 120 blocks at hop 64 produce ~480 spectrogram columns and many
        # waveform columns; retention stays at the declared widths
        assert sg.filled == 48
        assert sg.data.nbytes == 48 * (256 // 2 + 1) * 2
        assert len(wf.columns) == 16
        # the ring holds real data (tone columns, not zeros)
        assert int(sg.view().max()) > 0
    finally:
        server.close()


def test_serve_apply_settings_async_swaps_at_hop_boundary():
    """The async reconfiguration path: the old pipeline keeps serving while
    the new one compiles on a background thread, and advance() adopts the
    staged swap with the same field-level retention as the sync path
    (reference registry.rs:345 applies synchronously; a compiled-graph
    runtime must not stall the hop cadence for a recompile)."""
    import dataclasses as dc

    from openmeters_tpu.analyzers.spectrum import SpectrumConfig

    engine = EngineConfig(
        channels=2, spectrogram=None,
        spectrum=SpectrumConfig(fft_size=1024, hop_size=1024),
        oscilloscope=None, stereometer=None, waveform=None,
    )
    cfg = ServeConfig(
        n_streams=2, channels=2, engine=engine, realtime=False,
        fetch="full", fetch_every=1, coalesce_blocks=1,
    )
    server = MeterServer(cfg)
    rate, block = 48_000.0, 256
    t = np.arange(0, 64 * block, dtype=np.float64) / rate
    x = (0.5 * np.sin(2.0 * np.pi * 997.0 * t)).astype(np.float32)
    stereo = np.stack([x, x], axis=-1)

    def hop(i):
        blk = stereo[i * block : (i + 1) * block]
        ts = int(i * block / rate * 1e9)
        for st in range(2):
            server.transport.push_pcm(st, blk, ts)
        server.advance()
        return server.fetch_meters_now()

    try:
        for i in range(16):
            m = hop(i)
        mom_key = next(k for k in m if "momentary" in k)
        mom_before = float(np.asarray(m[mom_key])[0])
        assert mom_before > -10  # window is warm

        th = server.apply_settings_async(
            dc.replace(
                engine, spectrum=dc.replace(engine.spectrum, floor_db=-90.0)
            )
        )
        assert server.reconfig_pending
        # a second request while one is in flight is refused
        with pytest.raises(RuntimeError, match="already in flight"):
            server.apply_settings_async(engine)
        # the OLD config keeps serving while the compile runs
        i = 16
        while server.reconfig_pending and i < 40:
            m = hop(i)
            i += 1
            assert m is not None or server.reconfig_pending
        th.join(timeout=300.0)  # generous: a loaded CI box compiles slowly
        assert not th.is_alive(), "background compile did not finish"
        assert server._pending_swap is not None or not server.reconfig_pending
        m = hop(i)  # this advance adopts the staged pipeline
        assert not server.reconfig_pending
        assert server.engine.config.spectrum.floor_db == -90.0
        # retention across the swap: no loudness warmup dip
        mom_after = float(np.asarray(m[mom_key])[0])
        assert abs(mom_after - mom_before) < 0.5, (mom_before, mom_after)
        # and the swapped pipeline serves the new floor
        for j in range(i + 1, i + 9):
            m = hop(j)
        raw_key = next(k for k in m if "spectrum" in k and "raw_db" in k)
        assert float(np.asarray(m[raw_key])[0, 0].min()) == pytest.approx(-90.0)
    finally:
        server.close()


def test_serve_apply_settings_async_validation_is_synchronous():
    import dataclasses as dc

    server = MeterServer(
        ServeConfig(n_streams=1, channels=2, engine=tiny_engine(), realtime=False)
    )
    try:
        with pytest.raises(ValueError, match="sample_rate"):
            server.apply_settings_async(
                dc.replace(tiny_engine(), sample_rate=96_000.0, block_frames=512)
            )
        assert not server.reconfig_pending
    finally:
        server.close()


def test_settings_watcher_hot_reloads_running_server(tmp_path):
    """attach_settings_watcher: editing the persisted settings JSON while
    the loop runs recompiles in the background and swaps at a hop boundary
    (the headless config page; the GUI equivalent drives
    apply_module_settings, registry.rs:345)."""
    import dataclasses as dc

    from openmeters_tpu.persistence import encode_settings, write_json_atomic
    from openmeters_tpu.serve import attach_settings_watcher

    path = str(tmp_path / "settings.json")
    engine = tiny_engine()
    write_json_atomic(path, encode_settings(engine))
    server = MeterServer(
        ServeConfig(
            n_streams=1, channels=2, engine=engine, realtime=False,
            fetch="meters", fetch_every=1, coalesce_blocks=1,
        )
    )
    drains = []
    server.on_drain = lambda s: drains.append(s.stats.hops)
    attach_settings_watcher(server, path, min_interval=0.0)
    rate, block = 48_000.0, 256
    blk = np.zeros((block, 2), np.float32)

    def hop(i):
        server.transport.push_pcm(0, blk, int(i * block / rate * 1e9))
        server.advance()

    try:
        for i in range(4):
            hop(i)
        assert drains, "watcher must compose with the existing drain callback"
        # edit the settings file: disable the spectrogram, enable waveform
        new_cfg = dc.replace(engine, spectrogram=None)
        write_json_atomic(path, encode_settings(new_cfg))
        deadline = time.monotonic() + 90.0
        i = 4
        while time.monotonic() < deadline:
            hop(i)
            i += 1
            if (
                not server.reconfig_pending
                and "spectrogram" not in server.engine.analyzers
            ):
                break
            time.sleep(0.01)
        assert "spectrogram" not in server.engine.analyzers
        # the loop kept serving throughout and still drains meters
        m = server.fetch_meters_now()
        assert m is not None and m
    finally:
        server.close()


def test_key_controls_pause_and_quit():
    """attach_key_controls: p toggles pause from the tick hook (which fires
    even while paused — a drain-hooked key reader would deadlock on pause),
    q ends run() early (reference keyboard shortcuts, message.rs:59-83)."""
    import os

    from openmeters_tpu.tui import attach_key_controls

    server = MeterServer(
        ServeConfig(
            n_streams=1, channels=2, engine=tiny_engine(), realtime=False,
            fetch="none",
        )
    )
    r, w = os.pipe()
    rf = os.fdopen(r, "rb", buffering=0)
    try:
        attach_key_controls(server, source=rf)
        os.write(w, b"p")
        server.run(0.2)
        assert server.paused
        assert server.stats.hops == 0  # paused advances consume nothing
        os.write(w, b" ")  # space unpauses too
        server.run(0.2)
        assert not server.paused
        assert server.stats.hops > 0
        hops = server.stats.hops
        os.write(w, b"q")
        t0 = time.monotonic()
        server.run(30.0)
        assert time.monotonic() - t0 < 5.0  # q ended the loop early
        assert server.stats.hops >= hops
    finally:
        rf.close()
        os.close(w)
        server.close()


def test_fetch_spectrum_display_clock():
    """fetch_spectrum: the hop loop never ships the bulk [S, T, bins] dB
    arrays; a display consumer reads them at its own clock
    (frame_clock.rs:102-118 semantics).  Covers both spectrum placements:
    fused in the hop step (cadence 1) and the held cadenced snapshot."""
    import dataclasses as dc

    from openmeters_tpu.analyzers.spectrum import SpectrumConfig

    for hop in (256, 1024):  # cadence 1 (fused) and cadence 4 (held snap)
        engine = dc.replace(
            tiny_engine(),
            spectrum=SpectrumConfig(fft_size=2048, hop_size=hop),
        )
        server = MeterServer(
            ServeConfig(n_streams=2, channels=2, engine=engine,
                        realtime=False, fetch="meters")
        )
        rate, block = 48_000.0, 256
        t = (np.arange(block * 80) / rate)
        tone = (0.5 * np.sin(2 * np.pi * 997.0 * t)).astype(np.float32)
        try:
            for i in range(80):
                seg = tone[i * block:(i + 1) * block]
                server.transport.push_pcm(
                    0, np.stack([seg, seg], -1), int(i * block / rate * 1e9)
                )
                server.transport.push_pcm(
                    1, np.stack([seg, seg], -1), int(i * block / rate * 1e9)
                )
                server.advance()
            snap = server.fetch_spectrum()
            assert snap is not None
            raw = np.asarray(snap.raw_db)
            assert raw.shape[0] == 2 and raw.shape[-1] == 2048 // 2 + 1
            assert np.isfinite(raw).all()
            # the 997 Hz tone peaks near bin 997/(48000/2048) ~= 42.5
            peak = int(np.argmax(raw[0, 0]))
            assert abs(peak - 42.5) < 2.0, (hop, peak)
        finally:
            server.close()

    # spectrum disabled -> None (no crash)
    server = MeterServer(
        ServeConfig(n_streams=1, channels=2, engine=tiny_engine(),
                    realtime=False, fetch="none")
    )
    try:
        assert server.fetch_spectrum() is None
    finally:
        server.close()


def test_tui_spectrum_sparkline_pane():
    """TuiView renders a log-frequency sparkline pane from a spectrum
    snapshot (the spectrum view's log x-scale, spectrum/state.rs:26-120)."""
    from openmeters_tpu.analyzers.spectrum import SpectrumSnapshot
    from openmeters_tpu.tui import TuiView

    bins = 1025
    raw = np.full((2, 1, bins), -100.0, np.float32)
    raw[0, 0, 100] = -6.0  # one hot bin
    snap = SpectrumSnapshot(
        weighted_db=raw.copy(), raw_db=raw, updated=np.ones((2,), bool)
    )
    view = TuiView(stream=0, width=32)
    out = view.render({}, now=0.0, spectrum=snap)
    assert "SP " in out and "dB pk" in out
    assert "-6.0" in out
    # exactly one bucket rises above the floor from the single hot bin,
    # and it sits near the top of the scale (-6 dB in [-100, 0] -> 7/8)
    spark = [ln for ln in out.splitlines() if ln.startswith("SP ")][0]
    raised = [c for c in spark if c in "▁▂▃▄▅▆▇█"]
    assert raised == ["▇"], spark
    # out-of-range stream index renders no spectrum pane instead of crashing
    view_oob = TuiView(stream=7, width=32)
    assert "SP " not in view_oob.render({}, now=0.0, spectrum=snap)


def test_key_controls_toggle_analyzers():
    """Keys 1-6 are the headless config page's visual toggles
    (ui/config.rs -> registry.rs set_enabled): a live toggle rides
    apply_settings_async (hop-boundary swap), the disabled analyzer's
    settings are stashed for re-enable, and the last enabled analyzer
    refuses to toggle off."""
    import dataclasses as dc
    import os

    from openmeters_tpu.tui import attach_key_controls

    engine = dc.replace(
        tiny_engine(),
        spectrogram=SpectrogramConfig(
            fft_size=512, hop_size=128, use_reassignment=False
        ),
    )
    server = MeterServer(
        ServeConfig(n_streams=1, channels=2, engine=engine, realtime=False,
                    fetch="meters")
    )
    r, w = os.pipe()
    rf = os.fdopen(r, "rb", buffering=0)
    rate, block = 48_000.0, 256
    blk = np.zeros((block, 2), np.float32)
    hop_i = [0]

    def hops_until(pred, bound=600):
        for _ in range(bound):
            i = hop_i[0]
            hop_i[0] += 1
            server.transport.push_pcm(0, blk, int(i * block / rate * 1e9))
            if server.on_tick is not None:
                server.on_tick(server)
            server.advance()
            if pred():
                return True
            if server.reconfig_pending:
                # the swap is a real background XLA compile — give it
                # wall-clock time instead of racing it with empty hops
                time.sleep(0.05)
        return False

    try:
        attach_key_controls(server, source=rf)
        sg_cfg = server.engine.config.spectrogram
        assert sg_cfg.fft_size == 512

        os.write(w, b"2")  # toggle spectrogram OFF
        assert hops_until(
            lambda: not server.reconfig_pending
            and "spectrogram" not in server.engine.analyzers
        )
        # loudness is now the only analyzer: '1' must refuse (no pending)
        os.write(w, b"1")
        assert hops_until(lambda: True, bound=3)
        assert not server.reconfig_pending
        assert "loudness" in server.engine.analyzers

        os.write(w, b"2")  # toggle spectrogram back ON
        assert hops_until(
            lambda: not server.reconfig_pending
            and "spectrogram" in server.engine.analyzers
        )
        # the stash restored the non-default 512-pt settings, not the stock
        assert server.engine.config.spectrogram.fft_size == 512
        # the restored analyzer serves: meters drain with spectrogram leaves
        m = server.fetch_meters_now()
        assert m is not None and any("spectrogram" in k for k in m)
    finally:
        rf.close()
        os.close(w)
        server.close()


def test_multirate_apply_settings_per_bucket():
    """MultiRateMeterServer.apply_settings rebuilds every rate bucket with
    its own transport-owned rate/block geometry (the reference rebuilds
    processors per rate on settings changes, meter.rs:20-25)."""
    import dataclasses as dc

    from openmeters_tpu.serve import MultiRateMeterServer

    cfg = ServeConfig(n_streams=1, channels=2, engine=tiny_engine(), realtime=False)
    server = MultiRateMeterServer(cfg, rates=(48_000.0, 44_100.0))
    try:
        blocks = {
            r: s.engine.config.block_frames for r, s in server.servers.items()
        }
        server.apply_settings(dc.replace(tiny_engine(), spectrogram=None))
        for r, s in server.servers.items():
            assert "spectrogram" not in s.engine.analyzers
            assert s.engine.config.sample_rate == r
            assert s.engine.config.block_frames == blocks[r]
            assert not s.reconfig_pending
    finally:
        server.close()
