"""Hermetic session-runtime integration: real producer processes over a
Unix socket driving the transport under churn.

The reference's answer to "multi-node without a cluster" is to spawn the
real middleware in isolation (live_tests.rs:153-342: private PipeWire +
WirePlumber + audiotestsrc fixtures, then graph-invariant gauntlets).  The
TPU rebuild's middleware boundary is the SessionRuntime socket protocol, so
these tests spawn *real OS producer processes* (openmeters_tpu.ingest
.producer) and assert the routing/reset/recovery invariants end to end:
identity -> slot routing, remembered re-acquisition after disconnects,
format-generation resets, truncation, and kill -9 churn.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from openmeters_tpu.ingest import Transport
from openmeters_tpu.ingest.runtime import ProducerClient, SessionRuntime

RATE = 48_000.0
BLOCK = 256


@pytest.fixture()
def runtime(tmp_path):
    tp = Transport(n_streams=2, channels=2, block_frames=BLOCK, sample_rate=RATE)
    sock = str(tmp_path / "om.sock")
    rt = SessionRuntime(tp, sock)
    yield tp, rt, sock
    rt.shutdown()


def spawn_producer(sock, *args):
    return subprocess.Popen(
        [
            sys.executable,
            "-m",
            "openmeters_tpu.ingest.producer",
            "--socket",
            sock,
            *map(str, args),
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )


def drain(tp, hops=400, sleep=0.002):
    """Assemble until backlog drains; returns (per-slot nonzero frame counts,
    per-slot reset counts)."""
    filled = np.zeros(tp.n_streams, np.int64)
    resets = np.zeros(tp.n_streams, np.int64)
    for _ in range(hops):
        batch, reset, underrun, live = tp.assemble()
        filled += np.count_nonzero(np.asarray(batch)[:, :, 0], axis=1)
        resets += np.asarray(reset).astype(np.int64)
        time.sleep(sleep)
    return filled, resets


def test_two_producers_route_by_identity(runtime):
    tp, rt, sock = runtime
    # long realtime streams so both are live at once (process startup in
    # this image pays a ~3 s sitecustomize JAX import); terminated after
    # the assertions rather than run to completion
    p1 = spawn_producer(
        sock, "--app-name", "alpha", "--freq", "220", "--seconds", "60", "--realtime"
    )
    slot1 = int(p1.stdout.readline().split()[1])  # connected, still live
    p2 = spawn_producer(
        sock, "--app-name", "beta", "--freq", "347", "--seconds", "60", "--realtime"
    )
    slot2 = int(p2.stdout.readline().split()[1])
    try:
        assert {slot1, slot2} == {0, 1}
        # drain while both are live (disconnect faults discard the backlog)
        filled, _ = drain(tp, hops=300, sleep=0.004)
    finally:
        p1.terminate()
        p2.terminate()
        p1.wait(timeout=10)
        p2.wait(timeout=10)

    assert filled[slot1] > 0.2 * RATE and filled[slot2] > 0.2 * RATE

    view = rt.view()
    assert view["links"]["app.name:alpha"]["slot"] == slot1
    assert view["links"]["app.name:beta"]["slot"] == slot2
    assert not view["truncated"]


def test_reconnect_reacquires_remembered_slot(runtime):
    tp, rt, sock = runtime
    p = spawn_producer(sock, "--app-name", "alpha", "--seconds", "0.2")
    out, _ = p.communicate(timeout=30)
    slot_first = int(out.split()[1])
    drain(tp, hops=60, sleep=0)

    # an unrelated producer appears meanwhile — must NOT steal alpha's slot
    q = spawn_producer(sock, "--app-name", "other", "--seconds", "0.1")
    q.communicate(timeout=30)

    p2 = spawn_producer(sock, "--app-name", "alpha", "--seconds", "0.2")
    out2, _ = p2.communicate(timeout=30)
    slot_second = int(out2.split()[1])
    assert slot_second == slot_first  # remembered identity re-acquired

    # the reconnect bumped the generation: exactly one reset on that slot
    _, resets = drain(tp, hops=80, sleep=0)
    assert resets[slot_first] >= 1


def test_truncation_refuses_excess_producers(runtime):
    tp, rt, sock = runtime
    keep = []
    for name in ("a", "b"):
        c = ProducerClient(sock, {"app_name": name})
        assert c.connect() is not None
        keep.append(c)
    c3 = ProducerClient(sock, {"app_name": "c"})
    assert c3.connect() is None  # Plan::truncated
    assert rt.view()["truncated"]
    for c in keep:
        c.close()


def test_format_switch_resets_at_boundary(runtime):
    tp, rt, sock = runtime
    p = spawn_producer(
        sock, "--app-name", "alpha", "--seconds", "1.0", "--realtime",
        "--format-switch-at", "0.5",
    )
    slot = int(p.stdout.readline().split()[1])
    # drain while live: the disconnect fault at stream end discards backlog
    _, resets = drain(tp, hops=300, sleep=0.004)
    p.communicate(timeout=30)
    assert p.returncode == 0
    # one reset for the initial generation, one for the renegotiation
    assert resets[slot] >= 2


def test_runtime_restart_producer_recovers(tmp_path):
    """Server-restart recovery (reference live_tests.rs:529-586): the
    SessionRuntime dies mid-stream; the producer reconnects through its
    session Backoff against the replacement runtime and audio flows again."""
    import threading

    tp = Transport(n_streams=2, channels=2, block_frames=BLOCK, sample_rate=RATE)
    sock = str(tmp_path / "om.sock")
    rt1 = SessionRuntime(tp, sock)

    stop = threading.Event()
    reconnects = []

    def resilient_producer():
        n = 0
        while not stop.is_set():
            try:
                c = ProducerClient(sock, {"app_name": "phoenix"}, timeout=15.0)
                slot = c.connect()
                if slot is None:
                    time.sleep(0.05)
                    continue
                reconnects.append(slot)
                while not stop.is_set():
                    x = 0.25 * np.ones((BLOCK, 2), np.float32)
                    c.send_pcm(x, int(n / RATE * 1e9))
                    n += BLOCK
                    time.sleep(BLOCK / RATE)
            except OSError:
                time.sleep(0.02)  # link died: retry via a fresh connect

    t = threading.Thread(target=resilient_producer, daemon=True)
    t.start()
    try:
        # audio flows through the first runtime
        deadline = time.monotonic() + 10.0
        filled = np.zeros(2, np.int64)
        while time.monotonic() < deadline and filled.sum() < 0.1 * RATE:
            batch, _, _, _ = tp.assemble()
            filled += np.count_nonzero(np.asarray(batch)[:, :, 0], axis=1)
            time.sleep(0.004)
        assert filled.sum() > 0.1 * RATE

        # the server dies (socket gone); producer enters backoff
        rt1.shutdown()
        time.sleep(0.3)

        # replacement runtime on the same socket + transport
        rt2 = SessionRuntime(tp, sock)
        try:
            deadline = time.monotonic() + 15.0
            refilled = np.zeros(2, np.int64)
            while time.monotonic() < deadline and refilled.sum() < 0.1 * RATE:
                batch, _, _, _ = tp.assemble()
                refilled += np.count_nonzero(np.asarray(batch)[:, :, 0], axis=1)
                time.sleep(0.004)
            assert refilled.sum() > 0.1 * RATE  # recovered through rt2
            assert len(reconnects) >= 2  # the client reconnected
            assert "app.name:phoenix" in rt2.view()["active"]
        finally:
            stop.set()
            t.join(timeout=5)
            rt2.shutdown()
    finally:
        stop.set()


def test_mono_producer_negotiates_and_pads(runtime):
    """A 1-channel producer must deliver correct audio into channel 0 with
    channel 1 zero-padded — the round-2 OOB-read regression case
    (stream.rs:24-264 per-stream formats)."""
    tp, rt, sock = runtime
    c = ProducerClient(sock, {"app_name": "mono", "channels": 1})
    slot = c.connect()
    assert slot is not None and c.channels == 1
    try:
        x = 0.25 * np.ones((BLOCK * 8,), np.float32)
        c.send_pcm(x, 0)  # 1-D payload: client shapes to [frames, 1]
        time.sleep(0.1)
        batch, reset, _, _ = tp.assemble()
        assert reset[slot]  # generation reset on connect
        got = np.asarray(batch)[slot]
        assert np.allclose(got[:, 0], 0.25), got[:4]
        assert np.allclose(got[:, 1], 0.0)
    finally:
        c.close()


def test_wide_producer_clamped_to_negotiated(runtime):
    """An 8-channel announce clamps to the transport width; the client
    honors the negotiated count so the framed protocol stays in sync."""
    tp, rt, sock = runtime
    c = ProducerClient(sock, {"app_name": "wide", "channels": 8})
    slot = c.connect()
    assert slot is not None
    assert c.channels == 2 and c.max_channels == 2
    try:
        pcm = np.tile(
            np.asarray([[0.1, 0.2, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9]], np.float32),
            (BLOCK * 4, 1),
        )
        c.send_pcm(pcm, 0)  # truncated to the negotiated 2 columns
        time.sleep(0.1)
        batch, _, _, _ = tp.assemble()
        got = np.asarray(batch)[slot]
        assert np.allclose(got[:, 0], 0.1) and np.allclose(got[:, 1], 0.2)
    finally:
        c.close()


def test_rate_switch_between_heterogeneous_width_buckets(tmp_path):
    """FORMAT rate changes across buckets of different transport widths:
    the HELLO-time clamp bound holds for the whole link (the client mirrors
    it), wide producers keep their full width in their wide bucket, a
    re-route the new bucket can carry proceeds, and one it cannot carry
    drops the link cleanly instead of desyncing the payload framing."""
    tp2 = Transport(n_streams=2, channels=2, block_frames=BLOCK, sample_rate=RATE)
    tp6 = Transport(
        n_streams=2, channels=6, block_frames=BLOCK, sample_rate=44_100.0
    )
    sock = str(tmp_path / "hetero.sock")
    rt = SessionRuntime({RATE: tp2, 44_100.0: tp6}, sock)
    try:
        # a surround producer keeps its 6 channels in the 6-wide bucket
        c = ProducerClient(sock, {"app_name": "roam", "channels": 6,
                                  "sample_rate": 44_100.0})
        slot = c.connect()
        assert slot is not None
        assert c.max_channels == 6 and c.channels == 6
        pcm = np.tile(np.asarray([[0.25, -0.25]], np.float32), (BLOCK * 4, 1))
        c.send_pcm(pcm, 0)  # client pads the 2-col payload to 6 negotiated
        time.sleep(0.1)
        got = np.asarray(tp6.assemble()[0])[slot]
        assert np.allclose(got[:, 0], 0.25) and np.allclose(got[:, 1], -0.25)
        assert np.allclose(got[:, 2:], 0.0)

        # narrowing re-route the new bucket CAN carry: proceeds in lockstep
        c.send_format(2, sample_rate=RATE)
        assert c.channels == 2
        c.send_pcm(pcm, int(BLOCK * 4 / 44_100.0 * 1e9))
        time.sleep(0.1)
        deadline = time.monotonic() + 5.0
        filled = 0
        while time.monotonic() < deadline and filled < BLOCK:
            batch, _, _, _ = tp2.assemble()
            got2 = np.asarray(batch)[0]
            filled += int(np.count_nonzero(got2[:, 0] == 0.25))
            time.sleep(0.004)
        assert filled >= BLOCK  # audio parses intact at the new rate
        c.close()

        # a re-route the new bucket CANNOT carry (6ch -> 2-wide bucket)
        # drops the link: the identity leaves the active view
        c2 = ProducerClient(sock, {"app_name": "wide6", "channels": 6,
                                   "sample_rate": 44_100.0})
        assert c2.connect() is not None and c2.channels == 6
        c2.send_format(6, sample_rate=RATE)
        deadline = time.monotonic() + 5.0
        while time.monotonic() < deadline:
            if "app.name:wide6" not in rt.view()["active"]:
                break
            time.sleep(0.02)
        assert "app.name:wide6" not in rt.view()["active"]
        c2.close()
    finally:
        rt.shutdown()


def test_surround_producer_six_channels(tmp_path):
    """A 5.1 producer on a 6-wide transport delivers every channel into its
    own lane (the reference's <=8-channel envelope, dsp.rs:6; per-stream
    format negotiation stream.rs:24-264)."""
    tp = Transport(n_streams=2, channels=6, block_frames=BLOCK, sample_rate=RATE)
    sock = str(tmp_path / "om6.sock")
    rt = SessionRuntime(tp, sock)
    try:
        c = ProducerClient(sock, {"app_name": "cinema", "channels": 6})
        slot = c.connect()
        assert slot is not None and c.channels == 6
        try:
            vals = np.asarray([0.1, 0.2, 0.3, 0.4, 0.5, 0.6], np.float32)
            c.send_pcm(np.tile(vals[None, :], (BLOCK * 4, 1)), 0)
            time.sleep(0.1)
            batch, reset, _, _ = tp.assemble()
            assert reset[slot]
            got = np.asarray(batch)[slot]
            for ch in range(6):
                assert np.allclose(got[:, ch], vals[ch]), (ch, got[:2])
        finally:
            c.close()
    finally:
        rt.shutdown()


def test_mid_stream_channel_switch_resets_cleanly(runtime):
    """FORMAT stereo->mono mid-stream: old spans keep their layout, new
    payload parses at the new width, one reset lands at the boundary."""
    tp, rt, sock = runtime
    c = ProducerClient(sock, {"app_name": "switcher", "channels": 2})
    slot = c.connect()
    try:
        stereo = np.tile(np.asarray([[0.5, -0.5]], np.float32), (BLOCK * 2, 1))
        c.send_pcm(stereo, 0)
        c.send_format(1)
        assert c.channels == 1
        mono = 0.125 * np.ones((BLOCK * 2, 1), np.float32)
        c.send_pcm(mono, int(BLOCK * 2 / RATE * 1e9))
        time.sleep(0.15)
        filled, resets = drain(tp, hops=8, sleep=0)
        # both formats' audio arrived intact (no desync garbage)
        assert filled[slot] >= BLOCK * 3
        assert resets[slot] >= 2  # connect + renegotiation
    finally:
        c.close()


def test_duplicate_identity_refused_while_live(runtime):
    """Slot ownership: a second connection with the same identity while the
    first is alive is refused; after the first closes, it can connect."""
    tp, rt, sock = runtime
    c1 = ProducerClient(sock, {"app_name": "dup"})
    slot = c1.connect()
    assert slot is not None
    c2 = ProducerClient(sock, {"app_name": "dup"}, timeout=2.0)
    assert c2.connect() is None
    assert c2.refusal and c2.refusal.get("busy")
    c1.close()
    # the pump thread notices EOF and releases; retry until it does
    deadline = time.monotonic() + 5.0
    got = None
    while time.monotonic() < deadline:
        c3 = ProducerClient(sock, {"app_name": "dup"}, timeout=2.0)
        got = c3.connect()
        if got is not None:
            c3.close()
            break
        time.sleep(0.05)
    assert got == slot  # remembered identity re-acquired its slot


def test_kill_churn_releases_and_recovers(runtime):
    tp, rt, sock = runtime
    p = spawn_producer(
        sock, "--app-name", "alpha", "--seconds", "30", "--realtime"
    )
    # wait for the slot announcement, then kill -9 mid-stream
    line = p.stdout.readline()
    slot = int(line.split()[1])
    time.sleep(0.3)
    os.kill(p.pid, signal.SIGKILL)
    p.wait(timeout=10)

    deadline = time.monotonic() + 5.0
    while time.monotonic() < deadline:
        if rt.view()["links"]["app.name:alpha"]["slot"] == slot and not any(
            k == "app.name:alpha" for k in rt.view()["active"]
        ):
            break
        time.sleep(0.05)
    assert "app.name:alpha" not in rt.view()["active"]
    assert "app.name:alpha" in rt.view()["remembered"]

    # recovery: the same identity comes back and lands on its old slot
    p2 = spawn_producer(sock, "--app-name", "alpha", "--seconds", "0.1")
    out2, _ = p2.communicate(timeout=30)
    assert int(out2.split()[1]) == slot
