"""Session runtime: live producers → identity routing → transport.

Reference parity: the PipeWire session loop (``src/infra/pipewire/
runtime.rs``), graph mirror (``graph.rs``) and routing planner
(``policy.rs``), re-targeted at this framework's capture boundary.  The
reference mirrors a PipeWire graph and passively taps routed playback nodes;
here the "graph" is a set of external producer connections on a Unix
socket — any process (a PipeWire bridge, a file streamer, a network relay)
can be a producer.  What carries over is the *semantics*:

- **Identity routing** (graph.rs ``StreamIdentity`` precedence): each
  producer announces properties in a HELLO; the :class:`StreamDirectory`
  assigns a batch slot, remembers identities across disconnects so a
  returning producer re-acquires its old slot, and flags truncation when
  the batch is full (policy.rs ``Plan::truncated``).
- **Format generations** (stream.rs ``set_format``): every (re)connect and
  every FORMAT message bumps the slot's generation, which the transport
  converts into exactly one engine reset at the boundary.
- **Per-link failure listeners** (runtime.rs:392-413): a socket error or
  EOF releases the slot, pushes a fault epoch, and the directory remembers
  the identity; clients reconnect with the session :class:`Backoff`.

Wire protocol (little-endian):

- HELLO: one JSON line terminated by ``\\n`` — identity properties plus
  ``channels``/``sample_rate``.
- then framed messages: header ``<u32 kind, u32 frames, u64 timestamp_ns>``
  (16 bytes) followed by ``frames * channels`` f32 samples for PCM.
  Kinds: 0 = PCM, 1 = SILENCE (no payload), 2 = FAULT (no payload),
  3 = FORMAT (``frames`` field carries the new channel count; bumps the
  generation like a renegotiation).
"""

from __future__ import annotations

import json
import os
import socket
import struct
import threading
import time

import numpy as np

from openmeters_tpu.ingest.backoff import Backoff
from openmeters_tpu.ingest.directory import StreamDirectory, StreamIdentity

MSG_PCM = 0
MSG_SILENCE = 1
MSG_FAULT = 2
MSG_FORMAT = 3
_HEADER = struct.Struct("<IIQ")


def _recv_exact(sock: socket.socket, n: int) -> bytes | None:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf.extend(chunk)
    return bytes(buf)


class SessionRuntime:
    """Accepts producer connections and pumps them into a Transport.

    One acceptor thread plus one pump thread per live producer (the
    reference runs one PipeWire loop thread; per-connection threads are the
    socket-world equivalent — the hot path into the transport stays
    lock-free SPSC per stream slot).
    """

    def __init__(self, transport, socket_path: str, max_channels: int = 2):
        self._tp = transport
        self._path = socket_path
        self._max_channels = max_channels
        self.directory = StreamDirectory(transport.n_streams)
        self._lock = threading.Lock()  # directory + stats only, not PCM
        self._stats: dict[str, dict] = {}
        self._generation: dict[int, int] = {}
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []

        if os.path.exists(socket_path):
            os.unlink(socket_path)
        self._listener = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._listener.bind(socket_path)
        self._listener.listen(16)
        self._listener.settimeout(0.2)
        self._acceptor = threading.Thread(target=self._accept_loop, daemon=True)
        self._acceptor.start()

    # -- accept / pump -------------------------------------------------------

    def _accept_loop(self):
        while not self._stop.is_set():
            try:
                conn, _ = self._listener.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            t = threading.Thread(target=self._serve, args=(conn,), daemon=True)
            t.start()
            self._threads.append(t)

    def _serve(self, conn: socket.socket):
        key = None
        slot = None
        try:
            conn.settimeout(5.0)
            hello = bytearray()
            while not hello.endswith(b"\n"):
                chunk = conn.recv(1)
                if not chunk:
                    return
                hello.extend(chunk)
                if len(hello) > 65536:
                    return
            props = json.loads(hello.decode())
            identity = StreamIdentity(
                app_id=props.get("app_id"),
                app_name=props.get("app_name"),
                media_name=props.get("media_name"),
                node_name=props.get("node_name"),
            )
            key = identity.key
            channels = min(int(props.get("channels", 2)), self._max_channels)

            with self._lock:
                slot = self.directory.acquire(identity)
                if slot is None:  # batch full: refuse (Plan::truncated)
                    conn.sendall(b'{"slot": null, "truncated": true}\n')
                    return
                gen = self._generation.get(slot, 0) + 1
                self._generation[slot] = gen
                self._stats[key] = {
                    "slot": slot,
                    "connects": self._stats.get(key, {}).get("connects", 0) + 1,
                    "pcm_messages": self._stats.get(key, {}).get("pcm_messages", 0),
                    "channels": channels,
                }
            self._tp.set_generation(slot, gen)
            conn.sendall(json.dumps({"slot": slot, "generation": gen}).encode() + b"\n")

            while not self._stop.is_set():
                head = _recv_exact(conn, _HEADER.size)
                if head is None:
                    break
                kind, frames, ts_ns = _HEADER.unpack(head)
                if kind == MSG_PCM:
                    payload = _recv_exact(conn, frames * channels * 4)
                    if payload is None:
                        break
                    pcm = np.frombuffer(payload, np.float32).reshape(
                        frames, channels
                    )
                    self._tp.push_pcm(slot, pcm, ts_ns)
                    with self._lock:
                        self._stats[key]["pcm_messages"] += 1
                elif kind == MSG_SILENCE:
                    self._tp.push_silence(slot, frames, ts_ns)
                elif kind == MSG_FAULT:
                    self._tp.push_fault(slot)
                elif kind == MSG_FORMAT:
                    channels = min(max(int(frames), 1), self._max_channels)
                    with self._lock:
                        gen = self._generation[slot] + 1
                        self._generation[slot] = gen
                        self._stats[key]["channels"] = channels
                    self._tp.set_generation(slot, gen)
                else:
                    break
        except (OSError, ValueError, json.JSONDecodeError):
            pass  # per-link failure listener: fall through to release
        finally:
            conn.close()
            if slot is not None:
                # link failure/closure: fault epoch -> one engine reset,
                # identity remembered for re-acquisition (runtime.rs:392-413)
                self._tp.push_fault(slot)
                with self._lock:
                    self.directory.release(key)

    # -- observability (CaptureView analogue, pipewire.rs:96-149) ------------

    def view(self) -> dict:
        with self._lock:
            v = self.directory.view()
            v["links"] = {k: dict(s) for k, s in self._stats.items()}
        return v

    def shutdown(self):
        self._stop.set()
        try:
            self._listener.close()
        finally:
            for t in self._threads:
                t.join(timeout=2.0)
            if os.path.exists(self._path):
                os.unlink(self._path)


class ProducerClient:
    """Client side: connect (with session backoff), announce, stream PCM.

    Used by external producer processes (see ``producer.py``) and by the
    hermetic integration tests.
    """

    def __init__(self, socket_path: str, props: dict, timeout: float = 10.0):
        self._path = socket_path
        self._props = dict(props)
        self._timeout = timeout
        self.sock: socket.socket | None = None
        self.slot: int | None = None

    def connect(self) -> int | None:
        """Connect with exponential backoff; returns the assigned slot, or
        None if the runtime refused (truncated)."""
        backoff = Backoff.session()
        deadline = time.monotonic() + self._timeout
        while time.monotonic() < deadline:
            try:
                s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
                s.settimeout(5.0)
                s.connect(self._path)
                s.sendall(json.dumps(self._props).encode() + b"\n")
                reply = bytearray()
                while not reply.endswith(b"\n"):
                    chunk = s.recv(1)
                    if not chunk:
                        raise OSError("runtime closed during hello")
                    reply.extend(chunk)
                r = json.loads(reply.decode())
                if r.get("slot") is None:
                    s.close()
                    return None
                backoff.success()
                self.sock = s
                self.slot = int(r["slot"])
                return self.slot
            except OSError:
                time.sleep(min(backoff.failure(), max(deadline - time.monotonic(), 0)))
        raise TimeoutError(f"could not reach session runtime at {self._path}")

    def send_pcm(self, samples: np.ndarray, timestamp_ns: int):
        pcm = np.ascontiguousarray(samples, np.float32)
        head = _HEADER.pack(MSG_PCM, pcm.shape[0], timestamp_ns)
        self.sock.sendall(head + pcm.tobytes())

    def send_silence(self, frames: int, timestamp_ns: int):
        self.sock.sendall(_HEADER.pack(MSG_SILENCE, frames, timestamp_ns))

    def send_fault(self):
        self.sock.sendall(_HEADER.pack(MSG_FAULT, 0, 0))

    def send_format(self, channels: int):
        self.sock.sendall(_HEADER.pack(MSG_FORMAT, channels, 0))

    def close(self):
        if self.sock is not None:
            self.sock.close()
            self.sock = None
