"""ctypes binding for the native ingest transport (transport.cpp).

Builds the shared library on first use (g++ -O2 -shared), cached next to the
source.  See transport.cpp for the semantics and reference citations.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

_SRC = pathlib.Path(__file__).with_name("transport.cpp")
_LIB = pathlib.Path(__file__).with_name("_transport.so")
_BUILD_LOCK = threading.Lock()


def _build() -> pathlib.Path:
    with _BUILD_LOCK:
        if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
            return _LIB
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
            "-o", str(_LIB), str(_SRC),
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB


def _load():
    lib = ctypes.CDLL(str(_build()))
    lib.om_transport_create.restype = ctypes.c_void_p
    lib.om_transport_create.argtypes = [
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
    ]
    lib.om_transport_destroy.argtypes = [ctypes.c_void_p]
    lib.om_push_pcm.restype = ctypes.c_int32
    lib.om_push_pcm.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_uint32, ctypes.c_uint64,
    ]
    lib.om_push_silence.restype = ctypes.c_int32
    lib.om_push_silence.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint64,
    ]
    lib.om_push_fault.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.om_set_generation.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint64,
    ]
    lib.om_fault_count.restype = ctypes.c_uint64
    lib.om_fault_count.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.om_assemble.restype = ctypes.c_int32
    lib.om_assemble.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.om_assemble_range.restype = ctypes.c_int32
    lib.om_assemble_range.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_uint32,
        ctypes.c_uint32,
    ]
    lib.om_set_active.argtypes = [ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32]
    lib.om_is_active.restype = ctypes.c_uint32
    lib.om_is_active.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.om_buffered_frames.restype = ctypes.c_uint64
    lib.om_buffered_frames.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.om_backlog_blocks.restype = ctypes.c_uint32
    lib.om_backlog_blocks.argtypes = [ctypes.c_void_p]
    return lib


_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        _lib = _load()
    return _lib


class Transport:
    """Multi-stream host transport feeding fixed-shape engine batches.

    Producer threads call :meth:`push_pcm` / :meth:`push_silence` /
    :meth:`push_fault`; the engine loop calls :meth:`assemble` once per hop.
    """

    def __init__(
        self,
        n_streams: int,
        channels: int = 2,
        block_frames: int = 256,
        sample_rate: float = 48_000.0,
        ring_seconds: float = 4.0 / 3.0,  # transport.rs:15-18
        max_backlog_seconds: float = 1.0,  # transport.rs:17
        max_silence_seconds: float = 2.0,  # meter.rs:18
    ):
        self._lib = _get_lib()
        self.n_streams = n_streams
        self.channels = channels
        self.block_frames = block_frames
        self.sample_rate = sample_rate
        self._h = self._lib.om_transport_create(
            n_streams, channels, block_frames, sample_rate,
            ring_seconds, max_backlog_seconds, max_silence_seconds,
        )
        self._batch = np.zeros((n_streams, block_frames, channels), np.float32)
        self._reset = np.zeros((n_streams,), np.uint8)
        self._underrun = np.zeros((n_streams,), np.uint8)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.om_transport_destroy(self._h)
            self._h = None

    def push_pcm(self, stream: int, samples: np.ndarray, timestamp_ns: int) -> int:
        """``samples``: [frames, channels] float32 interleaved."""
        samples = np.ascontiguousarray(samples, np.float32)
        frames = samples.shape[0]
        return self._lib.om_push_pcm(
            self._h, stream,
            samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            frames, timestamp_ns,
        )

    def push_silence(self, stream: int, frames: int, timestamp_ns: int) -> int:
        return self._lib.om_push_silence(self._h, stream, frames, timestamp_ns)

    def push_fault(self, stream: int) -> None:
        self._lib.om_push_fault(self._h, stream)

    def set_active(self, stream: int, active: bool) -> None:
        """Pause/resume a stream (activity epochs, transport.rs:668-704).
        While paused the producer path drops input; resuming discards any
        stale backlog and emits one reset on the next assemble."""
        self._lib.om_set_active(self._h, stream, 1 if active else 0)

    def is_active(self, stream: int) -> bool:
        return bool(self._lib.om_is_active(self._h, stream))

    def set_generation(self, stream: int, generation: int) -> None:
        self._lib.om_set_generation(self._h, stream, generation)

    def fault_count(self, stream: int) -> int:
        return self._lib.om_fault_count(self._h, stream)

    def buffered_frames(self, stream: int) -> int:
        return self._lib.om_buffered_frames(self._h, stream)

    def assemble(self, pool=None, shards: int = 1):
        """Drain one hop: returns (batch [S,B,C] f32, reset [S] bool,
        underrun [S] bool, n_live).

        With ``pool`` (a ``concurrent.futures.ThreadPoolExecutor``) and
        ``shards > 1``, disjoint stream ranges are assembled concurrently —
        ctypes releases the GIL for the duration of each native call, so
        this scales the host assembler across cores for large stream counts.
        """
        out = self._batch.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        rst = self._reset.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        und = self._underrun.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        if pool is None or shards <= 1:
            n_live = self._lib.om_assemble(self._h, out, rst, und)
        else:
            step = -(-self.n_streams // shards)
            futs = [
                pool.submit(
                    self._lib.om_assemble_range, self._h, out, rst, und,
                    lo, min(lo + step, self.n_streams),
                )
                for lo in range(0, self.n_streams, step)
            ]
            n_live = sum(f.result() for f in futs)
        return (
            self._batch,
            self._reset.astype(bool),
            self._underrun.astype(bool),
            n_live,
        )

    def backlog_blocks(self) -> int:
        """Max whole blocks buffered over all streams — the serving loop
        runs this many extra catch-up hops (coalescing, meter.rs:15-80)."""
        return self._lib.om_backlog_blocks(self._h)
