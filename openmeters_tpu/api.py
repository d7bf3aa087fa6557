"""Headless batch API: arrays/WAVs in, snapshot time-series out.

The offline counterpart of the streaming engine: feed a whole recording (or
a batch of recordings) through the engine at hop cadence and collect every
analyzer's snapshots — the rebuild's equivalent of running the reference app
over a file.  ``analyze()`` is the single-call entry; ``AnalysisSession``
holds state for incremental feeding.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from openmeters_tpu.engine import EngineConfig, MeterEngine, StreamMeta
from openmeters_tpu.utils.channels import MAX_AUDIO_CHANNELS


@dataclasses.dataclass
class AnalysisSession:
    """Incremental batched analysis over ``[n_streams]`` recordings."""

    engine: MeterEngine
    n_streams: int
    meta: StreamMeta | None = None

    def __post_init__(self):
        self.carry = self.engine.init(self.n_streams)
        if self.meta is None:
            self.meta = StreamMeta.default(
                self.n_streams, channels=2, pad_channels=self.engine.config.channels
            )
        self.snapshots: list[dict] = []
        # cadenced spectrum (hop = R engine blocks): buffer the R blocks of
        # the current spectrum hop and hold the newest spectrum snapshot
        # between its hops (the reference keeps processor snapshots across
        # process_block calls the same way)
        self._pending_blocks: list[np.ndarray] = []
        self._pending_resets: list[np.ndarray] = []
        self._held_spectrum = None

    def feed(self, block: np.ndarray, reset_mask=None) -> dict:
        """One hop of ``[n_streams, block_frames, channels]`` audio."""
        self.carry, snaps = self.engine.step(self.carry, block, self.meta, reset_mask)
        if "oscilloscope" in snaps:
            # the engine's oscilloscope runs external-capture mode; offline
            # analysis extracts the trace windows per hop for its consumers
            snaps["oscilloscope"] = self.engine.extract_oscilloscope(self.carry)
        r = self.engine.spectrum_cadence
        if r > 1:
            self._pending_blocks.append(np.asarray(block))
            if reset_mask is not None:
                self._pending_resets.append(np.asarray(reset_mask, bool))
            if len(self._pending_blocks) == r:
                resets = (
                    np.any(np.stack(self._pending_resets), axis=0)
                    if self._pending_resets
                    else None
                )
                sp_carry, sp_snap = self.engine.spectrum_step(
                    self.carry["spectrum"],
                    np.stack(self._pending_blocks),
                    self.meta,
                    resets,
                )
                self.carry = dict(self.carry, spectrum=sp_carry)
                self._held_spectrum = sp_snap
                self._pending_blocks.clear()
                self._pending_resets.clear()
            if self._held_spectrum is not None:
                snaps = dict(snaps, spectrum=self._held_spectrum)
        return snaps

    def run(self, audio: np.ndarray, collect: bool = True) -> list[dict]:
        """Feed ``[n_streams, frames, channels]`` fully; returns snapshots
        per hop (device arrays; convert with jax.device_get as needed)."""
        b = self.engine.config.block_frames
        n = audio.shape[1] // b * b
        out = []
        for i in range(n // b):
            snaps = self.feed(audio[:, i * b : (i + 1) * b])
            if collect:
                out.append(snaps)
        return out


def _pad_channels(audio: np.ndarray, channels: int) -> np.ndarray:
    s, t, c = audio.shape
    if c == channels:
        return audio
    if c > channels:
        return audio[:, :, :channels]
    out = np.zeros((s, t, channels), np.float32)
    out[:, :, :c] = audio
    return out


def analyze(
    audio: np.ndarray,
    sample_rate: float = 48_000.0,
    config: EngineConfig | None = None,
) -> list[dict]:
    """Analyze recordings.

    Args:
      audio: ``[frames, channels]`` (single stream) or
        ``[n_streams, frames, channels]`` float32.
      sample_rate: shared sample rate.
      config: engine config; defaults to all default analyzers.

    Returns a list of per-hop snapshot dicts (final entry = end state).
    """
    if audio.ndim == 2:
        audio = audio[None]
    if config is None:
        config = EngineConfig(sample_rate=sample_rate)
    else:
        config = dataclasses.replace(config, sample_rate=sample_rate)
    engine = MeterEngine(config)
    audio = _pad_channels(np.asarray(audio, np.float32), engine.config.channels)
    session = AnalysisSession(engine, audio.shape[0])
    return session.run(audio)


def analyze_wav(path: str, config: EngineConfig | None = None) -> list[dict]:
    """Analyze one WAV file through every configured analyzer."""
    from openmeters_tpu.io.wav import read_wav

    samples, rate = read_wav(path)
    return analyze(samples, rate, config)
