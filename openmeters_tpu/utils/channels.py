"""Channel layout semantics and stereo fold matrices.

Reference parity: ``src/dsp.rs:8-262`` (``ChannelPosition``, ``AudioFormat``,
``AudioBlock`` stereo fold) and ``src/util/audio/channel.rs`` (``Channel``).

All functions are host-side: a stream's channel layout is config, not data.
The batched device-side fold is a ``[C, 2]`` matmul with the matrix built
here, replacing the reference's per-frame ``stereo_frames()`` iterator
(dsp.rs:223-249).  The reference's trailing-zero channel trim
(``stereo_channels``, dsp.rs:197-204) is a CPU-side skip of all-zero trailing
channels; folding them anyway is bit-identical, so the batched matmul drops it.
"""

from __future__ import annotations

import enum
import math

import numpy as np

MAX_AUDIO_CHANNELS = 8  # reference dsp.rs:6


class Channel(enum.Enum):
    """Stereo-derived analysis source (reference channel.rs:4-22)."""

    LEFT = "left"
    RIGHT = "right"
    MID = "mid"
    SIDE = "side"
    NONE = "none"


def projection_vector(channel: Channel) -> np.ndarray:
    """[2] weights so ``dot(stereo, v)`` == ``Channel::project`` (channel.rs:13-21)."""
    return {
        Channel.LEFT: np.array([1.0, 0.0], np.float32),
        Channel.RIGHT: np.array([0.0, 1.0], np.float32),
        Channel.MID: np.array([0.5, 0.5], np.float32),
        Channel.SIDE: np.array([0.5, -0.5], np.float32),
        Channel.NONE: np.array([0.0, 0.0], np.float32),
    }[channel]


class ChannelPosition(enum.Enum):
    """Surround channel semantics (reference dsp.rs:8-22)."""

    FRONT_LEFT = "FL"
    FRONT_RIGHT = "FR"
    FRONT_CENTER = "FC"
    LOW_FREQUENCY = "LFE"
    REAR_LEFT = "RL"
    REAR_RIGHT = "RR"
    SIDE_LEFT = "SL"
    SIDE_RIGHT = "SR"
    MONO = "MONO"
    # AUX0..AUX7 modeled as distinct members for dedup semantics.
    AUX0 = "AUX0"
    AUX1 = "AUX1"
    AUX2 = "AUX2"
    AUX3 = "AUX3"
    AUX4 = "AUX4"
    AUX5 = "AUX5"
    AUX6 = "AUX6"
    AUX7 = "AUX7"
    UNKNOWN = "UNKNOWN"


_P = ChannelPosition

SURROUND = (
    _P.FRONT_LEFT,
    _P.FRONT_RIGHT,
    _P.FRONT_CENTER,
    _P.LOW_FREQUENCY,
    _P.REAR_LEFT,
    _P.REAR_RIGHT,
    _P.SIDE_LEFT,
    _P.SIDE_RIGHT,
)  # reference dsp.rs:25-34

_AUX = (_P.AUX0, _P.AUX1, _P.AUX2, _P.AUX3, _P.AUX4, _P.AUX5, _P.AUX6, _P.AUX7)


def channel_fallback(channels: int) -> list[ChannelPosition]:
    """Default layout for ``channels`` (reference dsp.rs:36-47).

    1ch -> mono; 4ch -> quad (rears in slots 2-3); 5ch -> FL FR FC RL RR;
    otherwise the SURROUND prefix.
    """
    channels = min(channels, MAX_AUDIO_CHANNELS)
    positions = [_P.UNKNOWN] * MAX_AUDIO_CHANNELS
    positions[:channels] = list(SURROUND[:channels])
    if channels == 1:
        positions[0] = _P.MONO
    elif channels == 4:
        positions[2:4] = [_P.REAR_LEFT, _P.REAR_RIGHT]
    elif channels == 5:
        positions[3:5] = [_P.REAR_LEFT, _P.REAR_RIGHT]
    return positions


def normalize_positions(
    channels: int, positions: list[ChannelPosition]
) -> list[ChannelPosition]:
    """Dedup + fallback-fill unknown positions (reference dsp.rs:49-76).

    Duplicates beyond the first occurrence become UNKNOWN, then every UNKNOWN
    slot takes the first unused candidate from: its fallback slot, the
    fallback layout, the SURROUND layout, then AUX0..7.
    """
    channels = min(channels, MAX_AUDIO_CHANNELS)
    positions = list(positions[:MAX_AUDIO_CHANNELS])
    positions += [_P.UNKNOWN] * (MAX_AUDIO_CHANNELS - len(positions))
    for i in range(channels, MAX_AUDIO_CHANNELS):
        positions[i] = _P.UNKNOWN
    for i in range(channels):
        if positions[i] == _P.UNKNOWN or positions[i] in positions[:i]:
            positions[i] = _P.UNKNOWN

    fallback = channel_fallback(channels)
    for i in range(channels):
        if positions[i] != _P.UNKNOWN:
            continue
        candidates = [fallback[i], *fallback, *SURROUND, *_AUX]
        for cand in candidates:
            if cand != _P.UNKNOWN and cand not in positions[:channels]:
                positions[i] = cand
                break
        else:  # pragma: no cover - AUX pool guarantees a free slot
            raise AssertionError("channel fallback must have an unused position")
    return positions


def _stereo_indices(channels: int, positions: list[ChannelPosition]) -> tuple[int, int]:
    """Pick nominal L/R indices when no semantic weights exist (dsp.rs:117-133)."""

    def find(p):
        for i in range(channels):
            if positions[i] == p:
                return i
        return None

    explicit_right = find(_P.FRONT_RIGHT)
    left = find(_P.FRONT_LEFT)
    if left is None:
        left = find(_P.MONO)
    if left is None:
        left = next((i for i in range(channels) if i != explicit_right), 0)
    right = explicit_right if (explicit_right is not None and explicit_right != left) else None
    if right is None:
        right = next((i for i in range(channels) if i != left), left)
    return left, right


def stereo_matrix(channels: int, positions: list[ChannelPosition]) -> np.ndarray:
    """``[MAX_AUDIO_CHANNELS, 2]`` fold matrix (reference dsp.rs:135-176).

    FL/FR pass through at 1.0; center/rears/sides at 1/sqrt(2); mono feeds
    both; LFE/Aux/Unknown drop.  If a side ends up with no contributors the
    reference's fallback rules apply (copy the other side, or nominal L/R
    pass-through).
    """
    channels = min(max(channels, 1), MAX_AUDIO_CHANNELS)
    s = 1.0 / math.sqrt(2.0)
    weights = {
        _P.FRONT_LEFT: (1.0, 0.0),
        _P.FRONT_RIGHT: (0.0, 1.0),
        _P.FRONT_CENTER: (s, s),
        _P.REAR_LEFT: (s, 0.0),
        _P.SIDE_LEFT: (s, 0.0),
        _P.REAR_RIGHT: (0.0, s),
        _P.SIDE_RIGHT: (0.0, s),
        _P.MONO: (1.0, 1.0),
    }
    m = np.zeros((MAX_AUDIO_CHANNELS, 2), np.float32)
    for i in range(channels):
        m[i] = weights.get(positions[i], (0.0, 0.0))

    left_pop = bool(np.any(m[:channels, 0] != 0.0))
    right_pop = bool(np.any(m[:channels, 1] != 0.0))
    if not left_pop and not right_pop:
        li, ri = _stereo_indices(channels, positions)
        m[li, 0] = 1.0
        m[ri, 1] = 1.0
    elif not left_pop:
        m[:, 0] = m[:, 1]
    elif not right_pop:
        m[:, 1] = m[:, 0]
    return m


def channel_weights(positions: list[ChannelPosition]) -> np.ndarray:
    """BS.1770 channel weights ``[MAX_AUDIO_CHANNELS]`` (reference
    ``loudness/processor.rs:174-183``): LFE 0, rears/sides 1.41, else 1.0."""
    out = np.ones((MAX_AUDIO_CHANNELS,), np.float32)
    for i, p in enumerate(positions[:MAX_AUDIO_CHANNELS]):
        if p == _P.LOW_FREQUENCY:
            out[i] = 0.0
        elif p in (_P.REAR_LEFT, _P.REAR_RIGHT, _P.SIDE_LEFT, _P.SIDE_RIGHT):
            out[i] = 1.41
    return out
