"""Headless API, WAV IO, and lossy settings persistence tests."""

import dataclasses
import json
import time

import numpy as np
import pytest

from conftest import sine_wave
from openmeters_tpu.analyzers.spectrogram import SpectrogramConfig
from openmeters_tpu.analyzers.spectrum import AveragingMode, SpectrumConfig
from openmeters_tpu.engine import EngineConfig
from openmeters_tpu.io.wav import read_wav, write_wav
from openmeters_tpu.persistence import (
    SettingsHandle,
    decode_settings,
    encode_settings,
)
from openmeters_tpu.utils.windows import WindowKind


def test_wav_roundtrip(tmp_path):
    x = np.stack([sine_wave(440.0, 48_000.0, 4800, 0.5)] * 2, axis=-1)
    p = tmp_path / "t.wav"
    write_wav(str(p), x, 48_000.0)
    y, rate = read_wav(str(p))
    assert rate == 48_000.0
    np.testing.assert_allclose(y, x, atol=0)


def test_wav_extensible_format(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE (standard for >2-channel files): the subformat
    GUID lives in the fmt chunk, not whatever chunk was read last."""
    import struct

    x = np.stack([sine_wave(440.0, 48_000.0, 480, 0.4)] * 4, axis=-1)
    data = x.astype("<f4").tobytes()
    # fmt chunk: 40 bytes — extensible header + cbSize=22 + subformat GUID 3
    sub_ieee_float = struct.pack("<H", 3) + b"\x00\x00" + bytes(
        [0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71]
    )
    fmt = struct.pack(
        "<HHIIHHHHI", 0xFFFE, 4, 48_000, 48_000 * 16, 16, 32, 22, 32, 0xF
    ) + sub_ieee_float
    p = tmp_path / "ext.wav"
    with open(p, "wb") as f:
        f.write(struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE"))
        f.write(struct.pack("<4sI", b"fmt ", len(fmt)) + fmt)
        f.write(struct.pack("<4sI", b"data", len(data)) + data)
    y, rate = read_wav(str(p))
    assert rate == 48_000.0 and y.shape == (480, 4)
    np.testing.assert_allclose(y, x, atol=0)


def test_analyze_wav_end_to_end(tmp_path):
    """BASELINE config 1: a stereo WAV through spectrogram + loudness."""
    from openmeters_tpu.api import analyze_wav

    rate = 48_000.0
    mono = sine_wave(997.0, rate, int(rate * 0.5), 0.5)
    p = tmp_path / "tone.wav"
    write_wav(str(p), np.stack([mono, mono], -1), rate)

    cfg = EngineConfig(
        spectrogram=SpectrogramConfig(fft_size=1024, hop_size=256, use_reassignment=False),
        spectrum=None,
        oscilloscope=None, stereometer=None, waveform=None,
    )
    snaps = analyze_wav(str(p), cfg)
    assert len(snaps) == int(rate * 0.5) // 256
    last = snaps[-1]
    assert float(last["loudness"].momentary_lufs[0]) == pytest.approx(-6.0, abs=0.3)
    codes = np.asarray(last["spectrogram"].codes)
    k = int(np.argmax(codes[0, -1]))
    assert abs(k * rate / 1024 - 997.0) < rate / 1024


def test_settings_roundtrip(tmp_path):
    cfg = EngineConfig(
        spectrogram=SpectrogramConfig(fft_size=4096, window=WindowKind.BLACKMAN),
        spectrum=SpectrumConfig(averaging=AveragingMode.PEAK_HOLD, exp_factor=0.8),
    )
    doc = encode_settings(cfg)
    back = decode_settings(json.loads(json.dumps(doc)))
    assert back.spectrogram.fft_size == 4096
    assert back.spectrogram.window is WindowKind.BLACKMAN
    assert back.spectrum.averaging is AveragingMode.PEAK_HOLD
    assert back.spectrum.exp_factor == 0.8


def test_lossy_schema_fallbacks(caplog):
    """Unknown keys ignored; invalid values fall back at the narrowest scope
    (reference schema.rs:198-273 fixture pattern)."""
    doc = {
        "sample_rate": "not a number",
        "mystery_key": 1,
        "spectrogram": {
            "fft_size": "bogus",
            "hop_size": 128,
            "window": "definitely-not-a-window",
            "unknown_field": True,
        },
        "spectrum": "not an object",
        "enabled": {"waveform": False},
    }
    import logging

    with caplog.at_level(logging.WARNING, logger="openmeters_tpu.settings"):
        cfg = decode_settings(doc)
    assert cfg.sample_rate == 48_000.0  # engine default kept
    assert cfg.spectrogram.fft_size == 2048  # field-level fallback
    assert cfg.spectrogram.hop_size == 128  # valid sibling survives
    assert cfg.spectrogram.window is WindowKind.HANN
    assert cfg.spectrum == SpectrumConfig()  # section-level fallback
    assert cfg.waveform is None  # explicit disable honored
    assert sum("unknown key" in r.message for r in caplog.records) >= 2


def test_settings_handle_debounce_and_flush(tmp_path):
    p = tmp_path / "settings.json"
    h = SettingsHandle(str(p))
    cfg = dataclasses.replace(h.config, sample_rate=44_100.0)
    h.update(cfg)
    assert not p.exists()  # debounced, not yet written
    h.flush()
    assert p.exists()
    again = SettingsHandle.load_or_default(str(p))
    assert again.sample_rate == 44_100.0


def test_settings_handle_survives_corrupt_file(tmp_path):
    p = tmp_path / "settings.json"
    p.write_text("{ not json !!!")
    cfg = SettingsHandle.load_or_default(str(p))
    assert cfg == EngineConfig()
