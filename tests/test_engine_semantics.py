"""Engine semantics: chunk invariance, rate buckets, carry migration."""

import dataclasses

import numpy as np
import pytest

from conftest import sine_wave
from openmeters_tpu.analyzers.spectrogram import SpectrogramConfig
from openmeters_tpu.engine import EngineConfig, MeterEngine, StreamMeta
from openmeters_tpu.engine.engine import scaled_block_frames


def test_rate_scaled_blocks():
    # reference meter.rs:16-25
    assert scaled_block_frames(48_000.0) == 256
    assert scaled_block_frames(96_000.0) == 512
    assert scaled_block_frames(44_100.0) == 235
    cfg = EngineConfig.at_rate(96_000.0, spectrum=None)
    assert cfg.block_frames == 512
    assert cfg.resolve().loudness.sample_rate == 96_000.0


def test_loudness_rate_buckets_agree_on_lufs():
    """The same tone at two rates must measure the same loudness."""
    results = {}
    for rate in (48_000.0, 96_000.0):
        cfg = EngineConfig.at_rate(rate, spectrogram=None, spectrum=None)
        eng = MeterEngine(cfg)
        b = cfg.block_frames
        mono = sine_wave(997.0, rate, int(rate * 1.0), 0.5)
        n = len(mono) // b * b
        carry = eng.init(1)
        meta = StreamMeta.default(1)
        snap = None
        for i in range(n // b):
            block = np.zeros((1, b, 8), np.float32)
            block[0, :, 0] = block[0, :, 1] = mono[i * b : (i + 1) * b]
            carry, snap = eng.step(carry, block, meta)
        results[rate] = float(snap["momentary_lufs"][0]) if isinstance(snap, dict) and "momentary_lufs" in snap else float(snap["loudness"].momentary_lufs[0])
    assert results[48_000.0] == pytest.approx(results[96_000.0], abs=0.02)


def test_migrate_carry_preserves_unchanged_analyzers():
    cfg1 = EngineConfig(
        spectrogram=SpectrogramConfig(fft_size=256, hop_size=64, use_reassignment=False),
        spectrum=None,
        oscilloscope=None, stereometer=None, waveform=None,
    )
    eng1 = MeterEngine(cfg1)
    carry = eng1.init(1)
    meta = StreamMeta.default(1)
    sig = sine_wave(1000.0, 48_000.0, 256 * 8, 0.5)
    for i in range(8):
        block = np.zeros((1, 256, 8), np.float32)
        block[0, :, 0] = block[0, :, 1] = sig[i * 256 : (i + 1) * 256]
        carry, _ = eng1.step(carry, block, meta)

    # change only the spectrogram fft: loudness carry survives
    cfg2 = dataclasses.replace(
        cfg1, spectrogram=SpectrogramConfig(fft_size=512, hop_size=64, use_reassignment=False)
    )
    eng2 = MeterEngine(cfg2)
    migrated = eng2.migrate_carry(eng1, carry, 1)
    assert migrated["loudness"] is carry["loudness"]
    assert int(np.asarray(migrated["spectrogram"]["fb"]["fresh"])[0]) == 0

    silent = np.zeros((1, 256, 8), np.float32)
    _, snaps = eng2.step(migrated, silent, meta)
    # loudness still remembers the tone in its short-term window
    assert float(snaps["loudness"].short_term_lufs[0]) > -30
