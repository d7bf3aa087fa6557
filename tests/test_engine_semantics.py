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


def test_migrate_carry_field_level_spectrum_retention():
    """Reference update_config granularity (spectrum/processor.rs:300-326):
    floor/averaging-mode changes keep the PCM framing + sliding state;
    factor-within-mode changes keep everything; source changes reset
    buffers; fft changes re-init."""
    from openmeters_tpu.analyzers.spectrum import AveragingMode, SpectrumConfig
    from openmeters_tpu.utils.channels import Channel

    sp1 = SpectrumConfig(
        fft_size=1024, hop_size=256, averaging=AveragingMode.EXPONENTIAL,
        exp_factor=0.5,
    )
    cfg1 = EngineConfig(
        channels=2, spectrogram=None, spectrum=sp1,
        oscilloscope=None, stereometer=None, waveform=None,
    )
    eng1 = MeterEngine(cfg1)
    carry = eng1.init(2)
    meta = StreamMeta.default(2, channels=2, pad_channels=2)
    sig = sine_wave(1000.0, 48_000.0, 256 * 8, 0.5)
    for i in range(8):
        block = np.zeros((2, 256, 2), np.float32)
        block[:, :, 0] = block[:, :, 1] = sig[i * 256 : (i + 1) * 256]
        carry, snaps = eng1.step(carry, block, meta)
    assert float(np.asarray(snaps["spectrum"].raw_db)[0, 0].max()) > -60

    def migrate(**kw):
        cfg2 = dataclasses.replace(cfg1, spectrum=dataclasses.replace(sp1, **kw))
        eng2 = MeterEngine(cfg2)
        return eng2, eng2.migrate_carry(eng1, carry, 2)

    # floor-only: PCM kept, smoothing reset
    eng2, m = migrate(floor_db=-90.0)
    assert m["spectrum"]["fb"] is carry["spectrum"]["fb"]
    assert np.all(np.asarray(m["spectrum"]["smoothed"]) == 0.0)
    # the kept PCM produces a tone column on the very next hop
    block = np.zeros((2, 256, 2), np.float32)
    block[:, :, 0] = block[:, :, 1] = sig[:256]
    _, snaps2 = eng2.step(m, block, meta)
    assert bool(np.asarray(snaps2["spectrum"].updated)[0])
    assert float(np.asarray(snaps2["spectrum"].raw_db)[0, 0].max()) > -60

    # factor change within the same averaging mode: nothing resets
    _, m = migrate(exp_factor=0.9)
    assert m["spectrum"] is carry["spectrum"]

    # source change: buffers reset
    _, m = migrate(source=Channel.LEFT)
    assert np.all(np.asarray(m["spectrum"]["smoothed"]) == 0.0)
    assert int(np.asarray(m["spectrum"]["fb"]["fresh"])[0]) == 0

    # fft change: full re-init (shape changes)
    _, m = migrate(fft_size=512)
    assert m["spectrum"]["smoothed"].shape[-1] == 257


def test_migrate_carry_loudness_floor_and_gating():
    from openmeters_tpu.analyzers.loudness import LoudnessConfig

    cfg1 = EngineConfig(
        channels=2, spectrogram=None, spectrum=None,
        loudness=LoudnessConfig(gating=True),
        oscilloscope=None, stereometer=None, waveform=None,
    )
    eng1 = MeterEngine(cfg1)
    carry = eng1.init(1)
    meta = StreamMeta.default(1, channels=2, pad_channels=2)
    sig = sine_wave(997.0, 48_000.0, 256 * 8, 0.5)
    for i in range(8):
        block = np.zeros((1, 256, 2), np.float32)
        block[:, :, 0] = block[:, :, 1] = sig[i * 256 : (i + 1) * 256]
        carry, _ = eng1.step(carry, block, meta)

    # floor-only change keeps the whole loudness window state
    cfg2 = dataclasses.replace(
        cfg1, loudness=dataclasses.replace(cfg1.loudness, floor_db=-80.0)
    )
    eng2 = MeterEngine(cfg2)
    m = eng2.migrate_carry(eng1, carry, 1)
    for k in ("kw", "wm", "tp", "gate"):
        assert m["loudness"][k] is carry["loudness"][k], k

    # gating off -> on: window state kept, gate fresh
    cfg3 = dataclasses.replace(
        cfg1, loudness=dataclasses.replace(cfg1.loudness, gating=False)
    )
    eng3 = MeterEngine(cfg3)
    m3 = eng3.migrate_carry(eng1, carry, 1)
    assert "gate" not in m3["loudness"]
    assert m3["loudness"]["wm"] is carry["loudness"]["wm"]
    m4 = eng1.migrate_carry(eng3, m3, 1)
    assert m4["loudness"]["wm"] is carry["loudness"]["wm"]
    assert "gate" in m4["loudness"]


def test_migrate_carry_oscilloscope_cadence_keeps_lock_state():
    from openmeters_tpu.analyzers.oscilloscope import OscilloscopeConfig

    cfg1 = EngineConfig(
        channels=2, loudness=None, spectrogram=None, spectrum=None,
        oscilloscope=OscilloscopeConfig(trigger_every=1, snapshot_every=1),
        stereometer=None, waveform=None,
    )
    eng1 = MeterEngine(cfg1)
    carry = eng1.init(1)
    meta = StreamMeta.default(1, channels=2, pad_channels=2)
    sig = sine_wave(220.0, 48_000.0, 256 * 40, 0.5)
    for i in range(40):
        block = np.zeros((1, 256, 2), np.float32)
        block[:, :, 0] = block[:, :, 1] = sig[i * 256 : (i + 1) * 256]
        carry, snaps = eng1.step(carry, block, meta)
    assert bool(np.asarray(snaps["oscilloscope"].locked)[0].any())

    # display-cadence-only change retains the trigger template/lock state
    cfg2 = dataclasses.replace(
        cfg1, oscilloscope=dataclasses.replace(
            cfg1.oscilloscope, trigger_every=3, snapshot_every=3
        )
    )
    eng2 = MeterEngine(cfg2)
    m = eng2.migrate_carry(eng1, carry, 1)
    osc = m["oscilloscope"]
    for k in ("period", "has_period", "reference", "ref_period", "hist"):
        if k in carry["oscilloscope"]:
            assert osc[k] is carry["oscilloscope"][k], k
    assert bool(np.asarray(osc["has_period"])[0])

    # a trigger-mode change re-inits (reference rebuilds wholesale)
    from openmeters_tpu.analyzers.oscilloscope import TriggerMode

    cfg3 = dataclasses.replace(
        cfg1, oscilloscope=dataclasses.replace(
            cfg1.oscilloscope, trigger_mode=TriggerMode.ZERO_CROSSING
        )
    )
    eng3 = MeterEngine(cfg3)
    m3 = eng3.migrate_carry(eng1, carry, 1)
    assert not bool(np.asarray(m3["oscilloscope"]["has_period"]).any())
