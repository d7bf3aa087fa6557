"""All-six-analyzer engine + sharded dryrun (the driver's multi-chip path)."""

import numpy as np

from conftest import sine_wave
from openmeters_tpu.analyzers.oscilloscope import OscilloscopeConfig
from openmeters_tpu.analyzers.spectrogram import SpectrogramConfig
from openmeters_tpu.analyzers.spectrum import SpectrumConfig
from openmeters_tpu.analyzers.stereometer import StereometerConfig
from openmeters_tpu.analyzers.waveform import WaveformConfig
from openmeters_tpu.engine import (
    EngineConfig,
    MeterEngine,
    StreamMeta,
    make_mesh,
    sharded_step,
)


def full_config():
    return EngineConfig(
        sample_rate=8_000.0,
        block_frames=64,
        spectrogram=SpectrogramConfig(fft_size=128, hop_size=32),
        spectrum=SpectrumConfig(fft_size=128, hop_size=32),
        oscilloscope=OscilloscopeConfig(),
        stereometer=StereometerConfig(analyze_bands=True, emit_band_points=True),
        waveform=WaveformConfig(track_history=True),
    )


def test_full_engine_all_analyzers():
    eng = MeterEngine(full_config())
    s, b = 2, 64
    carry = eng.init(s)
    meta = StreamMeta.default(s)
    sig = sine_wave(440.0, 8_000.0, b * 8, 0.5)
    for i in range(8):
        block = np.zeros((s, b, 8), np.float32)
        block[:, :, 0] = block[:, :, 1] = sig[i * b : (i + 1) * b]
        carry, snaps = eng.step(carry, block, meta)
    assert set(snaps) == {
        "loudness", "spectrogram", "spectrum", "oscilloscope", "stereometer", "waveform",
    }
    # the engine's oscilloscope runs external-capture mode: traces come
    # from the display-rate extraction, not the hop snapshot
    osc = eng.extract_oscilloscope(carry)
    assert osc.samples.shape[-1] > 0
    assert np.isfinite(np.asarray(osc.samples)).all()
    assert np.isfinite(np.asarray(snaps["stereometer"].correlations)).all()
    assert np.isfinite(np.asarray(snaps["waveform"].col_min)).all()


def test_full_engine_sharded_dryrun():
    eng = MeterEngine(full_config())
    mesh = make_mesh()
    step, place = sharded_step(eng, mesh)
    s, b = 16, 64
    carry = place(eng.init(s))
    meta = StreamMeta.default(s)
    block = np.zeros((s, b, 8), np.float32)
    block[:, :, 0] = 0.25
    reset = np.zeros((s,), bool)
    carry, snaps = step(carry, block, meta, reset)
    import jax

    jax.block_until_ready(snaps)
    assert np.asarray(snaps["loudness"].momentary_lufs).shape == (s,)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
