"""Stream directory and reassigned splat accumulation tests."""

import numpy as np
import pytest

from openmeters_tpu.ingest.directory import StreamDirectory, StreamIdentity
from openmeters_tpu.utils.frequency import FrequencyScale
from openmeters_tpu.views import reassigned_accumulate


def test_identity_precedence():
    # graph.rs: app.id > app.name > media.name > node.name
    assert StreamIdentity(app_id="x", app_name="y").key == "app.id:x"
    assert StreamIdentity(app_name="y", node_name="z").key == "app.name:y"
    assert StreamIdentity(node_name="z").key == "node.name:z"
    assert StreamIdentity().key == "unknown"


def test_directory_assign_release_remember():
    d = StreamDirectory(2)
    a = d.acquire("app.id:a")
    b = d.acquire("app.id:b")
    assert {a, b} == {0, 1}
    assert d.acquire("app.id:c") is None  # full -> truncated
    assert d.truncated
    d.release("app.id:a")
    # returning stream re-acquires its old slot
    assert d.acquire("app.id:a") == a
    # repeated acquire is idempotent
    assert d.acquire("app.id:a") == a


def test_directory_remember_lru_eviction():
    d = StreamDirectory(1, remember_limit=2)
    for name in ("a", "b", "c", "d"):
        d.acquire(name)
        d.release(name)
    assert d.view()["remembered"] == ["c", "d"]


def test_reassigned_accumulate_conserves_power():
    rng = np.random.default_rng(0)
    n = 500
    freq = rng.uniform(30.0, 20_000.0, n).astype(np.float32)
    toff = rng.uniform(0.0, 63.0, n).astype(np.float32)
    power = rng.uniform(0.0, 1.0, n).astype(np.float32)
    valid = rng.uniform(size=n) > 0.3
    img = reassigned_accumulate(
        freq, toff, power, valid,
        time_bins=64, freq_lo_hz=20.0, freq_hi_hz=24_000.0, freq_bins=128,
        scale=FrequencyScale.LOGARITHMIC, power_scale=2.0,
    )
    assert img.shape == (64, 128)
    assert float(img.sum()) == pytest.approx(2.0 * float(power[valid].sum()), rel=1e-5)


def test_reassigned_accumulate_end_to_end():
    """Reassigned analyzer points -> splat image has a ridge at the tone."""
    from conftest import sine_wave
    from openmeters_tpu.analyzers.spectrogram import (
        SpectrogramAnalyzer,
        SpectrogramConfig,
    )

    cfg = SpectrogramConfig(
        fft_size=1024, hop_size=256, use_reassignment=True, block_frames=256
    )
    ana = SpectrogramAnalyzer(cfg)
    carry = ana.init(1)
    sig = sine_wave(1000.0, 48_000.0, 4096, 0.5)
    cols = []
    for i in range(16):
        carry, out = ana.step(carry, sig[None, i * 256 : (i + 1) * 256])
        valid = np.asarray(out.valid)[0]
        for k in np.nonzero(valid)[0]:
            cols.append(
                (
                    np.asarray(out.freq_hz)[0, k],
                    np.asarray(out.time_offset)[0, k],
                    np.asarray(out.power)[0, k],
                    np.asarray(out.point_valid)[0, k],
                )
            )
    assert cols
    f, t, p, v = cols[-1]
    img = reassigned_accumulate(
        f, t, p, v, time_bins=8, freq_lo_hz=20.0, freq_hi_hz=24_000.0,
        freq_bins=256, power_scale=ana.power_scale, time_origin=4.0,
    )
    peak_bin = int(np.argmax(img.sum(axis=0)))
    expected = FrequencyScale.LOGARITHMIC.pos_of(20.0, 24_000.0, 1000.0) * 256
    assert abs(peak_bin - expected) <= 1
