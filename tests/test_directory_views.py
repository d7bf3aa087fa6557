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


def test_spectrogram_zoom_pan_uv_mapping():
    from openmeters_tpu.views import spectrogram_uv_y_range, spectrogram_zoom_at

    assert spectrogram_uv_y_range(1.0, 0.5) == (0.0, 1.0)
    lo, hi = spectrogram_uv_y_range(2.0, 0.5)
    assert (lo, hi) == (0.25, 0.75)
    # pan clamps so the window stays inside [0, 1]
    lo, hi = spectrogram_uv_y_range(2.0, 0.0)
    assert lo == 0.0 and hi == 0.5

    # cursor-anchored zoom keeps the UV under the cursor fixed (state.rs:355)
    zoom, pan = 1.0, 0.5
    y = 0.3
    lo0, hi0 = spectrogram_uv_y_range(zoom, pan)
    uv_before = lo0 + y * (hi0 - lo0)
    zoom, pan = spectrogram_zoom_at(zoom, pan, y, 1.15)
    lo1, hi1 = spectrogram_uv_y_range(zoom, pan)
    uv_after = lo1 + y * (hi1 - lo1)
    assert abs(uv_before - uv_after) < 1e-6


def test_crosshair_readout_freq_note_time():
    from openmeters_tpu.utils.frequency import FrequencyScale
    from openmeters_tpu.views import crosshair_readout, spectrogram_display_axis

    rate = 48_000.0
    lo, nyq = spectrogram_display_axis(rate)
    scale = FrequencyScale.LOGARITHMIC
    # position of 440 Hz on the axis (rotation 0: y grows downward)
    t = float(scale.pos_of(lo, nyq, 440.0))
    out = crosshair_readout(
        0.5, 1.0 - t, uv_range=(0.0, 1.0), sample_rate=rate, scale=scale,
        rotation=0, col_count=100, hop_size=64, age_px=10.0,
    )
    assert abs(out["freq_hz"] - 440.0) < 0.5
    assert out["note"].startswith("A4")
    assert abs(out["time_ago_s"] - 10 * 64 / rate) < 1e-9
    # out-of-history ages read as None (state.rs:331)
    out2 = crosshair_readout(
        0.5, 1.0 - t, uv_range=(0.0, 1.0), sample_rate=rate, scale=scale,
        rotation=0, col_count=5, hop_size=64, age_px=10.0,
    )
    assert out2["time_ago_s"] is None


def test_piano_roll_keys_tile_without_gaps():
    from openmeters_tpu.utils.frequency import FrequencyScale
    from openmeters_tpu.views import piano_roll_keys

    keys = piano_roll_keys((0.0, 1.0), 48_000.0, FrequencyScale.LOGARITHMIC)
    assert keys, "visible range must contain keys"
    whites = [k for k in keys if not k["black"]]
    blacks = [k for k in keys if k["black"]]
    assert whites and blacks
    # white keys tile the axis: consecutive whites share a boundary
    whites.sort(key=lambda k: k["freq_hz"])
    for a, b in zip(whites[:-1], whites[1:], strict=False):
        if a["extent"][1] >= 1.0 or b["extent"][0] <= 0.0:
            continue  # clipped at the visible edge
        assert abs(a["extent"][1] - b["extent"][0]) < 1e-6, (a, b)
    # every black key nests inside the union of its white neighbors
    for k in blacks:
        a, b = k["extent"]
        assert 0.0 <= a < b <= 1.0
