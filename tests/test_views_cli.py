"""View-state math, checkpoint/resume, and CLI tests."""

import numpy as np
import pytest

from conftest import sine_wave
from openmeters_tpu.views import (
    HEAT_RAMP,
    GradientPalette,
    PeakHold,
    SpectrogramHistory,
    decimate_minmax_line,
    persistence_blend,
    sanitize_stop_spreads,
    stereometer_scaled_compression,
)


def test_peak_hold_holds_then_decays():
    # loudness/state.rs: 2 s hold, 60 dB/s decay
    ph = PeakHold.new((1,), -99.9, now=0.0)
    ph.update(np.array([-10.0]), 0.0)
    assert ph.db[0] == -10.0
    ph.update(np.array([-60.0]), 1.0)  # inside hold window
    assert ph.db[0] == -10.0
    ph.update(np.array([-140.0]), 3.0)  # 1 s past hold -> -60 dB/s
    assert ph.db[0] == pytest.approx(-10.0 - 60.0, abs=1e-4)
    ph.update(np.array([-60.0]), 10.0)  # decay clamps at the live value
    assert ph.db[0] == -60.0


def test_persistence_blend_clamps():
    prev = np.zeros(4, np.float32)
    cur = np.ones(4, np.float32)
    out = persistence_blend(prev, cur, 2.0)  # clamp at 0.98
    assert out[0] == pytest.approx(0.02)
    assert persistence_blend(None, cur, 0.5)[0] == 1.0


def test_decimate_minmax_preserves_extremes():
    x = np.arange(1000, dtype=np.float32)
    y = np.sin(x * 0.1).astype(np.float32)
    y[500] = 5.0
    y[600] = -5.0
    pts = np.stack([x, y], -1)
    dec = decimate_minmax_line(pts, 64)
    assert len(dec) <= 64
    assert dec[:, 1].max() == 5.0
    assert dec[:, 1].min() == -5.0
    assert np.all(np.diff(dec[:, 0]) >= 0)


def test_gradient_palette_matches_shader_semantics():
    pal = GradientPalette.make(
        [[0, 0, 0, 1], [1, 0, 0, 1], [0, 1, 0, 1]],
        positions=[0.0, 0.5, 1.0],
        spreads=[1.0, 2.0, 1.0],
    )
    np.testing.assert_allclose(pal.evaluate(0.0), [0, 0, 0, 1])
    np.testing.assert_allclose(pal.evaluate(1.0), [0, 1, 0, 1])
    # spread != 1: blend = lin^(sl/sr) = 0.5^(1/2) in the first segment
    mid = pal.evaluate(0.25)
    assert mid[0] == pytest.approx(0.5**0.5, abs=1e-5)
    heat = HEAT_RAMP.evaluate(np.linspace(0, 1, 7))
    assert heat.shape == (7, 4)
    assert heat[0, 3] == 0.0 and heat[-1, 3] == 1.0  # transparent -> opaque


def test_sanitize_stop_spreads():
    out = sanitize_stop_spreads([2.0, -1.0, np.nan], 5)
    np.testing.assert_allclose(out, [2.0, 1.0, 1.0, 1.0, 1.0])


def test_stereometer_scaled_compression_matches_formula():
    x, y = stereometer_scaled_compression(0.5, 0.0)
    r = 0.5
    assert x == pytest.approx(min(0.5 * 0.886 * r**-0.7, 1.0), rel=1e-5)
    assert y == 0.0


def test_spectrogram_history_ring_and_resize():
    h = SpectrogramHistory(bins=4, columns=8)
    h.push(np.arange(4, dtype=np.uint16)[None])
    h.push(np.stack([np.full(4, i, np.uint16) for i in (1, 2, 3)]))
    assert h.filled == 4
    v = h.view()
    assert np.all(v[-1] == 3) and np.all(v[0] == [0, 1, 2, 3])
    h.resize(2)  # keep newest suffix (spectrogram/state.rs remap plan)
    v = h.view()
    assert len(v) == 2 and np.all(v[-1] == 3) and np.all(v[0] == 2)


def test_checkpoint_roundtrip(tmp_path):
    from openmeters_tpu.analyzers.spectrogram import SpectrogramConfig
    from openmeters_tpu.checkpoint import load_state, save_state
    from openmeters_tpu.engine import EngineConfig, MeterEngine, StreamMeta

    cfg = EngineConfig(
        spectrogram=SpectrogramConfig(fft_size=256, hop_size=64, use_reassignment=False),
        spectrum=None,
        oscilloscope=None, stereometer=None, waveform=None,
    )
    eng = MeterEngine(cfg)
    carry = eng.init(2)
    meta = StreamMeta.default(2)
    sig = sine_wave(1000.0, 48_000.0, 256 * 8, 0.5)
    block = np.zeros((2, 256, 8), np.float32)
    for i in range(8):
        block[:, :, 0] = block[:, :, 1] = sig[i * 256 : (i + 1) * 256]
        carry, snap_a = eng.step(carry, block, meta)

    p = tmp_path / "state.npz"
    save_state(str(p), eng, carry)
    restored = load_state(str(p), eng)

    # continue both and compare snapshots exactly
    carry1, s1 = eng.step(carry, block, meta)
    carry2, s2 = eng.step(restored, block, meta)
    np.testing.assert_array_equal(
        np.asarray(s1["loudness"].short_term_lufs),
        np.asarray(s2["loudness"].short_term_lufs),
    )
    np.testing.assert_array_equal(
        np.asarray(s1["spectrogram"].codes), np.asarray(s2["spectrogram"].codes)
    )

    # mismatched config refuses to load
    other = MeterEngine(EngineConfig(spectrogram=None, spectrum=None))
    with pytest.raises(ValueError):
        load_state(str(p), other)


def test_checkpoint_migrates_across_mesh_sizes(tmp_path):
    """The checkpoint's stated purpose: migrate streams across chips.  Save
    a carry advanced on an 8-device mesh, restore it onto a 4-device mesh,
    and continue — results match the original topology."""
    from openmeters_tpu.analyzers.spectrogram import SpectrogramConfig
    from openmeters_tpu.checkpoint import load_state, save_state
    from openmeters_tpu.engine import (
        EngineConfig,
        MeterEngine,
        StreamMeta,
        make_mesh,
        sharded_step,
    )

    cfg = EngineConfig(
        spectrogram=SpectrogramConfig(
            fft_size=256, hop_size=64, use_reassignment=False
        ),
        spectrum=None,
        oscilloscope=None, stereometer=None, waveform=None,
    )
    eng = MeterEngine(cfg)
    s = 8
    step8, place8 = sharded_step(eng, make_mesh(8))
    carry = place8(eng.init(s))
    meta = StreamMeta.default(s)
    sig = sine_wave(440.0, 48_000.0, 256 * 4, 0.5)
    block = np.zeros((s, 256, 8), np.float32)
    reset = np.zeros((s,), bool)
    for i in range(4):
        block[:, :, 0] = block[:, :, 1] = sig[i * 256 : (i + 1) * 256]
        carry, _ = step8(carry, block, meta, reset)

    p = tmp_path / "mesh8.npz"
    save_state(str(p), eng, carry)

    step4, place4 = sharded_step(eng, make_mesh(4))
    restored = place4(load_state(str(p), eng))
    _, s_old = step8(carry, block, meta, reset)
    _, s_new = step4(restored, block, meta, reset)
    np.testing.assert_allclose(
        np.asarray(s_old["loudness"].short_term_lufs),
        np.asarray(s_new["loudness"].short_term_lufs),
        atol=5e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(s_old["spectrogram"].codes),
        np.asarray(s_new["spectrogram"].codes),
    )


def test_checkpoint_loudness_only(tmp_path):
    """A loudness-only engine has no 1-D int carry leaf; n_streams now rides
    in the checkpoint metadata so this config restores too."""
    from openmeters_tpu.checkpoint import load_state, save_state
    from openmeters_tpu.engine import EngineConfig, MeterEngine, StreamMeta

    eng = MeterEngine(EngineConfig(spectrogram=None, spectrum=None))
    carry = eng.init(3)
    meta = StreamMeta.default(3)
    block = np.zeros((3, 256, 8), np.float32)
    block[:, :, 0] = 0.25
    carry, _ = eng.step(carry, block, meta)

    p = tmp_path / "loudness.npz"
    save_state(str(p), eng, carry)
    restored = load_state(str(p), eng)
    _, s1 = eng.step(carry, block, meta)
    _, s2 = eng.step(restored, block, meta)
    np.testing.assert_array_equal(
        np.asarray(s1["loudness"].momentary_lufs),
        np.asarray(s2["loudness"].momentary_lufs),
    )


def test_cli_selftest_and_analyze(tmp_path, capsys):
    from openmeters_tpu.__main__ import main
    from openmeters_tpu.io.wav import write_wav

    assert main(["selftest"]) == 0

    rate = 48_000.0
    tone = sine_wave(997.0, rate, int(rate * 0.3), 0.5)
    wav = tmp_path / "t.wav"
    write_wav(str(wav), np.stack([tone, tone], -1), rate)
    assert main(["analyze", str(wav), "--compact"]) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    import json

    doc = json.loads(out)
    assert doc["loudness"]["momentary_lufs"] == pytest.approx(-6.0, abs=0.3)

    settings = tmp_path / "s.json"
    assert main(["settings", "--init", str(settings)]) == 0
    assert settings.exists()


def test_cli_render_uses_wav_native_rate(tmp_path, monkeypatch, capsys):
    """`render` must rasterize with the WAV's native rate — the engine
    analyzes at it (api.analyze re-rates the config), so rendering with the
    config's 48 kHz default would mislabel every frequency by rate/48000."""
    import openmeters_tpu.__main__ as cli
    from openmeters_tpu.io.wav import write_wav

    rate = 44_100.0
    tone = sine_wave(997.0, rate, int(rate * 0.5), 0.4)
    wav = tmp_path / "t44.wav"
    write_wav(str(wav), np.stack([tone, tone], -1), rate)

    seen = {}
    import openmeters_tpu.render as render_mod

    real = render_mod.render_series

    def spy(series, config, out_dir, **kw):
        seen["rate"] = config.sample_rate
        return real(series, config, out_dir, **kw)

    monkeypatch.setattr(render_mod, "render_series", spy)
    assert cli.main(["render", str(wav), str(tmp_path / "out")]) == 0
    assert seen["rate"] == rate
    assert (tmp_path / "out" / "spectrum.png").exists()


def test_cli_serve_socket_sessions(tmp_path, capsys):
    """`serve --socket --rates` runs the session runtime end-to-end: a
    producer connects mid-run, its link shows in the report."""
    import json
    import os
    import threading
    import time

    from openmeters_tpu.__main__ import main

    sock = str(tmp_path / "cli.sock")
    connected = {}
    stop = threading.Event()

    def producer():
        # schedule-tolerant: wait for the socket, connect, then keep the
        # link alive with periodic pushes until the serve loop ends — a
        # loaded CI host may not schedule this thread promptly, so nothing
        # here asserts wall-clock timing (this test flaked on exactly that)
        deadline = time.monotonic() + 120.0
        while time.monotonic() < deadline and not os.path.exists(sock):
            time.sleep(0.05)
        from openmeters_tpu.ingest.runtime import ProducerClient

        c = ProducerClient(
            sock, {"app_name": "cli44", "channels": 2, "sample_rate": 44_100.0},
            timeout=60.0,
        )
        try:
            connected["slot"] = c.connect()
            t = np.arange(4410) / 44_100.0
            x = (0.4 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
            n = 0
            while not stop.wait(0.1):
                c.send_pcm(np.stack([x, x], -1), int(n / 44_100.0 * 1e9))
                n += len(x)
        except OSError:
            pass  # serve loop closed the socket first: fine
        finally:
            c.close()

    th = threading.Thread(target=producer, daemon=True)
    th.start()
    rc = main([
        "serve", "--socket", sock, "--rates", "44100,48000",
        "--streams", "2", "--duration", "5.0", "--fetch", "none",
    ])
    stop.set()
    th.join(timeout=10)
    assert rc == 0
    assert connected.get("slot") is not None
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "44100.0" in report and "48000.0" in report
    assert "app.name:cli44" in report["links"]


def test_waveform_history_ring():
    from openmeters_tpu.analyzers.waveform import WaveformAnalyzer, WaveformConfig
    from openmeters_tpu.views import WaveformHistory

    cfg = WaveformConfig(
        sample_rate=4.0, scroll_speed=2.0, analyze_bands=False, block_frames=4
    )
    ana = WaveformAnalyzer(cfg)
    carry = ana.init(1)
    hist = WaveformHistory(max_columns=3)
    for i in range(4):
        carry, snap = ana.step(
            carry, np.full((1, 4, 2), float(i), np.float32)
        )
        hist.push_snapshot(snap)
    assert len(hist.columns) == 3  # capped
    assert hist.columns[-1]["max"][0] == 3.0
    hist.resize(1)
    assert len(hist.columns) == 1 and hist.columns[0]["max"][0] == 3.0


# --- spectrum display mapping (spectrum/state.rs parity) --------------------


def test_spectrum_points_mask_nonfinite():
    """Mirror of the reference unit test point_build_emits_only_finite_
    coordinates (state.rs:404-418): NaN/Inf magnitudes are masked."""
    from openmeters_tpu.utils.frequency import FrequencyScale
    from openmeters_tpu.views import spectrum_points

    pts, valid = spectrum_points(
        np.array([0.0, np.nan, -10.0, np.inf], np.float32),
        np.array([0.0, 20.0, 30.0, 40.0], np.float32),
        FrequencyScale.LINEAR, floor_db=-100.0, min_f=20.0, max_f=40.0,
    )
    assert pts.shape == (3, 2) and valid.tolist() == [False, True, False]
    assert np.isfinite(pts[valid]).all()


def test_spectrum_rebin_display_interpolates():
    from openmeters_tpu.utils.frequency import FrequencyScale
    from openmeters_tpu.views import spectrum_rebin_display

    bins = np.linspace(0.0, 24_000.0, 513).astype(np.float32)
    db = -60.0 + bins / 400.0  # linear ramp in frequency
    for scale in FrequencyScale:
        out = spectrum_rebin_display(db[None], bins, scale, 256, mode="sample")
        assert out.shape == (1, 256)
        t = (np.arange(256) + 0.5) / 256
        want = -60.0 + np.asarray(
            scale.freq_at(20.0, float(bins[-1]), t), np.float32
        ) / 400.0
        np.testing.assert_allclose(out[0], want, atol=0.05)
        # monotone scale -> monotone display of a monotone trace
        assert (np.diff(out[0]) >= -1e-3).all()


def test_spectrum_grid_ticks_decades():
    from openmeters_tpu.utils.frequency import FrequencyScale
    from openmeters_tpu.views import spectrum_grid_ticks

    ticks = spectrum_grid_ticks(20.0, 20_000.0, FrequencyScale.LOGARITHMIC)
    freqs = [t[0] for t in ticks]
    assert freqs == sorted(freqs)
    assert 1000.0 in freqs and 20.0 in freqs and 20_000.0 in freqs
    majors = [f for f, _, major, _ in ticks if major]
    assert majors == [100.0, 1000.0, 10_000.0]
    labeled = [f for f, _, _, label in ticks if label]
    assert 2000.0 in labeled and 5000.0 in labeled and 300.0 not in labeled
    for _, x, _, _ in ticks:
        assert 0.0 <= x <= 1.0


def test_spectrum_peak_label_ballistics():
    from openmeters_tpu.utils.frequency import FrequencyScale
    from openmeters_tpu.views import SpectrumPeakLabel

    bins = np.linspace(0.0, 24_000.0, 2049).astype(np.float32)
    bin_hz = float(bins[1])
    db = np.full(2049, -90.0, np.float32)
    true_f = 1000.0 + 0.3 * bin_hz
    k = int(round(true_f / bin_hz))
    # parabolic-ish bump around the true frequency
    for i in (k - 1, k, k + 1):
        db[i] = -10.0 - 8.0 * ((i * bin_hz - true_f) / bin_hz) ** 2

    label = SpectrumPeakLabel(floor_db=-100.0)
    label.update(bins, db, FrequencyScale.LOGARITHMIC)
    assert label.content is not None and label.opacity == 1.0
    assert "kHz" in label.content[1]
    # refined frequency within a fraction of a bin
    f_shown = label.content[0]
    assert f_shown  # note name or frequency text
    # fade out when the signal drops below the visibility floor
    silent = np.full(2049, -100.0, np.float32)
    for _ in range(40):
        label.update(bins, silent, FrequencyScale.LOGARITHMIC)
    assert label.content is None and label.opacity == 0.0


def test_spectrum_analyzer_to_display_pipeline():
    """End-to-end: analyzer snapshot -> rebinned ERB display output."""
    from openmeters_tpu.utils.frequency import FrequencyScale
    from openmeters_tpu.views import spectrum_rebin_display

    rate, n = 48_000.0, 16_384
    bins = np.fft.rfftfreq(n, 1.0 / rate).astype(np.float32)
    db = np.full((2, len(bins)), -90.0, np.float32)
    k = int(round(2000.0 * n / rate))
    db[:, k] = -6.0
    out = spectrum_rebin_display(db, bins, FrequencyScale.ERB, 512)
    assert out.shape == (2, 512)
    # the tone lands at its ERB display position
    pos = float(FrequencyScale.ERB.pos_of(20.0, float(bins[-1]), 2000.0))
    assert abs(int(np.argmax(out[0])) - int(pos * 512)) <= 2


def test_waveform_scroll_clock_interpolation():
    """waveform/state.rs:92-105: fresh clock extrapolates by elapsed *
    rate (clamped), stale clock snaps to the processor preview progress."""
    from openmeters_tpu.views import WaveformScrollClock

    clk = WaveformScrollClock()
    clk.mark_snapshot(0.0)
    # first call: elapsed 0.02s within timeout -> extrapolate from offset 0
    p = clk.progress(0.02, preview_progress=0.5, columns_per_sec=10.0)
    assert abs(p - 0.2) < 1e-6
    # keeps integrating across frames while fresh
    clk.mark_snapshot(0.05)
    p = clk.progress(0.05, preview_progress=0.9, columns_per_sec=10.0)
    assert abs(p - 0.5) < 1e-6
    # clamp at 1.0
    clk.mark_snapshot(0.13)
    p = clk.progress(0.13, preview_progress=0.0, columns_per_sec=10.0)
    assert p == 1.0
    # stale (no snapshot within 100 ms) -> snap back to preview progress
    p = clk.progress(0.5, preview_progress=0.35, columns_per_sec=10.0)
    assert p == 0.35


def test_tui_bar_primitives():
    from openmeters_tpu.tui import _bar, _center_bar, _marker_bar

    assert _bar(0.0, -60, 0, 10) == "█" * 10  # full scale
    assert _bar(-60.0, -60, 0, 10) == " " * 10
    assert len(_bar(-30.0, -60, 0, 10)) == 10
    mid = _center_bar(0.0, 20)
    assert mid[10] == "│" and "█" not in mid
    pos = _center_bar(0.8, 20)
    assert "█" in pos[11:] and "█" not in pos[:10]
    neg = _center_bar(-0.8, 20)
    assert "█" in neg[:10] and "█" not in neg[11:]
    held = _marker_bar(-40.0, -10.0, -60, 0, 24)
    assert "▕" in held  # hold tick above the live level
