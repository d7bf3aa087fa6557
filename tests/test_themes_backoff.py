"""Theme store and reconnect backoff tests (reference theme.rs/runtime.rs)."""

import numpy as np
import pytest

from openmeters_tpu.ingest.backoff import Backoff
from openmeters_tpu.themes import (
    BUILTIN_THEMES,
    Theme,
    ThemeStore,
    palette_diff,
    palette_from_diff,
    _default_palette,
)
from openmeters_tpu.views import GradientPalette


def test_backoff_envelope():
    # runtime.rs:29-32: 250 ms -> 8 s doubling, success resets
    b = Backoff.session()
    delays = [b.failure(now=0.0) for _ in range(8)]
    assert delays[0] == 0.25
    assert delays[:6] == [0.25, 0.5, 1.0, 2.0, 4.0, 8.0]
    assert delays[6] == 8.0  # capped
    b.success()
    assert b.failure(now=0.0) == 0.25
    r = Backoff.resource()
    assert r.failure(now=0.0) == 1.0 and r.maximum == 30.0


def test_backoff_ready_gate():
    b = Backoff.session()
    b.failure(now=100.0)
    assert not b.ready(now=100.1)
    assert b.ready(now=100.3)


def test_palette_diff_roundtrip():
    default = _default_palette("spectrogram")
    custom = GradientPalette.make(
        default.colors, positions=[0.0, 0.2, 0.5, 0.8, 1.0], spreads=[1, 2, 1, 1, 1]
    )
    diff = palette_diff(custom, default)
    assert "stops" not in diff  # colors unchanged -> not persisted
    assert "stop_positions" in diff and "stop_spreads" in diff
    back = palette_from_diff(diff, default)
    np.testing.assert_allclose(back.positions, custom.positions)
    np.testing.assert_allclose(back.spreads, custom.spreads)
    assert palette_diff(default, default) is None  # no diff -> nothing stored


def test_theme_store_roundtrip_and_builtin_protection(tmp_path):
    store = ThemeStore(str(tmp_path / "themes"))
    assert set(BUILTIN_THEMES) <= set(store.list_themes())

    custom = Theme(
        "mine",
        palettes={
            "spectrum": GradientPalette.make(
                [[0, 0, 0, 1], [1, 0, 0, 1]], spreads=[2.0, 1.0]
            )
        },
    )
    name = store.save(custom)
    assert name == "mine"
    loaded = store.load("mine")
    np.testing.assert_allclose(
        loaded.palette("spectrum").spreads, [2.0, 1.0]
    )
    # untouched visuals fall back to defaults
    assert loaded.palette("spectrogram") is _default_palette("spectrogram")

    # builtin names are read-only: saving auto-names default-custom-N
    name = store.save(Theme("default"))
    assert name == "default-custom-1"
    name = store.save(Theme("default"))
    assert name == "default-custom-2"
    assert not store.delete("default")  # builtin undeletable
    assert store.delete("default-custom-1")


def test_theme_stroke_endpoints_match_stock_colors():
    """The builtin default theme's endpoint mapping reproduces the
    renderer's stock constants exactly (so default-theme frames are
    byte-identical to pre-theme frames)."""
    default = BUILTIN_THEMES["default"]
    approx = pytest.approx
    assert default.stroke("spectrum") == approx((0.3, 0.9, 1.0, 1.0))
    assert default.stroke("oscilloscope", 1.0) == approx((0.3, 0.9, 1.0, 1.0))
    assert default.stroke("oscilloscope", 0.0) == approx((1.0, 0.6, 0.2, 1.0))
    assert default.stroke("stereometer") == approx((0.3, 0.9, 1.0, 0.35))
    assert default.stroke("loudness", 0.0) == approx((0.2, 0.55, 0.9, 1.0))


def test_themes_cli_editor_flow(tmp_path, capsys):
    """The headless palette editor: create from a builtin, edit a stop,
    show it back, list, delete (ui/palette_editor.rs semantics)."""
    from openmeters_tpu.__main__ import main

    d = str(tmp_path / "themes")
    assert main(["themes", "create", "mytheme", "--dir", d,
                 "--base", "heat"]) == 0
    assert main(["themes", "set-stop", "mytheme", "spectrogram", "--dir", d,
                 "--stop", "1", "--color", "0.5,0.1,0.9", "--spread", "2.0"]) == 0
    capsys.readouterr()
    assert main(["themes", "show", "mytheme", "--dir", d]) == 0
    import json as _json

    doc = _json.loads(capsys.readouterr().out)
    pal = doc["palettes"]["spectrogram"]
    assert pal["stops"][1] == pytest.approx([0.5, 0.1, 0.9, 1.0])
    assert pal["spreads"][1] == 2.0
    assert main(["themes", "list", "--dir", d]) == 0
    assert "mytheme" in capsys.readouterr().out
    # builtin themes are read-only; stored ones delete cleanly
    assert main(["themes", "delete", "default", "--dir", d]) == 1
    assert main(["themes", "delete", "mytheme", "--dir", d]) == 0
    # invalid invocations fail with a message, not a traceback
    assert main(["themes", "show", "--dir", d]) == 1
    assert main(["themes", "set-stop", "mytheme", "nosuch", "--dir", d]) == 1


def test_ui_settings_lossy_decode_and_persist(tmp_path, caplog):
    """The persisted ui section (theme + pane layout) decodes lossily and
    survives a SettingsHandle round trip."""
    import logging

    from openmeters_tpu.persistence import (
        SettingsHandle,
        UiSettings,
        decode_ui,
    )

    with caplog.at_level(logging.WARNING, logger="openmeters_tpu.settings"):
        ui = decode_ui({
            "theme": "heat",
            "pane_layout": [["spectrum", "nosuchpane"], ["waveform"], []],
            "mystery": 1,
        })
    assert ui.theme == "heat"
    assert ui.pane_layout == (("spectrum",), ("waveform",))
    text = caplog.text
    assert "nosuchpane" in text and "mystery" in text

    # invalid section/theme fall back whole-scope / narrowest-scope
    assert decode_ui(42).pane_layout == UiSettings().pane_layout
    assert decode_ui({"theme": 3}).theme == "default"

    path = str(tmp_path / "settings.json")
    h = SettingsHandle(path)
    h.update_ui(UiSettings(theme="heat", pane_layout=(("loudness",),)))
    h.flush()
    h2 = SettingsHandle(path)
    assert h2.ui.theme == "heat"
    assert h2.ui.pane_layout == (("loudness",),)
    # the engine-config half still decodes cleanly next to the ui key
    assert h2.config.sample_rate == h.config.sample_rate
