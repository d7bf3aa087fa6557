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
