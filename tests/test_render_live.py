"""Live render consumer: the headless render loop riding the serve drain.

The reference draws every visual each frame from the newest processor
state (frame_clock.rs:102-151 -> visuals/*/render.rs); here the consumer
attaches to a running MeterServer's drain callback, keeps per-frame view
state (correlation trail, reassigned splat scroll), and presents PNG
frames atomically.  These tests run the full loop deterministically
(non-realtime push/advance) and assert every active pane produces a
decodable, non-empty frame.
"""

import os
import struct
import zlib

import numpy as np

from openmeters_tpu.analyzers.oscilloscope import OscilloscopeConfig
from openmeters_tpu.analyzers.spectrogram import SpectrogramConfig
from openmeters_tpu.analyzers.spectrum import SpectrumConfig
from openmeters_tpu.analyzers.stereometer import StereometerConfig
from openmeters_tpu.analyzers.waveform import WaveformConfig
from openmeters_tpu.engine import EngineConfig
from openmeters_tpu.render_live import attach_render_consumer
from openmeters_tpu.serve import MeterServer, ServeConfig

RATE, BLOCK = 8_000.0, 64


def _engine(reassigned: bool, all_six: bool = True):
    kw = dict(
        sample_rate=RATE,
        block_frames=BLOCK,
        channels=2,
        spectrogram=SpectrogramConfig(
            fft_size=128, hop_size=32, use_reassignment=reassigned
        ),
    )
    if all_six:
        kw.update(
            spectrum=SpectrumConfig(fft_size=128, hop_size=128),
            oscilloscope=OscilloscopeConfig(),
            stereometer=StereometerConfig(),
            waveform=WaveformConfig(track_history=True),
        )
    else:
        kw.update(
            spectrum=None, oscilloscope=None, stereometer=None, waveform=None
        )
    return EngineConfig(**kw)


def _run(server, renderer, n_blocks: int = 48):
    t = np.arange(0, n_blocks * BLOCK, dtype=np.float64) / RATE
    x = (0.5 * np.sin(2.0 * np.pi * 440.0 * t)).astype(np.float32)
    stereo = np.stack([x, 0.5 * x], axis=-1)
    for i in range(n_blocks):
        blk = stereo[i * BLOCK : (i + 1) * BLOCK]
        ts = int(i * BLOCK / RATE * 1e9)
        for st in range(server.config.n_streams):
            server.transport.push_pcm(st, blk, ts)
        server.advance()
    while server._inflight:  # noqa: SLF001
        server._drain_one()  # noqa: SLF001
    renderer.render()  # one final frame from the fully drained state


def _decode_png_size(path: str) -> tuple[int, int]:
    with open(path, "rb") as fh:
        data = fh.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", path
    w, h = struct.unpack(">II", data[16:24])
    # the IDAT payload must decompress (no torn/truncated frame)
    idat = b""
    off = 8
    while off < len(data):
        (length,) = struct.unpack(">I", data[off : off + 4])
        tag = data[off + 4 : off + 8]
        if tag == b"IDAT":
            idat += data[off + 8 : off + 8 + length]
        off += 12 + length
    raw = zlib.decompress(idat)
    assert len(raw) > 0
    return int(w), int(h)


def test_render_consumer_all_panes_classic(tmp_path):
    """All six panes render from a full-fetch serve loop (classic
    spectrogram exercises the u16 history-ring path)."""
    server = MeterServer(
        ServeConfig(
            n_streams=2, channels=2, engine=_engine(reassigned=False),
            realtime=False, fetch="full", fetch_every=1, coalesce_blocks=1,
        )
    )
    try:
        r = attach_render_consumer(
            server, str(tmp_path), every=0.0, width=96, height=64
        )
        # the consumer's declared width bounds host retention (pre_ingest)
        assert server._view_histories["spectrogram"].columns == 96  # noqa: SLF001
        _run(server, r)
    finally:
        server.close()
    assert r.frames >= 2
    for name in (
        "loudness", "spectrogram", "spectrum",
        "oscilloscope", "stereometer", "waveform",
    ):
        path = os.path.join(str(tmp_path), f"{name}.png")
        assert os.path.exists(path), f"{name} pane never rendered"
        w, h = _decode_png_size(path)
        # loudness renders a narrow bar pane (min 240 wide), stereometer a
        # square; everything else fills the declared frame
        assert (w, h) == ((64, 64) if name == "stereometer" else
                          ((240, 64) if name == "loudness" else (96, 64)))
        assert not os.path.exists(path + ".tmp")  # atomic present

    # frames carry content: the spectrogram pane must not be all one color
    from openmeters_tpu.render import encode_png  # noqa: F401  (import check)

    hist = server._view_histories["spectrogram"]  # noqa: SLF001
    assert hist.filled > 0 and int(hist.view().max()) > 0


def test_render_consumer_reassigned_splat(tmp_path):
    """The reassigned pane accumulates drained point columns into a
    scrolling splat image (spectrogram.wgsl:216-225 semantics) and renders
    a non-empty frame with energy near the tone frequency."""
    server = MeterServer(
        ServeConfig(
            n_streams=2, channels=2,
            engine=_engine(reassigned=True, all_six=False),
            realtime=False, fetch="full", fetch_every=1, coalesce_blocks=1,
        )
    )
    try:
        r = attach_render_consumer(
            server, str(tmp_path), every=0.0, width=64, height=48
        )
        _run(server, r)
        img = r._reassigned  # noqa: SLF001
        assert img is not None and img.shape == (64, 48)
        assert float(img.max()) > 0.0, "no splat energy accumulated"
    finally:
        server.close()
    path = os.path.join(str(tmp_path), "spectrogram.png")
    assert os.path.exists(path)
    assert _decode_png_size(path) == (64, 48)


def test_render_consumer_honors_theme(tmp_path):
    """A custom theme recolors the panes: a pure-red spectrogram ramp and
    spectrum stroke must shift the rendered pixels red vs the builtin
    default (apply_theme analogue, ui/app.rs:142-146)."""
    from openmeters_tpu.render import decode_png
    from openmeters_tpu.themes import Theme
    from openmeters_tpu.views import GradientPalette

    red = GradientPalette.make([[0, 0, 0, 0], [1.0, 0.0, 0.0, 1.0]])
    theme = Theme("red", palettes={"spectrogram": red, "spectrum": red})

    imgs = {}
    for label, th in (("default", None), ("red", theme)):
        out = tmp_path / label
        server = MeterServer(
            ServeConfig(
                n_streams=1, channels=2, engine=_engine(reassigned=False),
                realtime=False, fetch="full", fetch_every=1,
                coalesce_blocks=1,
            )
        )
        try:
            r = attach_render_consumer(
                server, str(out), every=0.0, width=64, height=48, theme=th
            )
            _run(server, r, n_blocks=24)
        finally:
            server.close()
        for pane in ("spectrogram", "spectrum"):
            with open(out / f"{pane}.png", "rb") as fh:
                imgs[(label, pane)] = decode_png(fh.read()).astype(np.int32)

    for pane in ("spectrogram", "spectrum"):
        themed, stock = imgs[("red", pane)], imgs[("default", pane)]
        assert themed.shape == stock.shape
        assert not np.array_equal(themed, stock), f"{pane} ignored the theme"
        lit = themed[..., :3].max(-1) > 8  # colored pixels only
        assert lit.any()
        # red channel dominates everywhere the themed pane has content
        assert (themed[..., 0][lit] >= themed[..., 1][lit]).all()
        assert (themed[..., 0][lit] >= themed[..., 2][lit]).all()


def test_render_consumer_meters_mode_panes(tmp_path):
    """In fetch='meters' mode the bulk panes are absent but the packed-leaf
    panes (loudness bars, correlation meter) still render, and the consumer
    composes with an existing on_drain callback instead of replacing it."""
    server = MeterServer(
        ServeConfig(
            n_streams=2, channels=2, engine=_engine(reassigned=False),
            realtime=False, fetch="meters", fetch_every=1, coalesce_blocks=1,
        )
    )
    seen = []
    server.on_drain = lambda s: seen.append(s.stats.hops)
    try:
        r = attach_render_consumer(
            server, str(tmp_path), every=0.0, width=64, height=48
        )
        _run(server, r, n_blocks=24)
    finally:
        server.close()
    assert seen, "existing drain consumer was dropped"
    assert os.path.exists(os.path.join(str(tmp_path), "loudness.png"))
    assert os.path.exists(os.path.join(str(tmp_path), "stereometer.png"))
    # the trail advanced from packed correlation leaves
    assert len(r._trail.values) > 0  # noqa: SLF001
