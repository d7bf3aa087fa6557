"""Headless view-state math: the numeric half of the reference's view models.

The reference splits each visual into processor (DSP) -> state (view model)
-> render (wgpu).  The GUI/GPU halves are out of scope for the rebuild
(BASELINE), but their *parameters and math* shape the headless API so
downstream renderers can be built on top (SURVEY §2.12-2.13).  This module
provides those numerics:

- peak-hold ballistics (loudness/state.rs:36-60: 2 s hold, 60 dB/s decay)
- snapshot persistence blending (oscilloscope/state.rs:13,52-77)
- min/max line decimation (render/common.rs:306-383)
- 5-stop gradient palettes with positions + spreads
  (shaders/spectrogram.wgsl:77-98, persistence/palette.rs:37-84)
- stereometer "Scaled" radial compression (stereometer/render.rs:21-62)
- spectrogram history column retention ring (spectrogram/state.rs:53-175)

Everything is plain numpy (host-side, render-prep rate, not hop rate).
"""

from __future__ import annotations

import dataclasses

import numpy as np

PEAK_HOLD_SECONDS = 2.0  # loudness/state.rs:21
PEAK_DECAY_DB_PER_SEC = 60.0  # loudness/state.rs:22
MAX_PERSISTENCE = 0.98  # oscilloscope/state.rs:13


@dataclasses.dataclass
class PeakHold:
    """Vectorized peak-hold with hold window + linear dB decay.

    Matches reference ``PeakHold::update`` (loudness/state.rs:41-60): a new
    maximum re-arms the hold; after ``hold`` seconds the value decays at
    ``decay_db_per_sec`` but never below the live value.
    """

    db: np.ndarray
    decay_from: np.ndarray  # absolute seconds
    hold: float = PEAK_HOLD_SECONDS
    decay_db_per_sec: float = PEAK_DECAY_DB_PER_SEC

    @staticmethod
    def new(shape, floor_db: float, now: float = 0.0, **kw) -> "PeakHold":
        return PeakHold(
            db=np.full(shape, floor_db, np.float32),
            decay_from=np.full(shape, now, np.float64),
            **kw,
        )

    def update(self, value: np.ndarray, now: float) -> np.ndarray:
        value = np.asarray(value, np.float32)
        rising = value > self.db
        self.decay_from = np.where(rising, now + self.hold, self.decay_from)
        self.db = np.where(rising, value, self.db)
        decaying = ~rising & (now > self.decay_from)
        dt = np.maximum(now - self.decay_from, 0.0)
        decayed = np.maximum(self.db - self.decay_db_per_sec * dt, value)
        self.db = np.where(decaying, decayed.astype(np.float32), self.db)
        self.decay_from = np.where(decaying, now, self.decay_from)
        return self.db


def persistence_blend(previous, current, persistence: float):
    """Oscilloscope trace afterglow: EMA of consecutive snapshots with factor
    clamped to <= 0.98 (oscilloscope/state.rs:13,52-77)."""
    p = min(max(float(persistence), 0.0), MAX_PERSISTENCE)
    if previous is None or previous.shape != np.shape(current):
        return np.asarray(current, np.float32)
    return (previous * p + np.asarray(current, np.float32) * (1.0 - p)).astype(
        np.float32
    )


def decimate_minmax_line(points: np.ndarray, max_points: int) -> np.ndarray:
    """Min/max bucket decimation of an x-ordered finite polyline.

    Functional port of ``decimate_finite_ordered_line_in_place``
    (render/common.rs:306-383): splits the x-range into ``max_points/2``
    buckets (at most one per unit x), keeps each bucket's min/max in x-order,
    collapses narrow buckets to vertical segments, dedupes repeats.
    """
    pts = np.asarray(points, np.float32)
    if max_points < 2:
        return pts[:max_points]
    if len(pts) <= 1:
        return pts
    x0, x_last = float(pts[0, 0]), float(pts[-1, 0])
    width = x_last - x0
    bucketed = np.isfinite(width) and width > 0.0
    buckets = min(max_points // 2, max(int(np.ceil(width)), 1)) if bucketed else 1
    out: list[tuple[float, float]] = []

    def push(pt):
        if not out or out[-1] != pt:
            out.append(pt)

    read, groups = 0, 0
    n = len(pts)
    bucket_width = width / buckets if bucketed else 0.0
    scale = buckets / width if bucketed else 0.0
    while read < n:
        start = read
        if bucketed:
            b = int(np.clip((pts[start, 0] - x0) * scale, 0, buckets - 1))
        else:
            b = 0
        groups += 1
        end_x = x0 + bucket_width * (b + 1) if (bucketed and groups < buckets) else np.inf
        mn = mx = start
        read = start + 1
        while read < n and pts[read, 0] <= end_x:
            if pts[read, 1] < pts[mn, 1]:
                mn = read
            if pts[read, 1] > pts[mx, 1]:
                mx = read
            read += 1
        if pts[read - 1, 0] - pts[start, 0] <= 1.0:
            x = (float(pts[start, 0]) + float(pts[read - 1, 0])) * 0.5
            push((x, float(pts[mn, 1])))
            push((x, float(pts[mx, 1])))
        else:
            for i in (min(mn, mx), max(mn, mx)):
                push((float(pts[i, 0]), float(pts[i, 1])))
    return np.asarray(out, np.float32)


def sanitize_stop_spreads(spreads, count: int) -> np.ndarray:
    """Per-stop spread exponents, defaulting to 1.0 (persistence/palette.rs)."""
    out = np.ones(count, np.float32)
    if spreads is not None:
        s = np.asarray(spreads, np.float32)
        m = min(len(s), count)
        valid = np.isfinite(s[:m]) & (s[:m] > 0.0)
        out[:m] = np.where(valid, s[:m], 1.0)
    return out


@dataclasses.dataclass(frozen=True)
class GradientPalette:
    """N-stop gradient with interior positions and per-stop spreads.

    ``evaluate(t)`` matches the spectrogram resolve shader
    (spectrogram.wgsl:77-98): find the segment, normalize, and blend with
    exponent ``left_spread / right_spread`` when spreads differ from 1.
    """

    colors: np.ndarray  # [N, 4] rgba in [0,1]
    positions: np.ndarray  # [N] increasing, first 0, last 1
    spreads: np.ndarray  # [N]

    @staticmethod
    def make(colors, positions=None, spreads=None) -> "GradientPalette":
        colors = np.asarray(colors, np.float32)
        n = len(colors)
        if positions is None:
            positions = np.linspace(0.0, 1.0, n)
        return GradientPalette(
            colors=colors,
            positions=np.asarray(positions, np.float32),
            spreads=sanitize_stop_spreads(spreads, n),
        )

    def evaluate(self, t) -> np.ndarray:
        t = np.clip(np.asarray(t, np.float32), 0.0, 1.0)
        seg = np.clip(
            np.searchsorted(self.positions, t, side="left") - 1,
            0,
            len(self.colors) - 2,
        )
        lo = self.positions[seg]
        hi = self.positions[seg + 1]
        lin = np.clip((t - lo) / np.maximum(hi - lo, 1e-6), 0.0, 1.0)
        sl = self.spreads[seg]
        sr = self.spreads[seg + 1]
        plain = (np.abs(sl - 1.0) < 1e-4) & (np.abs(sr - 1.0) < 1e-4)
        blend = np.where(plain, lin, np.clip(lin ** (sl / np.maximum(sr, 1e-6)), 0, 1))
        return (
            self.colors[seg] * (1.0 - blend[..., None])
            + self.colors[seg + 1] * blend[..., None]
        ).astype(np.float32)


# The built-in spectrogram heat ramp (palettes.rs:10-16).
HEAT_RAMP = GradientPalette.make(
    [
        [0.0, 0.0, 0.0, 0.0],
        [0x38 / 255, 0.0, 0xAD / 255, 1.0],
        [1.0, 0.0, 0.0, 1.0],
        [1.0, 1.0, 0x21 / 255, 1.0],
        [1.0, 1.0, 1.0, 1.0],
    ]
)


def stereometer_scaled_compression(x, y):
    """The "Scaled" stereometer display mapping: radial compression
    ``p * 0.886 * r^-0.7`` matched in sdf.wgsl:46-54
    (stereometer/render.rs:21-62)."""
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.float32)
    r = np.sqrt(x * x + y * y)
    gain = np.where(r > 1e-9, 0.886 * np.power(np.maximum(r, 1e-9), -0.7), 0.0)
    scale = np.minimum(gain, 1.0 / np.maximum(r, 1e-9))  # clamp inside unit box
    return x * scale, y * scale


def reassigned_accumulate(
    freq_hz: np.ndarray,
    time_offset: np.ndarray,
    power: np.ndarray,
    point_valid: np.ndarray,
    *,
    time_bins: int,
    freq_lo_hz: float,
    freq_hi_hz: float,
    freq_bins: int,
    scale=None,
    time_origin: float = 0.0,
    power_scale: float = 1.0,
) -> np.ndarray:
    """Accumulate reassigned (t, f, power) splats into a dense image.

    The headless analogue of the GPU splat pass (spectrogram/render.rs:93-158,
    spectrogram.wgsl:216-225): points are additively deposited into a
    ``[time_bins, freq_bins]`` power image with nearest-bin splatting on the
    chosen frequency scale; power conservation holds (sum of image =
    ``power_scale`` * sum of deposited powers).  Feed the result through
    ``power -> dB -> GradientPalette.evaluate`` for the rendered picture.

    ``time_offset`` is in hops relative to each point's column;
    ``time_origin`` shifts columns into image coordinates.
    """
    from openmeters_tpu.utils.frequency import FrequencyScale

    scale = scale or FrequencyScale.LOGARITHMIC
    f = np.asarray(freq_hz, np.float32).ravel()
    t = np.asarray(time_offset, np.float32).ravel() + time_origin
    p = np.asarray(power, np.float32).ravel() * power_scale
    m = np.asarray(point_valid, bool).ravel()

    img = np.zeros((time_bins, freq_bins), np.float32)
    if not m.any():
        return img
    f, t, p = f[m], t[m], p[m]
    fx = scale.pos_of(freq_lo_hz, freq_hi_hz, f)
    fi = np.clip((fx * freq_bins).astype(np.int64), 0, freq_bins - 1)
    ti = np.clip(np.round(t).astype(np.int64), 0, time_bins - 1)
    np.add.at(img, (ti, fi), p)
    return img


def resample_trace(window: np.ndarray, span: float, frac: float = 0.0,
                   max_points: int = 4096) -> np.ndarray:
    """Oscilloscope ``downsample_trace`` (oscilloscope/processor.rs:788-803):
    linearly resample a captured window to ``clamp(round(span)+1, 2,
    max_points)`` points starting at fractional offset ``frac``.

    The device snapshot ships the raw capture window; this render-side helper
    produces exactly the reference's resampled trace.
    """
    data = np.asarray(window, np.float32)
    if data.ndim > 1:
        return np.stack([resample_trace(d, span, frac, max_points) for d in data])
    if len(data) < 2:
        return np.zeros(0, np.float32)
    target = int(np.clip(round(span) + 1, 2, max_points))
    last = len(data) - 1.0
    frac = float(np.clip(frac, 0.0, last))
    span = min(float(span), last - frac)
    if not (np.isfinite(span) and span > 0):
        return np.zeros(0, np.float32)
    pos = frac + np.arange(target) * (span / (target - 1))
    i0 = np.clip(pos.astype(np.int64), 0, len(data) - 1)
    i1 = np.clip(i0 + 1, 0, len(data) - 1)
    t = (pos - i0).astype(np.float32)
    out = data[i0] * (1 - t) + data[i1] * t
    return np.where((pos >= 0) & (pos <= last), out, 0.0).astype(np.float32)


class WaveformHistory:
    """Host-side waveform column ring (waveform/state.rs + processor's
    ``max_columns`` retention, processor.rs:11,189-197,291-296): keeps the
    newest ``max_columns`` (min, max, color, rms) column records per stream
    for scroll rendering; resizing keeps the newest suffix."""

    MAX_COLUMN_CAPACITY = 8192  # reference processor.rs:11

    def __init__(self, max_columns: int = MAX_COLUMN_CAPACITY):
        self.max_columns = min(max(max_columns, 1), self.MAX_COLUMN_CAPACITY)
        self.columns: list[dict] = []

    def push_snapshot(self, snapshot, stream: int = 0) -> int:
        """Append the valid columns of one WaveformSnapshot; returns count."""
        valid = np.asarray(snapshot.col_valid)[stream]
        count = 0
        for k in np.nonzero(valid)[0]:
            self.columns.append(
                {
                    "min": np.asarray(snapshot.col_min)[stream, k],
                    "max": np.asarray(snapshot.col_max)[stream, k],
                    "color": np.asarray(snapshot.col_color)[stream, k],
                    "rms_db": np.asarray(snapshot.col_rms_db)[stream, k],
                }
            )
            count += 1
        if len(self.columns) > self.max_columns:
            del self.columns[: len(self.columns) - self.max_columns]
        return count

    def resize(self, max_columns: int) -> None:
        self.max_columns = min(max(max_columns, 1), self.MAX_COLUMN_CAPACITY)
        if len(self.columns) > self.max_columns:
            del self.columns[: len(self.columns) - self.max_columns]


class SpectrogramHistory:
    """Host-side column ring mirror (spectrogram/state.rs:53-175): retains the
    most recent ``columns`` packed-u16 classic columns for renderers, resizing
    by keeping the newest suffix."""

    def __init__(self, bins: int, columns: int):
        self.bins = bins
        self.columns = columns
        self.data = np.zeros((columns, bins), np.uint16)
        self.filled = 0

    def push(self, cols: np.ndarray) -> None:
        cols = np.atleast_2d(cols)
        k = len(cols)
        if k >= self.columns:
            self.data[:] = cols[-self.columns :]
            self.filled = self.columns
            return
        self.data = np.roll(self.data, -k, axis=0)
        self.data[-k:] = cols
        self.filled = min(self.filled + k, self.columns)

    def resize(self, columns: int) -> None:
        if columns == self.columns:
            return
        new = np.zeros((columns, self.bins), np.uint16)
        keep = min(self.filled, columns)
        if keep:
            new[-keep:] = self.data[len(self.data) - keep :]
        self.data = new
        self.columns = columns
        self.filled = keep

    def view(self) -> np.ndarray:
        """Newest-last [filled, bins] view."""
        return self.data[len(self.data) - self.filled :]
