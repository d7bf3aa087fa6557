"""Sequential float64 golden implementations for parity testing.

Straightforward per-sample numpy re-derivations of the textbook algorithms
(DF2T biquads, BS.1770 K-weighting, libebur128 polyphase true peak, trailing
window means) used to validate the batched TPU formulations.
"""

from __future__ import annotations

import numpy as np

from openmeters_tpu.ops.truepeak import TRUE_PEAK_TAPS, polyphase_taps
from openmeters_tpu.utils.weighting import k_weighting_ba


def biquad_df2t(x: np.ndarray, coeffs, finite_reset: bool = True) -> np.ndarray:
    """Sequential DF2T biquad, float64 state."""
    b0, b1, b2, a1, a2 = [float(c) for c in coeffs]
    z0 = z1 = 0.0
    out = np.empty_like(x, dtype=np.float64)
    for i, xv in enumerate(np.asarray(x, np.float64)):
        y = b0 * xv + z0
        z0 = b1 * xv - a1 * y + z1
        z1 = b2 * xv - a2 * y
        if finite_reset and not np.isfinite(y):
            y, z0, z1 = 0.0, 0.0, 0.0
        out[i] = y
    return out


def k_weight(x: np.ndarray, sample_rate: float) -> np.ndarray:
    """Sequential 5-tap K-weighting, float64 (BS.1770 pre-filter)."""
    b, a = k_weighting_ba(sample_rate)
    state = np.zeros(4)
    out = np.empty(len(x))
    for i, xv in enumerate(np.asarray(x, np.float64)):
        y = b[0] * xv + state[0]
        state[0] = b[1] * xv + state[1] - a[1] * y
        state[1] = b[2] * xv + state[2] - a[2] * y
        state[2] = b[3] * xv + state[3] - a[3] * y
        state[3] = b[4] * xv - a[4] * y
        out[i] = y
    return out


def trailing_means(x: np.ndarray, windows, positions) -> np.ndarray:
    """Mean of x over trailing window W at each position p (samples seen = p)."""
    c = np.concatenate([[0.0], np.cumsum(np.asarray(x, np.float64))])
    out = np.zeros((len(windows), len(positions)))
    for wi, w in enumerate(windows):
        for pi, p in enumerate(positions):
            n = min(p, w)
            out[wi, pi] = (c[p] - c[p - n]) / max(n, 1)
    return out


def true_peak(x: np.ndarray, sample_rate: float) -> float:
    """Sequential polyphase true peak over the whole signal."""
    x = np.asarray(x, np.float32)
    peak = float(np.max(np.abs(x))) if len(x) else 0.0
    if sample_rate >= 192_000.0:
        return peak
    factor = 4 if sample_rate < 96_000.0 else 2
    taps = polyphase_taps(factor)
    d = taps.shape[0]
    hist = np.zeros(d, np.float32)
    for xv in x:
        hist = np.roll(hist, 1)
        hist[0] = xv
        phases = hist @ taps
        peak = max(peak, float(np.max(np.abs(phases))))
    return peak


def lufs(mean_square: float, floor: float = -99.9) -> float:
    """BS.1770: -0.691 + 10*log10(sum of weighted mean squares)."""
    if mean_square <= 0.0:
        return floor
    return max(-0.691 + 10.0 * np.log10(mean_square), floor)


def stft_frames(x: np.ndarray, read_len: int, hop: int) -> list[np.ndarray]:
    """All full windows of ``read_len`` advancing by ``hop`` from sample 0."""
    out = []
    start = 0
    while start + read_len <= len(x):
        out.append(np.asarray(x[start : start + read_len], np.float64))
        start += hop
    return out
