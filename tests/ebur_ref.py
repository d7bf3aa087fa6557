"""Independent BS.1770-4/5 + EBU R128 golden implementation.

Deliberately NOT derived from openmeters_tpu code paths:

- the K-weighting filter uses the *published* ITU-R BS.1770 48 kHz
  coefficient tables verbatim (not this repo's analytic re-derivation) and
  runs through ``scipy.signal.lfilter`` (an external IIR engine) in f64;
- gating blocks, gates, integration and LRA are straight transcriptions of
  the recommendation text (400 ms blocks at 75 % overlap, −70 LUFS absolute
  gate, −10 LU relative gate; EBU Tech 3342: 3 s blocks, −20 LU relative
  gate, LRA = p95 − p10), computed offline over the whole signal with exact
  thresholds — no histograms, no streaming state.

Anchored to ground truth by ``test_loudness_gating.py``'s EBU Tech 3341 /
3342 minimum-compliance cases, whose expected meter readings are published
numbers (±0.1 LU / ±1 LU tolerances from the EBU documents), so this module
and the JAX implementation cannot share a hidden bias.

48 kHz only (the published coefficient table is for 48 kHz; all EBU
fixtures are 48 kHz).
"""

from __future__ import annotations

import numpy as np
from scipy.signal import lfilter

# ITU-R BS.1770 Table 1/2 (pre-filter: high shelf; RLB: high pass), 48 kHz.
SHELF_B = [1.53512485958697, -2.69169618940638, 1.19839281085285]
SHELF_A = [1.0, -1.69065929318241, 0.73248077421585]
HIPASS_B = [1.0, -2.0, 1.0]
HIPASS_A = [1.0, -1.99004745483398, 0.99007225036621]

OFFSET = -0.691
ABS_GATE = -70.0


def k_weight(x: np.ndarray) -> np.ndarray:
    """[n, ch] f64 -> K-weighted, 48 kHz."""
    x = np.asarray(x, np.float64)
    y = lfilter(SHELF_B, SHELF_A, x, axis=0)
    return lfilter(HIPASS_B, HIPASS_A, y, axis=0)


def _block_loudness(kx: np.ndarray, rate: int, block_s: float, step_s: float,
                    weights) -> np.ndarray:
    """Loudness of every full block (block_s window, step_s hop)."""
    n, ch = kx.shape
    if weights is None:
        weights = np.ones(ch)
    step, win = int(round(step_s * rate)), int(round(block_s * rate))
    sq = kx * kx
    csum = np.concatenate([np.zeros((1, ch)), np.cumsum(sq, axis=0)])
    out = []
    start = 0
    while start + win <= n:
        ms = (csum[start + win] - csum[start]) / win  # per-channel mean square
        z = float(np.dot(weights[:ch], ms))
        out.append(OFFSET + 10.0 * np.log10(max(z, 1e-300)))
        start += step
    return np.asarray(out)


def integrated_lufs(x: np.ndarray, rate: int = 48_000, weights=None) -> float:
    """BS.1770-5 gated integrated loudness, exact offline computation."""
    kx = k_weight(x)
    l = _block_loudness(kx, rate, 0.4, 0.1, weights)
    z = 10.0 ** ((l - OFFSET) / 10.0)
    gated = l > ABS_GATE
    if not gated.any():
        return float("-inf")
    gamma_r = OFFSET + 10.0 * np.log10(z[gated].mean()) - 10.0
    keep = gated & (l > gamma_r)
    if not keep.any():
        return float("-inf")
    return OFFSET + 10.0 * np.log10(z[keep].mean())


def loudness_range(x: np.ndarray, rate: int = 48_000, weights=None) -> float:
    """EBU Tech 3342 LRA: gated short-term distribution, p95 − p10."""
    kx = k_weight(x)
    l = _block_loudness(kx, rate, 3.0, 0.1, weights)
    z = 10.0 ** ((l - OFFSET) / 10.0)
    gated = l > ABS_GATE
    if not gated.any():
        return 0.0
    gate = OFFSET + 10.0 * np.log10(z[gated].mean()) - 20.0
    keep = np.sort(l[gated & (l > gate)])
    if keep.size == 0:
        return 0.0
    lo = keep[int(round(0.10 * (keep.size - 1)))]
    hi = keep[int(round(0.95 * (keep.size - 1)))]
    return float(hi - lo)


def sine(freq: float, level_dbfs: float, seconds: float,
         rate: int = 48_000) -> np.ndarray:
    """Stereo 997 Hz-style EBU test tone: ``level_dbfs`` is amplitude dB re
    full-scale sine peak (EBU Tech 3341 convention)."""
    n = int(round(seconds * rate))
    t = np.arange(n, dtype=np.float64) / rate
    a = 10.0 ** (level_dbfs / 20.0)
    mono = a * np.sin(2.0 * np.pi * freq * t)
    return np.stack([mono, mono], axis=-1)
