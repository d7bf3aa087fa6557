"""FFT analysis windows and bin normalization.

Reference parity: ``src/util/audio/window.rs``.  Windows are *periodic*
(DFT-even): the cosine-sum phase step is ``2*pi/len`` rather than
``2*pi/(len-1)`` (reference window.rs:20-43, test window.rs:116-122).

Everything here is host-side numpy: window tables are static per analyzer
config and enter jitted code as constants, so XLA folds them.
"""

from __future__ import annotations

import enum
import functools

import numpy as np


class WindowKind(enum.Enum):
    """Cosine-sum window family (reference window.rs:9-18)."""

    RECTANGULAR = "rectangular"
    HANN = "hann"
    HAMMING = "hamming"
    BLACKMAN = "blackman"
    BLACKMAN_HARRIS = "blackman_harris"

    @property
    def cosine_coefficients(self) -> tuple[float, ...]:
        # reference window.rs:25-31
        return {
            WindowKind.RECTANGULAR: (1.0,),
            WindowKind.HANN: (0.5, -0.5),
            WindowKind.HAMMING: (25.0 / 46.0, -21.0 / 46.0),
            WindowKind.BLACKMAN: (0.42, -0.5, 0.08),
            WindowKind.BLACKMAN_HARRIS: (0.35875, -0.48829, 0.14128, -0.01168),
        }[self]


@functools.lru_cache(maxsize=None)
def window_coefficients(kind: WindowKind, length: int) -> np.ndarray:
    """Periodic cosine-sum window of ``length`` samples, float32.

    Matches reference ``WindowKind::coefficients`` (window.rs:21-43): lengths
    <= 1 are all-ones; phase step ``tau/len`` (periodic).
    """
    if length <= 0:
        return np.zeros((0,), np.float32)
    if length == 1 or kind is WindowKind.RECTANGULAR:
        return np.ones((length,), np.float32)
    n = np.arange(length, dtype=np.float64)
    phi = n * (2.0 * np.pi / length)
    out = np.zeros((length,), np.float64)
    for k, c in enumerate(kind.cosine_coefficients):
        out += c * np.cos(phi * k)
    return out.astype(np.float32)


def fft_bin_normalization(window: np.ndarray, fft_size: int) -> np.ndarray:
    """Coherent-gain power normalization per one-sided rFFT bin.

    DC and Nyquist bins scale by ``(1/sum(w))^2``; AC bins by ``4x`` that
    (one-sided spectrum).  Matches reference
    ``compute_fft_bin_normalization`` (window.rs:90-109) including the
    zero-sum fallback.
    """
    bins = fft_size // 2 + 1
    wsum = float(np.sum(window, dtype=np.float32))
    if abs(wsum) > np.finfo(np.float32).eps:
        inv = 1.0 / wsum
    elif fft_size > 0:
        inv = 1.0 / fft_size
    else:
        inv = 0.0
    dc = np.float32(inv) * np.float32(inv)
    norms = np.full((bins,), 4.0 * dc, np.float32)
    norms[0] = dc
    if fft_size % 2 == 0 and bins > 1:
        norms[-1] = dc
    return norms


def dc_removed_windowed(frames, window):
    """Subtract each frame's mean then apply ``window``; jnp-traceable.

    ``frames``: ``[..., len]``; ``window``: ``[len]``.  One-pass analogue of
    reference ``copy_dc_removed_windowed_from_deque`` (window.rs:65-88).
    """
    import jax.numpy as jnp

    mean = jnp.mean(frames, axis=-1, keepdims=True)
    return (frames - mean) * window
