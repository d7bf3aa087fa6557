"""Perceptual weighting curves: IEC A-weighting and BS.1770 K-weighting.

Reference parity: ``a_weight`` in ``src/visuals/spectrum/processor.rs:410-425``
and ``k_weighting_coefficients`` in ``src/visuals/loudness/processor.rs:22-55``.

All host-side float64 numpy; results enter jitted code as constants.
"""

from __future__ import annotations

import numpy as np


def a_weight_db(freq_hz) -> np.ndarray:
    """IEC 61672-1 A-weighting in dB with the +2.0 dB @1 kHz normalization
    offset used by the reference (spectrum/processor.rs:410-425).

    Accepts scalars or arrays; non-positive frequencies map to -inf.
    """
    f = np.asarray(freq_hz, np.float64)
    c1 = 20.598997**2
    c2 = 107.65265**2
    c3 = 737.86223**2
    c4 = 12194.217**2
    f2 = np.square(f)
    with np.errstate(divide="ignore", invalid="ignore"):
        ra = (c4 * f2 * f2) / (
            (f2 + c1) * np.sqrt((f2 + c2) * (f2 + c3)) * (f2 + c4)
        )
        out = 20.0 * np.log10(ra) + 2.0
    out = np.where(f > 0.0, out, -np.inf)
    return out.astype(np.float32)


# ITU-R BS.1770 pre-filter design constants: the stage-1 high-shelf
# (f0 ~1681.97 Hz, +3.9998 dB, Q ~0.7071) and stage-2 RLB high-pass
# (f0 ~38.135 Hz, Q ~0.5003), re-derived per sample rate via the bilinear
# transform exactly as libebur128 / the reference do
# (loudness/processor.rs:22-55).
_SHELF_F0 = 1681.974450955533
_SHELF_GAIN_DB = 3.999843853973347
_SHELF_Q = 0.7071752369554196
_SHELF_VB_EXP = 0.4996667741545416
_HP_F0 = 38.13547087602444
_HP_Q = 0.5003270373238773


def k_weighting_sos(sample_rate: float) -> np.ndarray:
    """K-weighting as two second-order sections ``[2, 6]`` float64.

    Rows are ``[b0, b1, b2, 1, a1, a2]``: row 0 the high-shelf, row 1 the RLB
    high-pass.  Cascading these is mathematically identical to the reference's
    convolved 5-tap form (and numerically better in float32).
    """
    fs = float(sample_rate)

    k = np.tan(np.pi * _SHELF_F0 / fs)
    vh = 10.0 ** (_SHELF_GAIN_DB / 20.0)
    vb = vh**_SHELF_VB_EXP
    a0 = 1.0 + k / _SHELF_Q + k * k
    shelf = np.array(
        [
            (vh + vb * k / _SHELF_Q + k * k) / a0,
            2.0 * (k * k - vh) / a0,
            (vh - vb * k / _SHELF_Q + k * k) / a0,
            1.0,
            2.0 * (k * k - 1.0) / a0,
            (1.0 - k / _SHELF_Q + k * k) / a0,
        ]
    )

    k = np.tan(np.pi * _HP_F0 / fs)
    a0 = 1.0 + k / _HP_Q + k * k
    hp = np.array(
        [
            1.0,
            -2.0,
            1.0,
            1.0,
            2.0 * (k * k - 1.0) / a0,
            (1.0 - k / _HP_Q + k * k) / a0,
        ]
    )
    return np.stack([shelf, hp])


def k_weighting_ba(sample_rate: float) -> tuple[np.ndarray, np.ndarray]:
    """Convolved single 5-tap form ``(b[5], a[5])`` float64, matching the
    reference's ``KWeighting`` layout (loudness/processor.rs:20,45-54)."""
    sos = k_weighting_sos(sample_rate)
    b = np.convolve(sos[0, :3], sos[1, :3])
    a = np.convolve(sos[0, 3:], sos[1, 3:])
    return b, a
