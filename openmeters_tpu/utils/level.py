"""dB/power conversions and sanitization.

Reference parity: ``src/util/audio/level.rs`` and ``src/util/audio/rate.rs``.
These are used both host-side (numpy scalars) and on-device (jnp arrays);
every function is dtype-polymorphic and jit-safe.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

DB_FLOOR = -140.0  # reference level.rs:4
# 10 / ln(10) at f32 precision (reference level.rs:5 stores 4.342_944_8f32).
LN_TO_DB = 4.3429448
DEFAULT_SAMPLE_RATE = 48_000.0  # reference rate.rs:6
MAX_SAMPLE_RATE = 768_000.0  # reference rate.rs:7

# Denormal-flush thresholds: stop recursive filter state well below audibility
# but before it becomes subnormal (reference level.rs:8-18).
FLUSH_F32 = 1.0e-20
FLUSH_F64 = 1.0e-30


def power_to_db(power, floor=DB_FLOOR):
    """``10*log10(power)`` clamped to ``floor``; non-positive power -> floor.

    Matches reference ``power_to_db`` (level.rs:29-35): computed as
    ``ln(power) * LN_TO_DB`` so the same rounding applies.
    """
    db = jnp.where(power > 0.0, jnp.log(jnp.maximum(power, 1e-45)) * LN_TO_DB, floor)
    return jnp.maximum(jnp.where(power > 0.0, db, floor), floor)


def db_to_power(db):
    """Inverse of :func:`power_to_db` via exp2 (reference level.rs:37-40)."""
    db_to_log2 = 0.1 * math.log2(10.0)
    return jnp.exp2(db * db_to_log2)


def db_to_power_host(db: float) -> float:
    """Host-side scalar variant for static (trace-time) config math — jnp ops
    inside a jit trace are always traced, so static constants must use this."""
    return float(2.0 ** (float(db) * 0.1 * math.log2(10.0)))


def flush_denormal(x, threshold: float = FLUSH_F32):
    """Zero values with magnitude below ``threshold`` (reference level.rs:8-18)."""
    return jnp.where(jnp.abs(x) < threshold, jnp.zeros_like(x), x)


def sanitize_negative_db(db: float, default: float) -> float:
    """Finite negative dB or ``default`` (reference level.rs:20-27). Host-side."""
    return db if math.isfinite(db) and db < 0.0 else default


def sanitize_sample_rate(sample_rate: float) -> float:
    """Finite positive rate clamped to [1, 768k] (reference rate.rs:9-13). Host-side."""
    if not (isinstance(sample_rate, (int, float)) and math.isfinite(sample_rate) and sample_rate > 0.0):
        return DEFAULT_SAMPLE_RATE
    return min(max(float(sample_rate), 1.0), MAX_SAMPLE_RATE)
