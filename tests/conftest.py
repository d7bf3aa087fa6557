"""Test harness: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on ``xla_force_host_platform_device_count=8`` CPU devices, mirroring
how the driver dry-runs the multi-chip path.  Must run before jax imports.
"""

import os

# Hard override: the image pre-sets JAX_PLATFORMS=axon (the tunneled TPU);
# tests must never compile through the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The jaxtyping pytest plugin imports jax before this conftest runs, so the
# env var above can be read too late — force the config directly (the backend
# itself is not initialized until first use, so this still takes effect).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)


def sine_wave(freq: float, rate: float, count: int, amp: float = 1.0) -> np.ndarray:
    """Test fixture signal (mirrors reference util/audio.rs:29-33 semantics)."""
    n = np.arange(count, dtype=np.float32)
    return (np.sin(2.0 * np.pi * freq * n / rate) * amp).astype(np.float32)
