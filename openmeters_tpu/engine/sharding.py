"""Stream-parallel scale-out over an ICI device mesh.

The reference's "distributed layer" is intra-process lock-free rings between
a PipeWire thread and the GUI thread (SURVEY §2.9).  The TPU-native analogue:
streams are embarrassingly parallel, so the whole engine step runs SPMD over
a 1-D ``Mesh`` with every stream-indexed array sharded on that axis — XLA
inserts **zero collectives** in the hot loop; ICI is used only if a future
analyzer wants cross-stream reductions.  Multi-host deployments add more
streams over DCN with no cross-host traffic (pure DP).

Works identically on N real TPU chips and on
``--xla_force_host_platform_device_count=N`` virtual CPU devices (tests).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STREAM_AXIS = "streams"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D stream-parallel mesh over ``n_devices`` (default: all available).

    Raises when fewer than ``n_devices`` devices exist — silently truncating
    would make an "8-way" run a 1-way run without anyone noticing.
    """
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) are available "
                f"(platform={devices[0].platform}); for a virtual mesh set "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N and "
                "JAX_PLATFORMS=cpu before JAX initializes"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (STREAM_AXIS,))


def sharded_step(engine, mesh: Mesh, donate_carry: bool = False):
    """Jit the engine step with explicit stream shardings over ``mesh``.

    Returns ``(step_fn, place_carry)``: ``step_fn(carry, block, meta, reset)``
    with all stream-indexed leaves sharded on ``STREAM_AXIS``; ``place_carry``
    shards an engine carry pytree onto the mesh.  ``donate_carry`` donates
    the carry buffers (serving loops update state in place).
    """
    carry_specs = engine.carry_pspecs(STREAM_AXIS)

    def shard(spec):
        return NamedSharding(mesh, spec)

    carry_sh = jax.tree.map(shard, carry_specs, is_leaf=lambda x: isinstance(x, P))
    block_sh = shard(P(STREAM_AXIS, None, None))
    reset_sh = shard(P(STREAM_AXIS))

    from openmeters_tpu.engine.engine import StreamMeta

    meta_shardings = StreamMeta(
        fold=shard(P(STREAM_AXIS, None, None)), weights=shard(P(STREAM_AXIS, None))
    )

    step = jax.jit(
        lambda carry, block, meta, reset: engine.step(carry, block, meta, reset),
        in_shardings=(carry_sh, block_sh, meta_shardings, reset_sh),
        donate_argnums=(0,) if donate_carry else (),
    )

    def place_carry(carry):
        return jax.device_put(carry, carry_sh)

    return step, place_carry
