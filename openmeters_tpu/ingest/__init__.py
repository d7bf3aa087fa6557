"""L5 host ingest: native transport + batch assembly (ctypes over C++).

Reference parity: ``src/infra/pipewire/transport.rs`` semantics (span
timeline, silence synthesis, fault epochs, backlog cap) and ``src/meter.rs``
batching, re-targeted at feeding fixed ``[n_streams, block, channels]``
device batches.  The capture *source* (PipeWire itself) is out of scope per
BASELINE; any producer — sockets, files, shared memory — pushes PCM through
:class:`Transport`.
"""

from openmeters_tpu.ingest.transport import Feeder, Transport  # noqa: F401
