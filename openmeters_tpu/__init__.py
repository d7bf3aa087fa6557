"""openmeters_tpu — a TPU-native streaming audio-analysis framework.

A ground-up JAX/XLA/Pallas rebuild of the analysis core of OpenMeters
(reference: /root/reference, v1.12.1, Rust).  Where the reference analyzes one
desktop audio stream on a CPU, this framework analyzes a *batch* of thousands
of concurrent streams on TPU chips: every analyzer is a pure function
``(carry, block) -> (carry, snapshot)`` over ``[n_streams, ...]`` arrays, the
engine scans it over hops, and streams shard data-parallel over an ICI mesh.

Subsystem map (reference parity noted per module):

- ``utils``      — windows, dB/power, A/K-weighting, channel layouts
                   (reference ``src/util/audio/*``, ``src/dsp.rs``)
- ``ops``        — batched DSP primitives: biquad scans, windowed means,
                   polyphase FIR true peak, STFT/reassignment, NSDF
- ``analyzers``  — loudness, spectrogram, spectrum, oscilloscope,
                   stereometer, waveform (reference ``src/visuals/*/processor.rs``)
- ``engine``     — hop scheduler, stream carries, shard_map scale-out
                   (reference ``src/meter.rs``, ``src/visuals/registry.rs``)
- ``ingest``     — host-side transport: span timeline, batcher, ring buffers
                   (reference ``src/infra/pipewire/transport.rs``)
"""

__version__ = "0.1.0"

from openmeters_tpu.utils.level import DB_FLOOR, db_to_power, power_to_db  # noqa: F401
from openmeters_tpu.utils.windows import WindowKind  # noqa: F401
from openmeters_tpu.utils.channels import Channel, ChannelPosition  # noqa: F401
