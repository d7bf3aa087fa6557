"""L0 numerics: levels, windows, channel semantics, weighting curves.

Reference parity: ``src/util/audio/`` and the format/layout half of
``src/dsp.rs`` in the OpenMeters reference.
"""

from openmeters_tpu.utils.level import (  # noqa: F401
    DB_FLOOR,
    LN_TO_DB,
    DEFAULT_SAMPLE_RATE,
    MAX_SAMPLE_RATE,
    db_to_power,
    power_to_db,
    flush_denormal,
    sanitize_negative_db,
    sanitize_sample_rate,
)
from openmeters_tpu.utils.windows import (  # noqa: F401
    WindowKind,
    window_coefficients,
    fft_bin_normalization,
)
from openmeters_tpu.utils.channels import (  # noqa: F401
    MAX_AUDIO_CHANNELS,
    Channel,
    ChannelPosition,
    channel_fallback,
    normalize_positions,
    stereo_matrix,
    channel_weights,
    projection_vector,
)
from openmeters_tpu.utils.weighting import (  # noqa: F401
    a_weight_db,
    k_weighting_ba,
    k_weighting_sos,
)
from openmeters_tpu.utils.frequency import FrequencyScale  # noqa: F401
from openmeters_tpu.utils.musical import MusicalNote, NoteInfo  # noqa: F401

BAND_SPLITS_HZ = (200.0, 2000.0)  # reference src/util/audio.rs:26
