"""File IO: WAV fixtures in, snapshot arrays out."""

from openmeters_tpu.io.wav import read_wav, write_wav  # noqa: F401
