"""Streaming hop/window frame extraction with fixed-capacity outputs.

Reference parity: the deque-buffer + hop bookkeeping shared by the
spectrogram and spectrum processors (``spectrogram/processor.rs:281-437``,
``spectrum/processor.rs:179-298``): a window of ``read_len`` samples is ready
whenever the buffer holds at least that many; each emitted window advances
the timeline by ``hop`` samples; hops larger than the buffer produce a
pending-skip debt so output is block-partition independent.

TPU formulation: a right-aligned ring ``[lanes, read_len + B]`` shifted left
by exactly ``B`` every step (static slice — no per-lane pointers in the data
layout), plus a per-lane signed ``avail`` counter.  ``avail`` < 0 encodes the
reference's ``pending_skip_samples``.  Because each step ingests a fixed
``B`` frames, at most ``cols_cap = (B-1)//hop + 1`` windows become ready per
step, so outputs are a fixed ``[lanes, cols_cap, read_len]`` gather plus a
validity mask — the TPU-native replacement for the reference's dynamic
``Vec<SpectrogramColumn>``.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FrameBuffer:
    read_len: int  # samples per analysis window (fft or hilbert length)
    hop: int
    block: int  # engine ingest frames per step (B)

    @property
    def cols_cap(self) -> int:
        return (self.block - 1) // self.hop + 1

    @property
    def ring_len(self) -> int:
        return self.read_len + self.block

    def init(self, lanes: int) -> dict:
        return {
            "buf": jnp.zeros((lanes, self.ring_len), jnp.float32),
            "avail": jnp.zeros((lanes,), jnp.int32),
        }

    def push(self, carry: dict, block, reset_mask=None):
        """Ingest ``[lanes, B]`` samples; emit ready windows.

        Returns ``(new_carry, frames [lanes, cols_cap, read_len],
        valid [lanes, cols_cap])``.  Invalid slots repeat the last valid
        window (callers mask).  ``reset_mask`` restarts those lanes' timelines
        (reference ``reset_audio``: buffer cleared, skip debt dropped).
        """
        b = self.block
        assert block.shape[-1] == b
        avail = carry["avail"]
        if reset_mask is not None:
            avail = jnp.where(reset_mask, 0, avail)

        buf = jnp.concatenate([carry["buf"][:, b:], block], axis=-1)
        avail_p = jnp.minimum(avail + b, self.ring_len)

        ready = jnp.where(
            avail_p >= self.read_len,
            (avail_p - self.read_len) // self.hop + 1,
            0,
        )
        ready = jnp.minimum(ready, self.cols_cap)

        # Window k (k = 0 oldest this step) starts at buffer index
        # ring_len - avail_p + k*hop and spans read_len samples.
        k = jnp.arange(self.cols_cap, dtype=jnp.int32)
        k_eff = jnp.minimum(k[None, :], jnp.maximum(ready - 1, 0)[:, None])
        starts = (self.ring_len - avail_p)[:, None] + k_eff * self.hop  # [lanes, cap]
        offs = jnp.arange(self.read_len, dtype=jnp.int32)
        idx = starts[:, :, None] + offs[None, None, :]
        frames = jnp.take_along_axis(
            buf[:, None, :], idx, axis=-1
        )  # [lanes, cap, read_len]
        valid = k[None, :] < ready[:, None]

        new_carry = {"buf": buf, "avail": avail_p - ready * self.hop}
        return new_carry, frames, valid
