"""Trailing-window running means over streaming blocks, drift-free.

Reference parity: ``WindowedMeans`` / ``CompensatedPair`` in
``src/dsp.rs:264-371`` — Kahan-Babuska-Neumaier compensated running means over
multiple window lengths sharing one sample ring.

TPU formulation: the reference pushes per-sample into f64 compensated sums
and periodically refreshes dual accumulators to kill drift.  Here samples
arrive in fixed ``block_frames`` blocks and means are only read at block
boundaries (exactly how the loudness processor consumes them), so we keep a
ring of **per-block sums** plus, per window, a ring of **suffix sums of the
last ``W mod B`` samples** of each block.  A trailing window of ``W`` samples
ending on a block boundary is then ``q = W // B`` whole-block sums plus one
stored suffix — recomputed fresh from the ring on every query, so there is
*zero* accumulation drift (stronger than Kahan), in float32, at a few hundred
FLOPs per lane.

Warmup and the reference's lazy-silence seeding (``with_leading_zeros``,
dsp.rs:359-365) reduce to a per-lane ``blocks`` counter: the mean divisor is
``clamp(blocks * B, 1, W)`` and ring slots older than the counter are masked
out, which also makes per-lane resets free (no ring zeroing).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BlockWindowedMeans:
    """Static config: query means of pushed values over trailing windows.

    Args:
      block_frames: samples per pushed block (engine hop), ``B``.
      window_lengths: trailing window sizes in samples, one per window.
    """

    block_frames: int
    window_lengths: tuple[int, ...]
    dtype: object = jnp.float32

    @property
    def _qr(self):
        b = self.block_frames
        return tuple((max(w, 1) // b, max(w, 1) % b) for w in self.window_lengths)

    @property
    def ring_blocks(self) -> int:
        return max(q + 1 for q, _ in self._qr)

    def init(self, lane_shape: tuple[int, ...]) -> dict:
        k = self.ring_blocks
        nw = len(self.window_lengths)
        return {
            "totals": jnp.zeros((k, *lane_shape), self.dtype),
            "suffix": jnp.zeros((nw, k, *lane_shape), self.dtype),
            "head": jnp.zeros((), jnp.int32),
            "blocks": jnp.zeros(lane_shape, jnp.int32),
        }

    def push_block(self, carry: dict, values, reset_mask=None) -> dict:
        """Push one ``[B, lanes...]`` block of values.

        Non-finite values are sanitized to 0 (reference dsp.rs:324-333).
        ``reset_mask`` (``[lanes...]`` bool) restarts those lanes' windows as
        if freshly constructed.
        """
        b = self.block_frames
        assert values.shape[0] == b
        values = jnp.where(jnp.isfinite(values), values, 0.0).astype(self.dtype)

        blocks = carry["blocks"]
        if reset_mask is not None:
            blocks = jnp.where(reset_mask, 0, blocks)

        slot = carry["head"] % self.ring_blocks
        total = jnp.sum(values, axis=0)
        suffixes = jnp.stack(
            [
                jnp.sum(values[b - r :], axis=0) if r > 0 else jnp.zeros_like(total)
                for _, r in self._qr
            ]
        )
        return {
            "totals": carry["totals"].at[slot].set(total),
            "suffix": carry["suffix"].at[:, slot].set(suffixes),
            "head": carry["head"] + 1,
            "blocks": jnp.minimum(blocks + 1, jnp.int32(2**30)),
        }

    def means(self, carry: dict):
        """Current trailing means, ``[n_windows, lanes...]``.

        Divisor is ``max(1, min(samples_pushed, W))`` matching reference
        ``WindowedMeans::mean`` (dsp.rs:367-371).
        """
        k = self.ring_blocks
        b = self.block_frames
        lane_nd = carry["blocks"].ndim
        # age of slot s: how many pushes ago it was written (0 = newest).
        ages = (carry["head"] - 1 - jnp.arange(k, dtype=jnp.int32)) % k
        ages = ages.reshape((k,) + (1,) * lane_nd)
        blocks = carry["blocks"][None]  # [1, lanes...]

        out = []
        for w_idx, (q, r) in enumerate(self._qr):
            full = (ages < q) & (ages < blocks)
            total = jnp.sum(jnp.where(full, carry["totals"], 0.0), axis=0)
            if r > 0:
                pick = (ages == q) & (blocks > q)
                total = total + jnp.sum(
                    jnp.where(pick, carry["suffix"][w_idx], 0.0), axis=0
                )
            count = jnp.clip(
                carry["blocks"].astype(self.dtype) * b,
                1.0,
                float(max(self.window_lengths[w_idx], 1)),
            )
            out.append(total / count)
        return jnp.stack(out)
