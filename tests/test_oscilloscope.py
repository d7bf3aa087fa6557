"""Oscilloscope tests (reference oscilloscope/processor.rs tests)."""

import numpy as np
import pytest

from openmeters_tpu.analyzers.oscilloscope import (
    OscilloscopeAnalyzer,
    OscilloscopeConfig,
    TriggerMode,
)
from openmeters_tpu.utils.channels import Channel

RATE = 48_000.0
BLOCK = 1024
TAU = 2.0 * np.pi


def stable_config(**kw):
    return OscilloscopeConfig(
        sample_rate=RATE,
        segment_duration=0.02,
        trigger_mode=TriggerMode.STABLE,
        block_frames=BLOCK,
        **kw,
    )


def periodic(freq, frames, f):
    return np.asarray(
        [f(freq * n / RATE) for n in range(frames)], np.float32
    )


def sine(freq, frames):
    n = np.arange(frames, dtype=np.float32)
    return np.sin(TAU * freq * n / RATE).astype(np.float32)


def noise(frames):
    seed = 1
    out = np.empty(frames, np.float32)
    for i in range(frames):
        seed = (seed * 1_664_525 + 1_013_904_223) & 0xFFFFFFFF
        out[i] = (seed / 0xFFFFFFFF) * 2.0 - 1.0
    return out


def feed(ana, carry, signal, mono=True):
    """Feed mono signal block-by-block; return (carry, snapshots list)."""
    snaps = []
    nb = len(signal) // BLOCK
    for i in range(nb):
        blk = signal[i * BLOCK : (i + 1) * BLOCK]
        stereo = np.stack([blk, blk], axis=-1)[None]
        carry, snap = ana.step(carry, stereo)
        snaps.append(snap)
    return carry, snaps


def detected_rate(snap):
    p = float(snap.period[0, 0])
    return RATE / p if p > 0 else None


def test_sliding_probe_spectrum_matches_exact(monkeypatch):
    """Per-hop triggering slides the NSDF probe spectrum; captures must
    match the exact per-hop rfft path through locks, a frequency switch,
    and a mid-run reset (drift is re-anchored every PROBE_REFRESH hops)."""
    cfg = stable_config(trigger_every=1)
    ana = OscilloscopeAnalyzer(cfg)
    assert ana.slides_probe

    sig = np.concatenate(
        [sine(220.0, BLOCK * 14), sine(311.0, BLOCK * 14)]
    ) * 0.5
    blocks = sig.reshape(-1, BLOCK)
    resets = np.zeros((len(blocks), 1), bool)
    resets[17, 0] = True

    def run(analyzer, exact: bool):
        if exact:
            monkeypatch.setattr(
                OscilloscopeAnalyzer, "slides_probe", property(lambda s: False)
            )
        else:
            monkeypatch.undo()
        carry = analyzer.init(1)
        out = []
        step = analyzer.step.__wrapped__  # unjitted: avoid cache aliasing
        for i, blk in enumerate(blocks):
            stereo = np.stack([blk, blk], axis=-1)[None]
            carry, snap = step(analyzer, carry, stereo, resets[i])
            out.append(snap)
        return out

    slid = run(ana, exact=False)
    base = run(ana, exact=True)
    for i, (a, b) in enumerate(zip(slid, base)):
        assert bool(a.locked[0, 0]) == bool(b.locked[0, 0]), i
        np.testing.assert_allclose(
            np.asarray(a.period), np.asarray(b.period), atol=0.05, err_msg=str(i)
        )
        np.testing.assert_allclose(
            np.asarray(a.span), np.asarray(b.span), atol=0.1, err_msg=str(i)
        )
        assert abs(int(a.start[0, 0]) - int(b.start[0, 0])) <= 1, i
        np.testing.assert_allclose(
            np.asarray(a.samples), np.asarray(b.samples), atol=1e-5, err_msg=str(i)
        )


def test_period_estimation_across_waveforms():
    # reference processor.rs:957-995
    ana = OscilloscopeAnalyzer(stable_config())
    long = int(RATE * 0.1)

    for freq, wave in [
        (41.0, lambda c: np.sin(TAU * c)),
        (110.0, lambda c: np.sin(TAU * c)),
        (440.0, lambda c: np.sin(TAU * c)),
        (1000.0, lambda c: np.sin(TAU * c)),
        (4000.0, lambda c: np.sin(TAU * c)),
        (110.0, lambda c: 2.0 * (c % 1.0) - 1.0),  # saw
        (440.0, lambda c: 1.0 if (c % 1.0) < 0.5 else -1.0),  # square
        (440.0, lambda c: np.sin(TAU * c) + 2.0 * np.sin(TAU * 2 * c)),
    ]:
        probe = periodic(freq, long, wave)[None, :]
        est = ana._estimate_period(probe)
        assert bool(est["detected"][0]), freq
        det = RATE / float(est["period"][0])
        assert abs(det - freq) / freq < 0.03, f"{freq}: got {det}"
        assert float(est["confidence"][0]) >= 0.5

    est = ana._estimate_period(noise(long)[None, :])
    assert not bool(est["detected"][0])


def test_lock_acquisition_on_clean_sine():
    # reference processor.rs:1196-1206
    ana = OscilloscopeAnalyzer(stable_config())
    carry = ana.init(1)
    carry, snaps = feed(ana, carry, sine(440.0, BLOCK * 20))
    locked_at = next((i for i, s in enumerate(snaps) if bool(s.locked[0, 0])), None)
    assert locked_at is not None and locked_at <= 10
    det = detected_rate(snaps[-1])
    assert det is not None and abs(det - 440.0) < 20.0


def test_cycle_rate_adapts_to_frequency_switch():
    # reference processor.rs:1208-1227
    ana = OscilloscopeAnalyzer(stable_config())
    carry = ana.init(1)
    warm = sine(440.0, BLOCK * 20)
    carry, snaps = feed(ana, carry, warm)
    pre = detected_rate(snaps[-1])
    assert pre is not None and abs(pre - 440.0) < 20.0
    # phase-continuous switch to 880
    t0 = len(warm) / RATE
    phase0 = TAU * 440.0 * t0
    n = np.arange(BLOCK * 20, dtype=np.float32)
    after = np.sin(phase0 + TAU * 880.0 * n / RATE).astype(np.float32)
    carry, snaps = feed(ana, carry, after)
    ok = [
        i
        for i, s in enumerate(snaps)
        if (r := detected_rate(s)) is not None and abs(r - 880.0) < 50.0
    ]
    assert ok and ok[0] <= 10


def test_silence_has_no_lock_then_onset_locks():
    # reference processor.rs:1229-1245
    ana = OscilloscopeAnalyzer(stable_config())
    carry = ana.init(1)
    carry, snaps = feed(ana, carry, np.zeros(BLOCK * 10, np.float32))
    assert not any(bool(s.locked[0, 0]) for s in snaps)
    carry, snaps = feed(ana, carry, sine(440.0, BLOCK * 20))
    locked_at = next((i for i, s in enumerate(snaps) if bool(s.locked[0, 0])), None)
    assert locked_at is not None and locked_at <= 10


def test_aperiodic_holdover_is_bounded():
    # reference processor.rs:1155-1177
    ana = OscilloscopeAnalyzer(stable_config())
    carry = ana.init(1)
    carry, snaps = feed(ana, carry, sine(440.0, BLOCK * 20))
    assert bool(snaps[-1].locked[0, 0])
    nz = noise(BLOCK * 20)
    carry, snaps = feed(ana, carry, nz[:BLOCK])
    assert bool(snaps[-1].locked[0, 0]), "brief aperiodic input should hold lock"
    carry, snaps = feed(ana, carry, nz[BLOCK:])
    released = next((i for i, s in enumerate(snaps) if not bool(s.locked[0, 0])), None)
    assert released is not None and released <= 8


@pytest.mark.parametrize(
    "name,wave",
    [
        ("sine", lambda c: np.sin(TAU * c)),
        (
            "biased_am",
            lambda c: (0.6 + 0.4 * np.sin(TAU * c / 37.0)) * np.sin(TAU * c) + 0.25,
        ),
        ("saw", lambda c: 2.0 * (c % 1.0) - 1.0),
        ("square", lambda c: 1.0 if (c % 1.0) < 0.5 else -1.0),
    ],
)
def test_stable_trigger_limits_phase_jitter(name, wave):
    # reference processor.rs:998-1019: jitter < 3 samples @440 Hz
    ana = OscilloscopeAnalyzer(stable_config())
    carry = ana.init(1)
    signal = periodic(440.0, BLOCK * 60, wave)
    period = RATE / 440.0
    first = None
    jitter = 0.0
    for i in range(60):
        blk = signal[i * BLOCK : (i + 1) * BLOCK]
        stereo = np.stack([blk, blk], axis=-1)[None]
        carry, snap = ana.step(carry, stereo)
        # warmup covers template-EMA convergence plus one frame-clock
        # period: captures are extracted at display cadence
        # (snapshot_every), so the first measured capture can be up to
        # snapshot_every-1 hops older than the lock check
        if 24 <= i < 60 and bool(snap.locked[0, 0]):
            # absolute capture position = samples consumed so far - hist + start
            consumed = (i + 1) * BLOCK
            pos = (
                consumed
                - ana.history_frames
                + float(snap.start[0, 0])
                + float(snap.frac[0, 0])
            )
            if first is None:
                first = pos
            delta = (pos - first + period * 0.5) % period - period * 0.5
            jitter = max(jitter, abs(delta))
    assert first is not None, "trigger never locked"
    assert jitter < 3.0, f"{name} jitter was {jitter:.3f} samples"


def test_zero_crossing_edges_near_zero():
    # reference processor.rs:1113-1138
    cfg = OscilloscopeConfig(
        sample_rate=RATE,
        segment_duration=0.01,
        trigger_mode=TriggerMode.ZERO_CROSSING,
        channel_1=Channel.LEFT,
        channel_2=Channel.RIGHT,
        block_frames=4800,
    )
    ana = OscilloscopeAnalyzer(cfg)
    carry = ana.init(1)
    mono = sine(440.0, 4800)
    stereo = np.stack([mono, mono], axis=-1)[None]
    carry, snap = ana.step(carry, stereo)
    assert bool(snap.trace_valid[0, 0]) and bool(snap.trace_valid[0, 1])
    from openmeters_tpu.views import resample_trace

    trace = resample_trace(
        np.asarray(snap.samples)[0, 0], float(snap.span[0, 0]), float(snap.frac[0, 0])
    )
    assert 0.0 < trace[0] < 0.15, "left edge should sit just after a rising zero"
    assert abs(trace[-1]) < 0.15, "right edge should end near a zero"


def test_linked_trigger_preserves_inverted_stereo_phase():
    # reference processor.rs:1180-1193
    cfg = stable_config(
        trigger_source=Channel.LEFT, channel_1=Channel.LEFT, channel_2=Channel.RIGHT
    )
    ana = OscilloscopeAnalyzer(cfg)
    carry = ana.init(1)
    mono = sine(440.0, BLOCK * 20)
    snap = None
    for i in range(20):
        blk = mono[i * BLOCK : (i + 1) * BLOCK]
        stereo = np.stack([blk, -blk], axis=-1)[None]
        carry, snap = ana.step(carry, stereo)
    assert bool(snap.locked[0, 0])
    det = detected_rate(snap)
    assert det is not None and abs(det - 440.0) < 20.0
    from openmeters_tpu.views import resample_trace

    span, frac = float(snap.span[0, 0]), float(snap.frac[0, 0])
    a = resample_trace(np.asarray(snap.samples)[0, 0], span, frac)
    b = resample_trace(np.asarray(snap.samples)[0, 1], span, frac)
    corr = float(np.dot(a, b) / np.sqrt(np.dot(a, a) * np.dot(b, b)))
    assert corr < -0.9, f"linked trigger should preserve inverted phase, got {corr}"


def test_reset_clears_lock():
    ana = OscilloscopeAnalyzer(stable_config())
    carry = ana.init(1)
    carry, snaps = feed(ana, carry, sine(440.0, BLOCK * 20))
    assert bool(snaps[-1].locked[0, 0])
    blk = np.zeros((1, BLOCK, 2), np.float32)
    carry, snap = ana.step(carry, blk, reset_mask=np.array([True]))
    assert not bool(snap.locked[0, 0])
    # post-reset history is cleared: the fallback capture sees pure silence
    assert np.all(np.asarray(snap.samples)[0] == 0.0)


def test_independent_triggers_without_source():
    """With no trigger source each active trace runs its own trigger
    (reference processor.rs:684-700): L and R carrying different
    frequencies both lock, each to its own period."""
    cfg = stable_config(
        trigger_source=Channel.NONE,
        channel_1=Channel.LEFT,
        channel_2=Channel.RIGHT,
    )
    ana = OscilloscopeAnalyzer(cfg)
    assert ana.independent_triggers and ana.n_trig == 2

    frames = BLOCK * 40
    left = sine(220.0, frames)
    right = sine(347.0, frames)
    carry = ana.init(1)
    snap = None
    for i in range(frames // BLOCK):
        stereo = np.stack(
            [left[i * BLOCK : (i + 1) * BLOCK], right[i * BLOCK : (i + 1) * BLOCK]],
            axis=-1,
        )[None]
        carry, snap = ana.step(carry, stereo)

    locked = np.asarray(snap.locked)[0]
    period = np.asarray(snap.period)[0]
    assert locked[0] and locked[1], locked
    assert abs(period[0] - RATE / 220.0) < 2.0, period
    assert abs(period[1] - RATE / 347.0) < 2.0, period
    # each trace is aligned by its own capture, so starts differ in general
    assert np.asarray(snap.trace_valid)[0].all()


def test_linked_trigger_shares_one_capture():
    """A matching trigger source yields one linked capture shared by both
    traces: identical span/start/frac across trace slots."""
    cfg = stable_config(
        trigger_source=Channel.LEFT,
        channel_1=Channel.LEFT,
        channel_2=Channel.RIGHT,
    )
    ana = OscilloscopeAnalyzer(cfg)
    assert not ana.independent_triggers and ana.n_trig == 1

    carry, snaps = feed(ana, ana.init(1), sine(220.0, BLOCK * 30))
    snap = snaps[-1]
    assert bool(np.asarray(snap.locked)[0, 0])
    np.testing.assert_array_equal(np.asarray(snap.span)[0, 0], np.asarray(snap.span)[0, 1])
    np.testing.assert_array_equal(np.asarray(snap.start)[0, 0], np.asarray(snap.start)[0, 1])


def test_continuous_glide_keeps_lock_and_tracks():
    """Pitch GLIDE — the worst case for the centered template store: the
    reference lerp-resamples its template continuously
    (processor.rs:249-263,486-498) while this rebuild drops it on
    >1-semitone jumps.  On a continuous 220→880 Hz exponential sweep
    (2 octaves over 2 s, ~0.26 semitone per hop) the 0.5-responsiveness
    ref_period EMA must keep the drop clause from ever firing: the lock
    must hold essentially continuously and the detected rate must track
    the instantaneous frequency."""
    ana = OscilloscopeAnalyzer(stable_config())
    carry = ana.init(1)
    carry, _ = feed(ana, carry, sine(220.0, BLOCK * 15))  # acquire

    dur_s = 2.0
    frames = int(dur_s * RATE) // BLOCK * BLOCK
    t = np.arange(frames, dtype=np.float64) / RATE
    f0, octaves = 220.0, 2.0
    k = octaves * np.log(2.0) / dur_s  # f(t) = f0 * e^{k t}
    phase = TAU * f0 * (np.exp(k * t) - 1.0) / k
    sweep = np.sin(phase).astype(np.float32)
    carry, snaps = feed(ana, carry, sweep)

    inst_f = f0 * np.exp(k * (np.arange(len(snaps)) + 1) * BLOCK / RATE)
    unlocked_run = max_run = 0
    tracked = 0
    for i, s in enumerate(snaps):
        if bool(s.locked[0, 0]):
            unlocked_run = 0
            r = detected_rate(s)
            # within ~1.3 semitones of the instantaneous frequency
            # (EMA smoothing lags a 1-octave/s glide by a few hops)
            if r is not None and abs(np.log2(r / inst_f[i])) < 0.11:
                tracked += 1
        else:
            unlocked_run += 1
            max_run = max(max_run, unlocked_run)
    n = len(snaps)
    locked_frac = sum(bool(s.locked[0, 0]) for s in snaps) / n
    assert locked_frac > 0.95, locked_frac
    # bounded re-lock: a template drop costs at most ~2 hops
    assert max_run <= 2, max_run
    assert tracked / n > 0.9, (tracked, n)


def test_external_capture_matches_in_step_extraction():
    """snapshot_every=0 (the serving engine's mode): the hop step maintains
    capture metadata only; extract() at any later point returns exactly the
    snapshot the in-step per-hop extraction (snapshot_every=1) would have
    produced for the same audio."""
    import dataclasses

    import jax

    base = OscilloscopeConfig(trigger_every=1, snapshot_every=1)
    ana_in = OscilloscopeAnalyzer(base)
    ana_ext = OscilloscopeAnalyzer(dataclasses.replace(base, snapshot_every=0))
    assert ana_ext.external_capture and not ana_in.external_capture

    rate, b = 48_000.0, 256
    t = np.arange(40 * b) / rate
    sig = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    stereo = np.stack([sig, sig], -1)

    c_in, c_ext = ana_in.init(2), ana_ext.init(2)
    step_in, step_ext = jax.jit(ana_in.step), jax.jit(ana_ext.step)
    for i in range(40):
        blk = np.tile(stereo[None, i * b : (i + 1) * b], (2, 1, 1))
        c_in, s_in = step_in(c_in, blk)
        c_ext, s_ext = step_ext(c_ext, blk)
        # per-hop metadata identical; external emits no bulk samples
        assert s_ext.samples.shape == (2, 2, 0)
        np.testing.assert_array_equal(np.asarray(s_in.start), np.asarray(s_ext.start))
        np.testing.assert_array_equal(np.asarray(s_in.locked), np.asarray(s_ext.locked))
    snap = ana_ext.extract(c_ext)
    np.testing.assert_array_equal(np.asarray(snap.samples), np.asarray(s_in.samples))
    for f in ("trace_valid", "span", "start", "frac", "period", "locked"):
        np.testing.assert_array_equal(
            np.asarray(getattr(snap, f)), np.asarray(getattr(s_in, f)), err_msg=f
        )
    assert bool(np.asarray(snap.locked).any())


def test_external_capture_trigger_cadence_ages_start():
    """trigger_every>1 in external mode: held capture metadata ages its
    start by one block per hop (the window slides), matching the in-step
    held-snapshot path."""
    import dataclasses

    import jax

    cfg = OscilloscopeConfig(trigger_every=3, snapshot_every=0)
    ana = OscilloscopeAnalyzer(cfg)
    rate, b = 48_000.0, 256
    t = np.arange(24 * b) / rate
    sig = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    stereo = np.stack([sig, sig], -1)
    carry = ana.init(1)
    step = jax.jit(ana.step)
    starts = []
    for i in range(24):
        carry, snap = step(carry, stereo[None, i * b : (i + 1) * b])
        starts.append(int(np.asarray(snap.start)[0, 0]))
    # between trigger evaluations the start decreases by exactly b per hop
    for i in range(13, 24):
        if i % 3 != 0:
            assert starts[i] == starts[i - 1] - b, (i, starts[i - 1], starts[i])
