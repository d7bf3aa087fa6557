"""Standalone ThreadSanitizer harness for the C++ ingest transport.

Run as:

    LD_PRELOAD=$(gcc -print-file-name=libtsan.so.2) \
    TSAN_OPTIONS="exitcode=66 halt_on_error=0" \
    OPENMETERS_TSAN=1 python tests/tsan_transport.py

Loads ``openmeters_tpu/ingest/transport.py`` directly by path — deliberately
NOT through the package — so JAX/XLA never enters the process: XLA's
uninstrumented internals flood TSan with false positives (412 reports, all
in libjax_common.so, zero in the transport) and would mask real findings.

The scenario is the §5.2 race surface: per-stream producer threads pushing
timed PCM/silence/fault + generation bumps while the main thread assembles,
discards, and reconfigures concurrently.  Exit code is TSan's: 0 clean,
66 (per TSAN_OPTIONS above) if any race is reported in this code.

Reference analogue: the reference relies on `#![forbid(unsafe_code)]` +
rtrb's tested SPSC (transport.rs); our C++ port carries its own proof
obligation, discharged here.
"""

import importlib.util
import pathlib
import sys
import threading

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
SPEC = importlib.util.spec_from_file_location(
    "om_transport_standalone", ROOT / "openmeters_tpu" / "ingest" / "transport.py"
)
transport = importlib.util.module_from_spec(SPEC)
SPEC.loader.exec_module(transport)

RATE = 48_000.0


def ns_of(frames: float) -> int:
    return int(frames / RATE * 1e9)


def main() -> int:
    n_streams, blocks, b = 4, 60, 256
    tp = transport.Transport(n_streams=n_streams, channels=2, block_frames=b)
    stop = threading.Event()

    import time as _time

    def producer(stream: int):
        gen = 1
        for i in range(blocks):
            if i % 17 == 11:  # format churn mid-stream
                gen += 1
                tp.set_generation(stream, gen)
            if i % 23 == 7:
                tp.push_fault(stream)
            x = np.full((b, 2), float(stream + 1) / 10, np.float32)
            if i % 13 == 5:  # timeline gap -> silence synthesis
                ts = ns_of((i + 2) * b)
            else:
                ts = ns_of(i * b)
            while tp.push_pcm(stream, x, ts) != 0 and not stop.is_set():
                pass
            # pace the producer so pushes genuinely interleave with the
            # assembler: an unpaced loop finishes all blocks before the
            # first assemble, and the final fault's discard-backlog then
            # wipes every span — the PCM-consume side never executes
            _time.sleep(0.001)

    threads = [
        threading.Thread(target=producer, args=(s,)) for s in range(n_streams)
    ]
    for t in threads:
        t.start()

    import time

    consumed = 0
    step = 0
    while True:
        # pace on backlog: free-running assembles would let the idle
        # watchdog advance the timeline past the producers' timestamps and
        # every pushed span would be skipped as overlap — the PCM-consume
        # side of the race surface would never execute.  The occasional
        # idle assemble still exercises the watchdog/silence path.
        if tp.backlog_blocks() > 0 or step % 97 == 13:
            batch, reset, underrun, live = tp.assemble()
            consumed += int(np.count_nonzero(batch))
        step += 1
        if step % 50 == 49:
            tp.set_active(0, False)
            tp.set_active(0, True)
        if all(not t.is_alive() for t in threads) and tp.backlog_blocks() == 0:
            break
        time.sleep(0.002)  # let TSan-slowed producers actually interleave
    stop.set()
    for t in threads:
        t.join()
    print(f"tsan harness done: consumed {consumed} nonzero samples")
    if consumed == 0:
        print("FAIL: no PCM reached the assembler — data path unexercised")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
