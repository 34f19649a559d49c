"""Per-stage progress counters + 1 Hz rate observer (SURVEY.md §2.4
A3) — the runtime analog of the reference's progress monitor
(/root/reference/src/progress.rs:31-137: per-stage counts sampled at
1 Hz into a 20-sample sliding rate window, printed by
src/bin.rs:385-428).

Ray-native shape: ONE detached-scope counter actor per run; stage
batch functions report increments fire-and-forget (one tiny actor call
per batch, no backpressure on the data path), and an observer thread
on the driver samples/prints at a fixed cadence.

Usage::

    prog = ProgressTracker()
    ds.map_batches(prog.wrap(encode_fn, "way_encode"), ...)
    with prog.observe(interval_s=1.0):   # prints one JSON line per tick
        ds.materialize()
    print(prog.snapshot())
"""

from __future__ import annotations

import json
import threading
import time
from collections import deque
from contextlib import contextmanager

import ray

_WINDOW = 20  # sliding rate window, samples (src/progress.rs:113)


@ray.remote(num_cpus=0)
class _ProgressActor:
    def __init__(self):
        self._counts: dict[str, int] = {}

    def add(self, stage: str, n: int) -> None:
        self._counts[stage] = self._counts.get(stage, 0) + int(n)

    def counts(self) -> dict[str, int]:
        return dict(self._counts)


class ProgressTracker:
    """Driver-side handle: wraps batch fns with counters and samples
    rates over a sliding window."""

    def __init__(self):
        self._actor = _ProgressActor.remote()
        self._history: deque[tuple[float, dict[str, int]]] = deque(maxlen=_WINDOW)

    def wrap(self, fn, stage: str):
        """Wrap a map_batches callable: counts rows AFTER the fn (what
        the stage produced), reported fire-and-forget."""
        actor = self._actor

        def wrapped(batch):
            out = fn(batch)
            try:
                n = out.num_rows if hasattr(out, "num_rows") else len(out)
                actor.add.remote(stage, n)
            except Exception:
                pass  # progress must never fail the data path
            return out

        return wrapped

    def counts(self) -> dict[str, int]:
        return ray.get(self._actor.counts.remote())

    def sample(self) -> dict:
        """One observation: per-stage totals + windowed rates/sec."""
        now = time.time()
        counts = self.counts()
        self._history.append((now, counts))
        rates: dict[str, float] = {}
        if len(self._history) >= 2:
            t0, c0 = self._history[0]
            dt = max(now - t0, 1e-9)
            for k, v in counts.items():
                rates[k] = round((v - c0.get(k, 0)) / dt, 2)
        return {"t": now, "counts": counts, "rates_per_s": rates}

    def snapshot(self) -> dict:
        return self.sample()

    @contextmanager
    def observe(self, interval_s: float = 1.0, emit=None):
        """Run a 1 Hz sampling thread for the duration of the block;
        each tick calls ``emit(sample_dict)`` (default: one JSON line
        to stdout)."""
        stop = threading.Event()
        emit = emit or (lambda s: print(json.dumps(s), flush=True))

        def loop():
            while not stop.wait(interval_s):
                emit(self.sample())

        th = threading.Thread(target=loop, daemon=True)
        th.start()
        try:
            yield self
        finally:
            stop.set()
            th.join(timeout=2 * interval_s)
            emit(self.sample())
