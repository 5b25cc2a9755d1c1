"""Timing and profiling utilities (SURVEY §5.1: keep the reference's
named-task timer surface — Dynamic.scala:46-54 — and add jax.profiler
traces)."""

from __future__ import annotations

import contextlib
import sys
import time
from typing import Dict, Optional


_heartbeat_fn = None


def set_heartbeat(fn) -> None:
    """Install a liveness callback invoked at pipeline step boundaries
    (dispatch/harvest/build batches). Used by bench.py so its supervisor's
    stall detector can distinguish a slow-but-alive jit warm-up over the
    axon tunnel from a dead tunnel (BENCH_r04: 2 of 3 attempts were killed
    mid-compile). Pass None to uninstall."""
    global _heartbeat_fn
    _heartbeat_fn = fn


def heartbeat(phase: str) -> None:
    """Report liveness; no-op (one global load) unless a callback is set."""
    if _heartbeat_fn is not None:
        try:
            _heartbeat_fn(phase)
        except Exception:
            pass


class Timer:
    """Named task timer, printing Start/Finish lines like the reference."""

    def __init__(self, task: str, quiet: bool = False):
        self.task = task
        self.quiet = quiet
        self.start = time.time()
        self.elapsed: Optional[float] = None
        if not quiet:
            print(f"Start task: {task}", file=sys.stderr)

    def finish(self) -> float:
        self.elapsed = time.time() - self.start
        if not self.quiet:
            s = int(self.elapsed)
            print(f"Finish task: {self.task} [{s // 60} min {s % 60} s]", file=sys.stderr)
        return self.elapsed

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.finish()
        return False


class PhaseTimers:
    """Accumulating per-phase wall-clock timers."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, file=None):
        file = file or sys.stderr
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            print(
                f"  {name}: {self.totals[name]:.2f}s over {self.counts[name]} calls",
                file=file,
            )


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str]):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto) around
    a block, when a directory is given."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"Profiler trace written to {trace_dir}", file=sys.stderr)


def prefetch_iterator(it, depth: int = 2):
    """Run a (possibly expensive) iterator in a background thread, keeping up
    to `depth` items ready ahead of the consumer.

    Used to overlap host-side input parsing (the C++ FASTQ/FASTA packer
    releases the GIL during parse) with device compute — the TPU analogue of
    the reference's Spark input stage running concurrently with the shuffle
    (FileInputs.scala readers are lazy Datasets pulled by executor threads).
    Exceptions raised by the producer re-raise at the consumer site."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    sentinel = object()
    error = []

    def worker():
        try:
            for x in it:
                q.put(x)
        except BaseException as e:  # noqa: BLE001 - re-raised at consumer
            error.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True, name="stpu-prefetch")
    t.start()
    while True:
        x = q.get()
        if x is sentinel:
            if error:
                raise error[0]
            return
        yield x
