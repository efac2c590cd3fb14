"""Lightweight instrumentation: wall-clock scopes and counters.

The reference's only observability is ``system_clock`` calls inside its
benchmark (SURVEY.md §5.1); this module gives the framework a proper
(still dependency-free) timer registry usable around jitted calls.

On an async dispatch backend a scope must materialize its outputs
before stopping the clock — use ``Timer.block`` or pass the outputs to
``scope(...)``'s ``sync`` argument.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict


class Metrics:
    """Process-wide named timers/counters with simple reporting."""

    def __init__(self):
        self.times = defaultdict(float)
        self.calls = defaultdict(int)
        self.counters = defaultdict(float)

    @contextlib.contextmanager
    def scope(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.times[name] += dt
            self.calls[name] += 1

    def count(self, name: str, value: float = 1.0):
        self.counters[name] += value

    def report(self) -> dict:
        return {
            "times_s": dict(self.times),
            "calls": dict(self.calls),
            "counters": dict(self.counters),
        }

    def dump(self, file=None):
        print(json.dumps(self.report(), indent=2, sort_keys=True), file=file)

    def reset(self):
        self.times.clear()
        self.calls.clear()
        self.counters.clear()


metrics = Metrics()


def env_ticker(env_var: str, label: str):
    """Opt-in section timer for host-side build phases.

    Returns ``tick(tag)`` printing per-section wall-clock when
    ``env_var`` is set in the environment, else a no-op — used by the
    grid/candidate-table builders (enable with e.g.
    ``IU_BUILD_PROFILE=1``)."""
    import os

    if not os.environ.get(env_var):
        return lambda tag: None
    state = {"t": time.perf_counter()}

    def tick(tag: str):
        now = time.perf_counter()
        print(f"  [{label}] {tag}: {now - state['t']:.1f}s", flush=True)
        state["t"] = now

    return tick


def timed(name: str):
    """Decorator: accumulate wall-clock of a function into ``metrics``."""

    def deco(f):
        def wrapper(*args, **kwargs):
            with metrics.scope(name):
                out = f(*args, **kwargs)
            return out

        wrapper.__name__ = getattr(f, "__name__", name)
        return wrapper

    return deco
