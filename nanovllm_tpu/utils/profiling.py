"""Engine observability: per-step timers, step-kind breakdown, xprof hooks.

The reference has no tracing/profiling at all (SURVEY.md §5.1 — only a tqdm
postfix, reference llm_engine.py:248-258).  Here every engine step is
attributed to a step kind and a phase so regressions localize instantly:

  kinds:  prefill (all chunks new), decode (all num_new==1, single step),
          burst (W fused decode steps), mixed (decode + prefill in one batch)
  phases: schedule (control plane), prep (host batch assembly + H2D),
          device (jitted program incl. D2H of sampled tokens), post
          (scheduler postprocess)

``EngineStats.summary()`` renders a table; ``LLMEngine.generate`` prints it
when the ``NVT_STATS`` env var is set.  ``trace(dir)`` wraps a region in a
``jax.profiler`` trace for xprof/tensorboard (device-side view).
"""

import contextlib
import os
import time
from collections import defaultdict


class _Phase:
    __slots__ = ("count", "seconds", "tokens")

    def __init__(self):
        self.count = 0
        self.seconds = 0.0
        self.tokens = 0


class EngineStats:
    """Wall-clock attribution of the step loop (host perspective)."""

    def __init__(self):
        # (kind, phase) -> _Phase
        self.cells: dict[tuple[str, str], _Phase] = defaultdict(_Phase)
        self.enabled = bool(os.environ.get("NVT_STATS"))

    def add(self, kind: str, phase: str, seconds: float, tokens: int = 0):
        c = self.cells[(kind, phase)]
        c.count += 1
        c.seconds += seconds
        c.tokens += tokens

    @contextlib.contextmanager
    def measure(self, kind: str, phase: str, tokens: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.add(kind, phase, time.perf_counter() - t0, tokens)

    def summary(self) -> str:
        kinds = sorted({k for k, _ in self.cells})
        phases = ["schedule", "prep", "device", "post"]
        total = sum(c.seconds for c in self.cells.values())
        lines = [
            f"{'kind':>8} {'steps':>6} {'tokens':>9} "
            + " ".join(f"{p + '(s)':>11}" for p in phases)
            + f" {'tok/s(dev)':>11}"
        ]
        for kind in kinds:
            row = [self.cells.get((kind, p), _Phase()) for p in phases]
            steps = max((c.count for c in row), default=0)
            tokens = sum(c.tokens for c in row)
            dev_s = self.cells.get((kind, "device"), _Phase()).seconds
            lines.append(
                f"{kind:>8} {steps:>6} {tokens:>9} "
                + " ".join(f"{c.seconds:>11.2f}" for c in row)
                + f" {tokens / dev_s if dev_s else 0:>11.0f}"
            )
        lines.append(f"total attributed: {total:.2f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(trace_dir: str | None):
    """Wrap a region in a jax.profiler trace (no-op when dir is falsy)."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
