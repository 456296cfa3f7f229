"""Profiling / tracing utilities.

The reference only logs GPU memory per step (agent_decoder.py:2299-2301);
here we expose jax.profiler traces and phase timers as first-class tools.
"""

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulating wall-clock phase timer.

    with timer.phase("rollout"): ...
    print(timer.summary())
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for k in sorted(self.totals):
            n = self.counts[k]
            lines.append(f"{k}: total {self.totals[k]:.3f}s, "
                         f"n={n}, mean {self.totals[k] / max(n, 1) * 1e3:.1f}ms")
        return "\n".join(lines)


def device_memory_stats() -> Dict[str, float]:
    """Per-device memory stats in GiB (the reference's memory log analog)."""
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use_gib": s.get("bytes_in_use", 0) / 2 ** 30,
                "peak_bytes_gib": s.get("peak_bytes_in_use", 0) / 2 ** 30,
            }
        except Exception:  # noqa: BLE001 - not all backends expose stats
            out[str(d)] = {}
    return out
