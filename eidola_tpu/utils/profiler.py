"""Named recurring profiler scopes.

TPU-native analog of nvvk::ProfilerVK (ref main.cpp:194-197,
sample_example.cpp:388-390; GUI readout sample_gui.cpp:388-443): named
scopes measured every frame, averaged over a sliding window.  Because a
jitted frame is a single dispatch, per-scope timing REQUIRES a sync — the
profiler only blocks when enabled, so production frames pay nothing.

For kernel-level timing use `trace()` which wraps jax.profiler and writes a
TensorBoard-compatible trace (the shader-clock analog, ref main.cpp:101).
Inside the frame function, `jax.named_scope` labels (render/frame.py) play
the role of the reference's debug-utils labels (ref renderer.cpp:127-145).
"""
from __future__ import annotations

import contextlib
import time
from collections import deque
from dataclasses import dataclass, field

import jax


@dataclass
class _Scope:
    samples: deque = field(default_factory=lambda: deque(maxlen=64))
    total: float = 0.0
    count: int = 0

    def add(self, dt: float):
        self.samples.append(dt)
        self.total += dt
        self.count += 1

    @property
    def avg_ms(self) -> float:
        if not self.samples:
            return 0.0
        return sum(self.samples) / len(self.samples) * 1e3


class Profiler:
    """Wall-clock profiler with named recurring scopes.

    >>> prof = Profiler(enabled=True)
    >>> with prof.scope("Render", block_on=outputs["image"]):
    ...     state, outputs = step(...)
    >>> print(prof.summary())
    """

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.scopes: dict[str, _Scope] = {}

    @contextlib.contextmanager
    def scope(self, name: str, block_on=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.scopes.setdefault(name, _Scope()).add(time.perf_counter() - t0)

    def timeit(self, name: str, fn, *args, **kwargs):
        """Run fn, block on its result, record under `name`, return result."""
        if not self.enabled:
            return fn(*args, **kwargs)
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.scopes.setdefault(name, _Scope()).add(time.perf_counter() - t0)
        return out

    def summary(self) -> str:
        """GUI-profiler-panel analog (ref sample_gui.cpp:400-432)."""
        lines = [f"{'scope':<24} {'avg ms':>9} {'calls':>7} {'total s':>9}"]
        for name, s in self.scopes.items():
            lines.append(
                f"{name:<24} {s.avg_ms:>9.2f} {s.count:>7} {s.total:>9.2f}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device-level trace viewable in TensorBoard/Perfetto
    (kernel timing heatmap analog, ref VK_KHR_shader_clock main.cpp:101)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MilliTimer:
    """Load-phase wall timer (ref tools.hpp:41-44 MilliTimer)."""

    def __init__(self, label: str = ""):
        self.label = label
        self.t0 = time.perf_counter()

    def print(self, what: str = ""):
        dt = (time.perf_counter() - self.t0) * 1e3
        print(f"{self.label}{what}: {dt:.1f} ms")
        return dt
