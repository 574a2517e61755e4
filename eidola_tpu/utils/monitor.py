"""Device telemetry ring buffers.

Analog of the reference's NvmlMonitor (ref src/nvml_monitor.hpp:36-60,
polled once per frame at sample_example.cpp:378-380): samples TPU HBM
usage via jax device memory_stats plus host process RSS into fixed-size
ring buffers for dashboards/logging.
"""
from __future__ import annotations

import time
from collections import deque

import jax


class DeviceMonitor:
    def __init__(self, interval_s: float = 0.1, capacity: int = 256):
        self.interval_s = interval_s
        self.capacity = capacity
        self.bytes_in_use: deque = deque(maxlen=capacity)
        self.bytes_limit: int | None = None
        self.host_rss: deque = deque(maxlen=capacity)
        self._last = 0.0
        self._dev = jax.local_devices()[0]

    def refresh(self):
        """Call once per frame; rate-limited internally (ref
        nvml_monitor refresh cadence)."""
        now = time.monotonic()
        if now - self._last < self.interval_s:
            return
        self._last = now
        stats = None
        try:
            stats = self._dev.memory_stats()
        except Exception:
            pass
        if stats:
            self.bytes_in_use.append(stats.get("bytes_in_use", 0))
            self.bytes_limit = stats.get("bytes_limit", self.bytes_limit)
        try:
            with open("/proc/self/statm") as f:
                pages = int(f.read().split()[1])
            self.host_rss.append(pages * 4096)
        except OSError:
            pass

    def summary(self) -> str:
        dev = self.bytes_in_use[-1] / 2**20 if self.bytes_in_use else 0.0
        lim = (self.bytes_limit or 0) / 2**20
        rss = self.host_rss[-1] / 2**20 if self.host_rss else 0.0
        return (
            f"device {self._dev.device_kind}: HBM {dev:.0f}"
            + (f"/{lim:.0f}" if lim else "")
            + f" MiB, host RSS {rss:.0f} MiB"
        )
