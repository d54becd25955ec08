"""Observability: named loggers, memory reporting, JAX profiler traces.

Replaces the reference's easylogging++ setup (src/Logging.cpp): nine
named loggers with per-process files, VmRSS memory checks
(Logging.cpp:113-141, CHECK_MEMORY_USAGE), and adds what the reference
never had (SURVEY §5): structured per-round metrics and on-demand JAX
profiler traces.
"""

from __future__ import annotations

import json
import logging
import os
import time
from contextlib import contextmanager

LOGGER_NAMES = (
    "SYS", "INIT", "ROUND", "COMPARE", "RECO", "MEM", "FFT", "TPU", "IO",
)


def init_loggers(log_file: str | None = None,
                 level: int = logging.INFO) -> dict[str, logging.Logger]:
    """Create the named logger family; optional shared file sink."""
    handlers: list[logging.Handler] = [logging.StreamHandler()]
    if log_file:
        handlers.append(logging.FileHandler(log_file))
    fmt = logging.Formatter(
        "%(asctime)s [%(name)s] %(levelname)s %(message)s"
    )
    loggers = {}
    for name in LOGGER_NAMES:
        lg = logging.getLogger(f"thunder.{name}")
        lg.setLevel(level)
        if not lg.handlers:
            for h in handlers:
                h.setFormatter(fmt)
                lg.addHandler(h)
        loggers[name] = lg
    return loggers


def memory_rss_gb() -> float:
    """Resident set size in GB from /proc (Logging.cpp:113-141)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024**2
    except OSError:
        pass
    return float("nan")


def device_memory_gb() -> dict:
    """Per-device HBM usage when the backend exposes it."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use_gb": stats.get("bytes_in_use", 0) / 1024**3,
                "bytes_limit_gb": stats.get("bytes_limit", 0) / 1024**3,
            }
        except Exception:
            out[str(d)] = {}
    return out


def check_memory(tag: str, logger: logging.Logger | None = None) -> None:
    lg = logger or logging.getLogger("thunder.MEM")
    lg.info("%s: host RSS %.2f GB", tag, memory_rss_gb())


class RoundMetrics:
    """JSONL per-round metrics sink (a structured upgrade over the
    reference's Class_Info/FSC text files)."""

    def __init__(self, path: str):
        self.path = path

    def write(self, record: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")


@contextmanager
def profiler_trace(log_dir: str | None):
    """JAX profiler trace around a block (view with TensorBoard /
    xprof).  No-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def timed(name: str, sink: dict | None = None,
          logger: logging.Logger | None = None):
    t0 = time.time()
    yield
    dt = time.time() - t0
    if sink is not None:
        sink[name] = sink.get(name, 0.0) + dt
    (logger or logging.getLogger("thunder.ROUND")).debug("%s: %.3fs", name, dt)
