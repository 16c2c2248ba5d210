"""Observability: structured metrics, rays/s accounting, render timing.

The reference's only observability is print statements + a per-pixel debug
buffer (SURVEY.md §5). Here: a structured metric logger (JSON lines), the
nominal-ray accounting used by bench.py, and a timing context that fences
device work honestly (chained-step methodology — see bench.py docstring for
why plain block_until_ready is not trusted on dev transports)."""
from __future__ import annotations

import json
import sys
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from ..types import RenderConfig


def nominal_rays(config: RenderConfig) -> int:
    """Rays per frame as executed by the fixed-shape TPU kernels: every
    (pixel, sample, bounce) computes one closest-hit and one shadow query
    regardless of liveness. For the MIS integrator: camera rays x (1 camera
    trace + per-MIS-sample primary + secondary NEE traces)."""
    if config.integrator in ("path", "direct"):
        bounces = 1 if config.integrator == "direct" else config.bounces
        return config.num_pixels * config.spp * bounces * 2
    if config.integrator == "mis":
        per_sample = 2  # strategy trace + (secondary NEE or light check)
        return (config.num_pixels * config.camera_rays
                * (1 + config.mis_samples * per_sample))
    raise ValueError(config.integrator)


def mrays_per_s(config: RenderConfig, seconds: float) -> float:
    return nominal_rays(config) / seconds / 1e6


@dataclass
class MetricLogger:
    """JSON-lines metric sink (stdout or file)."""

    path: Optional[str] = None
    records: List[Dict[str, Any]] = field(default_factory=list)

    def log(self, name: str, value: Any, **tags: Any) -> None:
        rec = {"metric": name, "value": value, "time": time.time(), **tags}
        self.records.append(rec)
        line = json.dumps(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")
        else:
            print(line, file=sys.stderr)


@contextmanager
def timed(logger: Optional[MetricLogger], name: str, **tags: Any):
    """Wall-clock a block; caller is responsible for fencing device work
    (fetch a scalar or block_until_ready on a trusted transport)."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if logger is not None:
        logger.log(name, dt, unit="s", **tags)


@contextmanager
def profiler_trace(log_dir: str):
    """jax.profiler trace for TensorBoard/perfetto (SURVEY.md §5 tracing
    plan)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
