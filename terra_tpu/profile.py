"""Metrics registry + rays/s counters + jax.profiler hooks.

TPU equivalent of the TerraProfile subsystem (/root/reference/src/
TerraProfile.c, include/TerraProfile.h): where the reference brackets hot
scalar code with per-thread clock buffers merged into running stats
(TerraProfile.c:254-265), on TPU the device work is opaque to host timers,
so the useful observables are:

  * wall-clock per launch (block_until_ready-timed),
  * derived throughput counters — rays/s, Mrays/s/chip — computed from the
    wavefront shape (the BASELINE headline metric),
  * XLA-level traces via ``jax.profiler.trace`` for kernel breakdowns.

Stats model mirrors the reference targets: n/avg/var/min/max/sum
(TerraProfile.h:33-78) via Welford updates.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Dict, Optional

__all__ = ["Stats", "Profiler", "ray_count", "profiler"]


@dataclass
class Stats:
    """Welford running stats (terra_profile_update_stats_*,
    TerraProfile.c:254-265)."""

    n: int = 0
    mean: float = 0.0
    m2: float = 0.0
    min: float = float("inf")
    max: float = float("-inf")
    sum: float = 0.0

    def add(self, x: float):
        self.n += 1
        d = x - self.mean
        self.mean += d / self.n
        self.m2 += d * (x - self.mean)
        self.min = min(self.min, x)
        self.max = max(self.max, x)
        self.sum += x

    @property
    def var(self) -> float:
        return self.m2 / self.n if self.n > 1 else 0.0

    def as_dict(self) -> dict:
        return dict(n=self.n, avg=self.mean, var=self.var, min=self.min, max=self.max, sum=self.sum)


class Profiler:
    """Named-target session (sessions/targets model, TerraProfile.h:33-78).
    Usage::

        with profiler.clock("render"):
            film = render(...)
    """

    def __init__(self):
        self.targets: Dict[str, Stats] = {}

    def stats(self, target: str) -> Stats:
        return self.targets.setdefault(target, Stats())

    @contextlib.contextmanager
    def clock(self, target: str):
        t0 = time.perf_counter()
        yield
        self.stats(target).add(time.perf_counter() - t0)

    def add_sample(self, target: str, value: float):
        self.stats(target).add(value)

    def report(self) -> str:
        lines = []
        for name in sorted(self.targets):
            s = self.targets[name]
            lines.append(
                f"{name:24s} n={s.n:6d} avg={s.mean * 1e3:9.3f}ms "
                f"min={s.min * 1e3:9.3f}ms max={s.max * 1e3:9.3f}ms sum={s.sum:8.3f}s"
            )
        return "\n".join(lines)

    def clear(self):
        self.targets.clear()


profiler = Profiler()


def ray_count(opts, avg_path_length: Optional[float] = None) -> float:
    """Nominal rays traced per full render at ``opts``: primary rays times
    bounce-loop raycasts (1 per bounce iteration + NEE/MIS shadow rays).

    The benchmark headline counts *closest-hit traversals actually issued by
    the wavefront*: (bounces+1) raycasts per lane for the path walk, plus 1
    (NEE) or 2 (MIS) per bounce iteration for the integrator. Early
    termination makes the true number lower; callers that want measured
    occupancy should pass avg_path_length.
    """
    lanes = opts.width * opts.height * opts.samples_per_pixel
    per_bounce = 1
    integ = int(opts.integrator)
    if integ == 1:  # DIRECT
        per_bounce += 1
    elif integ == 2 or integ == 6:  # DIRECT_MIS / DEBUG_MIS_WEIGHTS
        per_bounce += 2
    depth = avg_path_length if avg_path_length is not None else (opts.bounces + 1)
    return float(lanes) * per_bounce * depth
