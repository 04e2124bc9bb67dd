"""Per-stage timing instrumentation (reference parity:
`src/monitoring/performance.py:34-103` — `track` context manager, `timed`
decorator, summary dict keyed by operation with call counts and
total/avg/min/max seconds; used around pipeline stages the way the
reference's `process_pipeline` wraps each feature step,
`data_processor.py:280+`).

Spark-first differences from the reference:

- `track` also sets a Spark job group for the duration of the stage (when a
  SparkSession is attached), so every job the stage triggers is attributed
  to it in the Spark UI / event log — driver-side wall time alone is a poor
  proxy once work is distributed.
- raw samples are retained (bounded) instead of running aggregates, so the
  summary can report percentiles later without changing the recording path.
- `as_dataframe(spark)` exposes the summary as a DataFrame, making timings
  queryable like any other table.
"""

from __future__ import annotations

import functools
import logging
import time
from collections.abc import Iterator
from contextlib import contextmanager

logger = logging.getLogger(__name__)

_MAX_SAMPLES_PER_OP = 10_000  # cap memory for long-lived trackers


class PerformanceTracker:
    """Times named operations; query with `get` / `summary`.

    with tracker.track("load_data"):
        df = load_table(...)

    @tracker.timed("train")
    def train(...): ...
    """

    def __init__(self, spark=None) -> None:
        # op name -> list of elapsed seconds (insertion-ordered dict)
        self._samples: dict[str, list[float]] = {}
        self._overflow: dict[str, tuple[int, float]] = {}  # dropped (n, sum)
        self._spark = spark

    @contextmanager
    def track(self, operation: str) -> Iterator[None]:
        """Record one timed run of `operation` (exceptions still record)."""
        sc = self._spark.sparkContext if self._spark is not None else None
        if sc is not None:
            sc.setJobGroup(operation, f"perf-tracked stage: {operation}")
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            bucket = self._samples.setdefault(operation, [])
            if len(bucket) < _MAX_SAMPLES_PER_OP:
                bucket.append(dt)
            else:
                n, s = self._overflow.get(operation, (0, 0.0))
                self._overflow[operation] = (n + 1, s + dt)
            if sc is not None:
                sc.setJobGroup("", "")
            logger.info("[perf] %s: %.4fs", operation, dt)

    def timed(self, operation: str):
        """Decorator form of `track`."""

        def deco(fn):
            @functools.wraps(fn)
            def inner(*args, **kwargs):
                with self.track(operation):
                    return fn(*args, **kwargs)

            return inner

        return deco

    def get(self, operation: str) -> dict | None:
        """Stats dict for one operation, or None if never tracked."""
        if operation not in self._samples:
            return None
        return self.summary()[operation]

    def summary(self) -> dict[str, dict]:
        """{op: {total_calls, total_time, avg_time, min_time, max_time}} —
        the reference's summary contract (`performance.py:106-117`)."""
        out = {}
        for name, xs in self._samples.items():
            extra_n, extra_s = self._overflow.get(name, (0, 0.0))
            n = len(xs) + extra_n
            total = sum(xs) + extra_s
            out[name] = {
                "total_calls": n,
                "total_time": round(total, 4),
                "avg_time": round(total / n, 4) if n else 0.0,
                "min_time": round(min(xs), 4) if xs else None,
                "max_time": round(max(xs), 4) if xs else None,
            }
        return out

    def as_dataframe(self, spark):
        """Summary as a queryable DataFrame (op, calls, total/avg/min/max)."""
        rows = [
            (name, s["total_calls"], s["total_time"], s["avg_time"],
             s["min_time"], s["max_time"])
            for name, s in self.summary().items()
        ]
        return spark.createDataFrame(
            rows,
            "operation string, total_calls long, total_time double, "
            "avg_time double, min_time double, max_time double",
        )

    def log_summary(self) -> None:
        for name, s in self.summary().items():
            logger.info(
                "[perf] %s calls=%d total=%.4fs avg=%.4fs min=%s max=%s",
                name, s["total_calls"], s["total_time"], s["avg_time"],
                s["min_time"], s["max_time"],
            )

    def reset(self) -> None:
        self._samples.clear()
        self._overflow.clear()
