"""PerformanceTracker parity tests (reference `src/monitoring/performance.py`:
call counts, total/avg/min/max semantics, decorator + context-manager forms,
recording on exception, reset)."""

from __future__ import annotations

import pytest

from weather_data_pipeline_spark.monitoring import PerformanceTracker


def test_track_counts_and_stats(monkeypatch):
    t = PerformanceTracker()
    ticks = iter([0.0, 1.0, 10.0, 13.0])  # two runs: 1s and 3s
    monkeypatch.setattr("time.perf_counter", lambda: next(ticks))
    with t.track("op"):
        pass
    with t.track("op"):
        pass
    s = t.summary()["op"]
    assert s["total_calls"] == 2
    assert s["total_time"] == pytest.approx(4.0)
    assert s["avg_time"] == pytest.approx(2.0)
    assert s["min_time"] == pytest.approx(1.0)
    assert s["max_time"] == pytest.approx(3.0)


def test_timed_decorator_and_get():
    t = PerformanceTracker()

    @t.timed("fn")
    def fn(x):
        return x * 2

    assert fn(21) == 42
    assert fn(1) == 2
    assert t.get("fn")["total_calls"] == 2
    assert t.get("missing") is None


def test_records_on_exception():
    t = PerformanceTracker()
    with pytest.raises(ValueError):
        with t.track("boom"):
            raise ValueError()
    assert t.summary()["boom"]["total_calls"] == 1


def test_reset():
    t = PerformanceTracker()
    with t.track("a"):
        pass
    t.reset()
    assert t.summary() == {}


def test_spark_job_group_and_dataframe(spark):
    t = PerformanceTracker(spark)
    with t.track("count_stage"):
        spark.range(10).count()
    df = t.as_dataframe(spark)
    row = df.where("operation = 'count_stage'").first()
    assert row.total_calls == 1
    assert row.total_time >= row.min_time > 0
