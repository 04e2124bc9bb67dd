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


# --- M13 plots (reference weather_predictor.py:550-633) ----------------------
def _feed_row(**kw):
    from types import SimpleNamespace

    return SimpleNamespace(**kw)


def test_model_comparison_svg_renders_all_panels():
    import xml.etree.ElementTree as ET

    from weather_data_pipeline_spark.ml.plots import model_comparison_svg

    rows = [
        _feed_row(model=m, split=s, metric=k, value=v)
        for m, v in (("linear", 0.95), ("rf", 0.94))
        for s in ("train", "test")
        for k in ("mse", "mae", "r2")
    ]
    svg = model_comparison_svg(rows)
    root = ET.fromstring(svg)  # valid XML
    assert root.tag.endswith("svg")
    bars = svg.count('class="bar"')
    assert bars == 4 * 2  # 4 panels x 2 models
    assert "Test R²" in svg and "Train R²" in svg


def test_feature_importance_svg_preserves_rank_order():
    import xml.etree.ElementTree as ET

    from weather_data_pipeline_spark.ml.plots import feature_importance_svg

    rows = [
        _feed_row(model="random_forest", rank=r, feature=f"f{r}", importance=1.0 / r)
        for r in (3, 1, 2)
    ]
    svg = feature_importance_svg(rows)
    ET.fromstring(svg)
    assert svg.count('class="bar"') == 3
    assert svg.index("f1") < svg.index("f2") < svg.index("f3")
    assert "random_forest" in svg


def test_save_model_plots_writes_both_figures(spark, sf_dir, tmp_path):
    import os

    from weather_data_pipeline_spark.ml.plots import save_model_plots

    paths = save_model_plots(spark, sf_dir, str(tmp_path / "plots"))
    for p in paths.values():
        assert os.path.exists(p) and open(p).read().startswith("<svg")
