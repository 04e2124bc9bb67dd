"""M13: model-comparison and feature-importance plots (reference
`weather_predictor.py:550-633`) — rendered as dependency-free SVG.

The container ships no matplotlib, but the reference's plotting layer is a
capability, not a library choice: it consumes the training results and
emits two figures. Here the same data contracts
(`ml_model_comparison_feed`: long-form (model, split, metric, value);
`ml_feature_importance_feed`: (model, rank, feature, importance)) render to
standalone SVG via string assembly — viewable in any browser, no runtime
dependency, fully unit-testable (the output is parseable XML with one rect
per bar).

Driver-side by design: the inputs are tiny collected aggregates (5 models ×
6 metrics; top-10 importances), exactly like the reference's plots.
"""

from __future__ import annotations

import html
from collections.abc import Sequence

_FONT = 'font-family="sans-serif"'


def _esc(s: str) -> str:
    return html.escape(str(s), quote=True)


def bar_chart_svg(
    labels: Sequence[str],
    values: Sequence[float],
    title: str,
    width: int = 420,
    height: int = 260,
    color: str = "#4c78a8",
) -> str:
    """One titled bar panel: proportional-height rects + value labels."""
    assert len(labels) == len(values)
    n = max(len(values), 1)
    pad, title_h, label_h = 10, 24, 36
    plot_w, plot_h = width - 2 * pad, height - title_h - label_h
    vmax = max([abs(v) for v in values] + [1e-12])
    bw = plot_w / n
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">',
        f'<text x="{width / 2}" y="16" text-anchor="middle" {_FONT} '
        f'font-size="13" font-weight="bold">{_esc(title)}</text>',
    ]
    for i, (lab, v) in enumerate(zip(labels, values)):
        h = plot_h * abs(v) / vmax
        x = pad + i * bw + bw * 0.1
        y = title_h + (plot_h - h)
        parts.append(
            f'<rect class="bar" x="{x:.1f}" y="{y:.1f}" '
            f'width="{bw * 0.8:.1f}" height="{h:.1f}" fill="{color}"/>'
        )
        parts.append(
            f'<text x="{pad + (i + 0.5) * bw:.1f}" y="{y - 3:.1f}" '
            f'text-anchor="middle" {_FONT} font-size="9">{v:.4g}</text>'
        )
        parts.append(
            f'<text x="{pad + (i + 0.5) * bw:.1f}" y="{height - label_h + 12}" '
            f'text-anchor="middle" {_FONT} font-size="9" '
            f'transform="rotate(30 {pad + (i + 0.5) * bw:.1f} '
            f'{height - label_h + 12})">{_esc(lab)}</text>'
        )
    parts.append("</svg>")
    return "".join(parts)


def model_comparison_svg(feed_rows: Sequence) -> str:
    """The reference's 2×2 comparison figure from the long-form metrics feed
    (rows with .model/.split/.metric/.value): panels for test R², test MSE,
    test MAE, and train R² side by side in one outer SVG."""
    panels = [
        ("test", "r2", "Test R²"),
        ("test", "mse", "Test MSE"),
        ("test", "mae", "Test MAE"),
        ("train", "r2", "Train R²"),
    ]
    models = sorted({r.model for r in feed_rows})
    by_key = {(r.model, r.split, r.metric): float(r.value) for r in feed_rows}
    w, h = 420, 260
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{2 * w}" '
        f'height="{2 * h}" viewBox="0 0 {2 * w} {2 * h}">'
    ]
    for i, (split, metric, title) in enumerate(panels):
        inner = bar_chart_svg(
            models, [by_key.get((m, split, metric), 0.0) for m in models], title
        )
        x, y = (i % 2) * w, (i // 2) * h
        parts.append(f'<g transform="translate({x},{y})">{inner}</g>')
    parts.append("</svg>")
    return "".join(parts)


def feature_importance_svg(feed_rows: Sequence) -> str:
    """Top-N feature-importance bars from the (model, rank, feature,
    importance) feed, rank order preserved."""
    rows = sorted(feed_rows, key=lambda r: r.rank)
    model = rows[0].model if rows else "model"
    return bar_chart_svg(
        [r.feature for r in rows],
        [float(r.importance) for r in rows],
        f"Feature importances — {model}",
        width=640,
        color="#f58518",
    )


def save_model_plots(spark, sf_dir: str, out_dir: str) -> dict[str, str]:
    """End-to-end M13: run the two feed queries and write both figures."""
    import os

    from ..plans.queries import REGISTRY

    os.makedirs(out_dir, exist_ok=True)
    comp = REGISTRY["ml_model_comparison_feed"].spark(spark, sf_dir).collect()
    imp = REGISTRY["ml_feature_importance_feed"].spark(spark, sf_dir).collect()
    paths = {
        "model_comparison": os.path.join(out_dir, "model_comparison.svg"),
        "feature_importance": os.path.join(out_dir, "feature_importance.svg"),
    }
    with open(paths["model_comparison"], "w") as f:
        f.write(model_comparison_svg(comp))
    with open(paths["feature_importance"], "w") as f:
        f.write(feature_importance_svg(imp))
    return paths
