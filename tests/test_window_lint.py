"""Source-level lint for single-task windows (round-10 VERDICT item 5).

``scripts/plan_audit.py`` gates the PHYSICAL plan at audit time; this
test is the defense-in-depth layer that catches a new
``Window.orderBy(...)`` (no ``partitionBy``) at pytest time, before the
audit ever runs.  Every unpartitioned-window site must be a REVIEWED
spine window — a window over a domain-bounded post-aggregation frame
(calendar days, quarters, deciles, fixed value bands) or one of the
``operators/scale.py`` ladder internals (windows over the
<=n_buckets-row bucket spine).  A hit in a function not listed below
fails: either convert the query to the ``scale.binned_*`` ladders
(entity/value-keyed frames) or review the new spine and add the
function name here with the justification pattern the existing entries
follow.

The allowlist is keyed by (file, enclosing function) — stable across
line-number churn — and is asserted EXACT in both directions, so a
removed site must also be removed here (no stale entries accruing).
"""

from __future__ import annotations

import ast
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "wistia_video_analytics_project_spark")

_WINDOW_RE = re.compile(r"Window(\(\))?\.orderBy\(")

#: reviewed unpartitioned-window sites.  Every entry is one of:
#:   - a calendar/day/quarter spine window (daily aggregates: frame
#:     size == date span, bounded by the domain, not the data);
#:   - a decile/bucket/band spine (fixed-cardinality frame);
#:   - a scale.py ladder internal (window over the <=n_buckets-row
#:     bucket spine — these ARE the replacement for single-task
#:     windows, so their spine windows are the reviewed exception).
ALLOWED: dict[str, set[str]] = {
    "__spark_entry__.py": {
        # day-spine trends / time-series diagnostics (frame = date span)
        "q_ar2_revenue_forecast",
        "q_bh_fdr_event_shares",          # event-type spine (5 types)
        "q_binseg_changepoints",
        "q_bootstrap_ci_daily_revenue",
        "q_breusch_pagan_daily",
        "q_clamped_quarterly_balance",    # quarter spine
        "q_cumulative_unique_users",
        "q_cusum_changepoint",
        "q_daily_revenue_acf",
        "q_daily_revenue_decomposition",
        "q_daily_value_locf",
        "q_dickey_fuller",
        "q_durbin_watson_daily",
        "q_granger_views_purchases",
        "q_hhi_yearly_trend",             # year spine
        "q_hill_tail_index",              # top-k tail after limit
        "q_hurst_rs_daily",
        "q_jaccard_threshold_sweep",      # fixed threshold grid spine
        "q_kpss_stationarity",
        "q_lift_table_purchase_propensity",  # decile spine (ladder-fed)
        "q_ljung_box_daily",
        "q_logrank_purchase_segments",    # duration-day spine
        "q_lorenz_curve_deciles",         # decile spine (ladder-fed)
        "q_nelson_aalen_hazard",          # duration-day spine
        "q_pacf_daily_revenue",
        "q_purchase_survival_km",         # duration-day spine
        "q_recsys_ndcg_popularity",       # top-k popularity spine
        "q_residual_diagnostics",
        "q_rolling_7day_range_revenue",
        "q_rolling_view_purchase_corr",
        "q_runs_test_daily",
        "q_seasonal_strength_weekly",     # weekday spine (7)
        "q_spectral_entropy_revenue",
        "q_sprt_conversion_test",         # day spine
        "q_survival_rmst",                # duration-day spine
        "q_theil_u2_seasonal_naive",
        "q_turning_points_test",
        "q_value_distribution",           # 2-decimal value-band spine
        "q_var_cvar_daily",
        "q_vocab_coverage",               # windows after a limit(20)
        "q_wilcoxon_halfyear_revenue",    # day spine
    },
    "wistia_video_analytics_project_spark/operators/analytics.py": {
        "period_over_period",             # day/period spine
    },
    "wistia_video_analytics_project_spark/operators/text.py": {
        "zipf_slope",                     # top-k rank spine after limit
    },
    "wistia_video_analytics_project_spark/operators/scale.py": {
        # ladder internals: windows over the <=n_buckets-row spine
        "binned_id_gaps",
        "binned_ntile",
        "binned_prefix_ops",
        "binned_row_number",
        "binned_running_sum",
    },
}


def _sites(path: str) -> set[str]:
    """Enclosing-function names of every unpartitioned-window hit."""
    with open(path) as f:
        src = f.read()
    spans = [
        (node.lineno, node.end_lineno, node.name)
        for node in ast.walk(ast.parse(src))
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
    ]
    names: set[str] = set()
    for i, line in enumerate(src.splitlines(), 1):
        if _WINDOW_RE.search(line):
            encl = sorted(a for a, b, _ in spans if a <= i <= b)
            if encl:
                start = encl[-1]  # innermost def
                names.add(next(n for a, _, n in spans if a == start))
            else:
                names.add("<module>")
    return names


def _all_files() -> list[str]:
    files = [os.path.join(REPO, "__spark_entry__.py")]
    for root, _, fs in os.walk(PKG):
        files.extend(
            os.path.join(root, f) for f in fs if f.endswith(".py")
        )
    return files


def test_no_unreviewed_single_task_windows():
    found: dict[str, set[str]] = {}
    for path in _all_files():
        names = _sites(path)
        if names:
            found[os.path.relpath(path, REPO)] = names
    assert found == ALLOWED, (
        "unpartitioned Window.orderBy sites changed — new:"
        f" { {f: s - ALLOWED.get(f, set()) for f, s in found.items() if s - ALLOWED.get(f, set())} },"
        " stale allowlist:"
        f" { {f: s - found.get(f, set()) for f, s in ALLOWED.items() if s - found.get(f, set())} }."
        " Convert entity/value-keyed frames to the scale.binned_*"
        " ladders, or review the new spine window and update ALLOWED"
        " in tests/test_window_lint.py."
    )
