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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "wistia_video_analytics_project_spark")

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
        # (binned_ntile delegates to binned_row_number — the old line
        # regex listed it from a DOCSTRING mention; the AST detector
        # sees only real calls)
        "binned_id_gaps",
        "binned_prefix_ops",
        "binned_row_number",
        "binned_running_sum",
    },
}


def _window_aliases(tree: ast.Module) -> set[str]:
    """Every local name the file binds to ``pyspark``'s ``Window``
    (handles ``from pyspark.sql import Window as W`` — round-11
    ADVICE: the old line regex missed aliased imports)."""
    aliases: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module in (
            "pyspark.sql",
            "pyspark.sql.window",
        ):
            for a in node.names:
                if a.name == "Window":
                    aliases.add(a.asname or a.name)
    return aliases


def _is_window_ref(node: ast.expr, aliases: set[str]) -> bool:
    """True iff the expression resolves to the Window class: a bound
    name (possibly aliased), an instantiation ``Window()``, or an
    attribute chain ending ``.Window`` (``pyspark.sql.Window``)."""
    if isinstance(node, ast.Name):
        return node.id in aliases
    if isinstance(node, ast.Call):  # Window().orderBy(
        return _is_window_ref(node.func, aliases)
    if isinstance(node, ast.Attribute):
        return node.attr == "Window"
    return False


def _sites(path: str) -> set[str]:
    """Enclosing-function names of every unpartitioned-window hit.

    AST-based (round-11 ADVICE): matches any ``orderBy`` call whose
    receiver resolves to the Window class — line-wrapped chains,
    aliased imports, and parenthesized receivers all count, where the
    old single-line regex saw nothing.  A ``Window.partitionBy(...)
    .orderBy(...)`` chain does NOT hit (the receiver is the
    partitionBy call, not Window), same as the regex it replaces."""
    with open(path) as f:
        tree = ast.parse(f.read())
    aliases = _window_aliases(tree) | {"Window"}
    spans = [
        (node.lineno, node.end_lineno, node.name)
        for node in ast.walk(tree)
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
    ]
    names: set[str] = set()
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "orderBy"
            and _is_window_ref(node.func.value, aliases)
        ):
            i = node.lineno
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


def test_lint_detector_catches_wrapped_and_aliased_forms(tmp_path):
    """Pin the round-11 ADVICE evasions: a line-wrapped chain, an
    aliased import, and a parenthesized receiver must all hit; a
    partitioned window and an unrelated DataFrame .orderBy must not."""
    src = (
        "from pyspark.sql import Window as W\n"
        "from pyspark.sql.window import Window\n"
        "def wrapped():\n"
        "    return (Window\n"
        "            .orderBy('x'))\n"
        "def aliased():\n"
        "    return W.orderBy('x')\n"
        "def instantiated():\n"
        "    return Window().orderBy('x')\n"
        "def qualified():\n"
        "    import pyspark.sql as psql\n"
        "    return psql.Window.orderBy('x')\n"
        "def partitioned():\n"
        "    return Window.partitionBy('g').orderBy('x')\n"
        "def dataframe_sort(df):\n"
        "    return df.orderBy('x')\n"
    )
    p = tmp_path / "snippet.py"
    p.write_text(src)
    assert _sites(str(p)) == {
        "wrapped", "aliased", "instantiated", "qualified"
    }


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
