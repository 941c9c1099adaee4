"""Count-min sketch: one-sided error, heavy-hitter completeness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wistia_video_analytics_project_spark.operators import sketch


@pytest.fixture(scope="module")
def skewed(spark):
    # 'hot' x500, 'warm' x80, 200 singleton keys
    rows = (
        [("hot",)] * 500 + [("warm",)] * 80 + [(f"cold{i}",) for i in range(200)]
    )
    return spark.createDataFrame(rows, "k string")


def test_cms_one_sided_error(spark, skewed):
    s = sketch.cms_build(skewed, "k")
    keys = skewed.select("k").distinct()
    est = {r.k: r.est_count for r in sketch.cms_estimate(s, keys, "k").collect()}
    exact = {r.k: r.n for r in skewed.groupBy("k").agg(F.count("*").alias("n")).collect()}
    n_total = sum(exact.values())
    for k, true_n in exact.items():
        assert est[k] >= true_n  # never underestimates
        assert est[k] <= true_n + 0.01 * n_total + 5  # far under the eps*N bound here


def test_cms_sketch_is_small(spark, skewed):
    s = sketch.cms_build(skewed, "k")
    assert s.count() <= sketch.DEFAULT_DEPTH * sketch.DEFAULT_WIDTH


def test_heavy_hitters_exact_and_complete(spark, skewed):
    got = {r.k: r.exact_count
           for r in sketch.heavy_hitters(skewed, "k", min_count=50).collect()}
    assert got == {"hot": 500, "warm": 80}  # exact counts, no false positives
    got2 = {r.k for r in sketch.heavy_hitters(skewed, "k", min_count=400).collect()}
    assert got2 == {"hot"}


def test_hll_rolling_distinct_accuracy(spark):
    """Sketch-union rolling distinct tracks the exact sliding distinct
    within HLL error, without re-scanning raw events."""
    from wistia_video_analytics_project_spark.operators import analytics
    from wistia_video_analytics_project_spark.session import configure_runtime
    from wistia_video_analytics_project_spark.sources import load_table

    configure_runtime(spark)
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    daily = events.select(F.to_date("ts").alias("day"), "user_id")
    exact = {r.day: r.n_distinct for r in analytics.sliding_distinct(
        daily, "day", "user_id", 7).collect()}
    sk = sketch.daily_hll_sketches(daily, "day", "user_id")
    approx = {r.day: r.approx_distinct
              for r in sketch.hll_rolling_distinct(sk, 7).collect()}
    assert set(approx) == set(exact)
    for d, n in exact.items():
        assert abs(approx[d] - n) / max(n, 1) < 0.06, (d, n, approx[d])


def test_kll_merged_quantiles_close_to_exact(spark):
    from wistia_video_analytics_project_spark.operators import sketch
    from wistia_video_analytics_project_spark.session import configure_runtime
    from wistia_video_analytics_project_spark.sources import load_table

    configure_runtime(spark)
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    daily = events.select(F.to_date("ts").alias("day"), "value")
    sk = sketch.daily_kll_sketches(daily, "day", "value")
    approx = sketch.kll_quantiles_over_all(sk, (0.5, 0.9)).collect()[0]
    exact = events.agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
    ).collect()[0]
    # KLL guarantees rank error, not value error: compare by rank
    n = events.count()
    for name in ("p50", "p90"):
        rank_exact = events.filter(F.col("value") <= exact[name]).count() / n
        rank_approx = events.filter(F.col("value") <= approx[name]).count() / n
        assert abs(rank_exact - rank_approx) < 0.03, (name, rank_exact, rank_approx)


def test_theta_segment_overlap_close_to_exact(spark):
    from wistia_video_analytics_project_spark.operators import sketch
    from wistia_video_analytics_project_spark.session import configure_runtime
    from wistia_video_analytics_project_spark.sources import load_table

    configure_runtime(spark)
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    got = sketch.segment_overlap_theta(
        events, "user_id",
        F.col("event_type") == "view", F.col("event_type") == "purchase",
    ).collect()[0]
    viewers = {r.user_id for r in
               events.filter("event_type = 'view'").select("user_id").distinct().collect()}
    buyers = {r.user_id for r in
              events.filter("event_type = 'purchase'").select("user_id").distinct().collect()}
    def close(a, b):
        return abs(a - b) / max(b, 1) < 0.05
    assert close(got.n_a, len(viewers))
    assert close(got.n_b, len(buyers))
    assert close(got.n_both, len(viewers & buyers))
    assert close(got.n_either, len(viewers | buyers))
    assert close(got.n_only_a, len(viewers - buyers))
