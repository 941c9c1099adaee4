"""SQL gold surface over the star schema built from fixtures."""

from __future__ import annotations

import datetime as dt

import pytest

from wistia_video_analytics_project_spark import schemas, sql
from wistia_video_analytics_project_spark.operators import model

RUN_TS = dt.datetime(2024, 6, 1)


@pytest.fixture(scope="module")
def star(spark):
    ev = lambda t: {"type": "play", "time": t, "duration_watched": 30.0,
                    "percent_watched": 60.0}
    day1, day2 = 1704067200, 1704153600
    media = spark.createDataFrame(
        [("m1", "YouTube intro", 1700000000), ("m2", "plain video", 1700000100)],
        schemas.RAW_MEDIA,
    )
    visitors = spark.createDataFrame(
        [
            ("v1", "1.1.1.1", "US", "m1", [ev(day1), ev(day1 + 60)]),
            ("v2", "2.2.2.2", "DE", "m1", [ev(day2)]),
            ("v1", "1.1.1.1", "US", "m2", [ev(day2)]),
        ],
        schemas.RAW_VISITOR,
    )
    dm = model.build_dim_media(media, RUN_TS)
    dv = model.build_dim_visitor(visitors, RUN_TS)
    fact = model.build_fact_engagement(visitors, RUN_TS)
    sql.register_star_schema(spark, dm, dv, fact)
    return dm, dv, fact


def test_gold_kpis(spark, star):
    assert sql.run_gold(spark, "total_plays").collect()[0].total_plays == 4
    assert sql.run_gold(spark, "avg_completion").collect()[0].avg_completion == 60.0
    hours = sql.run_gold(spark, "total_watch_hours").collect()[0].total_watch_hours
    assert hours == round(4 * 30.0 / 3600.0, 2)
    rate = sql.run_gold(spark, "engagement_rate").collect()[0].engagement_rate
    assert rate == round(4 / 2.0, 4)  # 4 plays / 2 distinct visitors


def test_gold_slices(spark, star):
    channels = {r.channel: r.n_videos
                for r in sql.run_gold(spark, "videos_by_channel").collect()}
    assert channels == {"YouTube": 1, "Wistia": 1}
    top = sql.run_gold(spark, "top10_videos").collect()
    assert top[0].media_id == "m1" and top[0].plays == 3
    trend = sql.run_gold(spark, "daily_plays_trend").collect()
    assert [(str(r.date), r.plays) for r in trend] == [
        ("2024-01-01", 2), ("2024-01-02", 2)]
    nvr = {(str(r.date), r.visitor_status): r.visitors
           for r in sql.run_gold(spark, "new_vs_returning").collect()}
    assert nvr == {("2024-01-01", "new"): 1, ("2024-01-02", "new"): 1,
                   ("2024-01-02", "returning"): 1}


def test_all_gold_queries_run(spark, star):
    for name in sql.GOLD_QUERIES:
        assert sql.run_gold(spark, name).collect() is not None


def test_register_testdata_sql_surface(spark):
    from conftest import SF_SMOKE

    sql.register_testdata(spark, SF_SMOKE)
    got = spark.sql(
        "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).collect()[0].n
    assert got > 0
    # events view carries the micros-converted timestamp (nanos handled)
    assert spark.sql("SELECT max(ts) FROM events").collect()[0][0] is not None


def test_sql_scripting_bisection_threshold(spark):
    """SQL-scripting WHILE bisection converges to the order statistic:
    largest integer-cent T with count(cents > T) >= N equals the N-th
    largest cents - 1."""
    from wistia_video_analytics_project_spark.operators import analytics
    from wistia_video_analytics_project_spark.sources import load_table

    from conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders")
    orders.createOrReplaceTempView("__orders_bisect")
    n = 25
    got = analytics.bisect_threshold_script(
        spark, "__orders_bisect", "o_totalprice", n
    )
    cents = sorted(
        (int(r[0]) for r in orders.selectExpr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
        ).collect()),
        reverse=True,
    )
    assert got == cents[n - 1] - 1
    # verify the defining property directly
    assert sum(1 for c in cents if c > got) >= n
    assert sum(1 for c in cents if c > got + 1) < n
    # infeasible target -> None
    assert (
        analytics.bisect_threshold_script(
            spark, "__orders_bisect", "o_totalprice", 10**9
        )
        is None
    )
