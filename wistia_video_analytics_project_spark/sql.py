"""SQL surface: the gold analytics layer as plain Spark SQL.

The reference serves its end-user queries as Power BI DAX measures over
the star schema (PDF guide p.33, Step 11.3; SURVEY.md §3.4). This module
is the same surface as SQL text over registered views — Catalyst compiles
these to the identical plans as the DataFrame forms in
``operators.analytics``, so users can pick either idiom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

STAR_VIEWS = ("dim_media", "dim_visitor", "fact_engagement")

#: DAX measure -> Spark SQL (SURVEY.md §3.4 mapping table)
GOLD_QUERIES: dict[str, str] = {
    # Total Plays = SUM(fact_engagement[play_count])
    "total_plays": "SELECT sum(play_count) AS total_plays FROM fact_engagement",
    # Avg Completion = AVERAGE(fact_engagement[watched_percent])
    "avg_completion": (
        "SELECT round(avg(avg_percent_watched), 2) AS avg_completion "
        "FROM fact_engagement"
    ),
    # Total Watch Hours = SUM(total_watch_time)/3600
    "total_watch_hours": (
        "SELECT round(sum(total_watch_time_seconds) / 3600.0, 2) "
        "AS total_watch_hours FROM fact_engagement"
    ),
    # Engagement Rate = DIVIDE(SUM(play_count), DISTINCTCOUNT(visitor_id))
    "engagement_rate": (
        "SELECT round(sum(play_count) / CAST(count(DISTINCT visitor_id) AS DOUBLE), 4) "
        "AS engagement_rate FROM fact_engagement"
    ),
    # Videos by Channel = COUNTROWS(dim_media) sliced by channel
    "videos_by_channel": (
        "SELECT channel, count(*) AS n_videos FROM dim_media "
        "GROUP BY channel"
    ),
    # report visuals (PDF p.34)
    "daily_plays_trend": (
        "SELECT date, sum(play_count) AS plays FROM fact_engagement "
        "GROUP BY date ORDER BY date"
    ),
    "plays_by_channel": (
        "SELECT m.channel, sum(f.play_count) AS plays "
        "FROM fact_engagement f JOIN dim_media m USING (media_id) "
        "GROUP BY m.channel"
    ),
    "top10_videos": (
        "SELECT m.media_id, m.title, sum(f.play_count) AS plays "
        "FROM fact_engagement f JOIN dim_media m USING (media_id) "
        "GROUP BY m.media_id, m.title "
        "ORDER BY plays DESC, m.media_id LIMIT 10"
    ),
    "top_countries": (
        "SELECT v.country, sum(f.play_count) AS plays, "
        "round(sum(f.total_watch_time_seconds) / 3600.0, 2) AS watch_hours "
        "FROM fact_engagement f JOIN dim_visitor v USING (visitor_id) "
        "GROUP BY v.country"
    ),
    "new_vs_returning": (
        "WITH firsts AS (SELECT visitor_id, min(date) AS first_date "
        "                FROM fact_engagement GROUP BY visitor_id) "
        "SELECT f.date, "
        "       CASE WHEN f.date = x.first_date THEN 'new' ELSE 'returning' END "
        "         AS visitor_status, "
        "       count(DISTINCT f.visitor_id) AS visitors "
        "FROM fact_engagement f JOIN firsts x USING (visitor_id) "
        "GROUP BY 1, 2"
    ),
}


def register_testdata(spark: SparkSession, sf_dir: str) -> None:
    """Expose every driver testdata table as a temp view so the whole
    engine surface is reachable from plain ``spark.sql`` too."""
    from .sources import load_tables

    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def register_star_schema(
    spark: SparkSession,
    dim_media: DataFrame,
    dim_visitor: DataFrame,
    fact_engagement: DataFrame,
) -> None:
    """Expose the star schema as temp views for the SQL surface."""
    dim_media.createOrReplaceTempView("dim_media")
    dim_visitor.createOrReplaceTempView("dim_visitor")
    fact_engagement.createOrReplaceTempView("fact_engagement")


def run_gold(spark: SparkSession, name: str) -> DataFrame:
    """Run one named gold query against the registered views."""
    return spark.sql(GOLD_QUERIES[name])
