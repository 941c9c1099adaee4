"""Custom stateful streaming operators (applyInPandasWithState)."""

from __future__ import annotations

import datetime as dt
import math
import os
import time

import pytest
from pyspark.sql import types as T

from wistia_video_analytics_project_spark.streaming import jobs, stateful

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

T0 = dt.datetime(2024, 1, 1, 10, 0)


def _write_batches(spark, tmp_path, batches):
    path = tmp_path / "stream"
    path.mkdir()
    for i, rows in enumerate(batches):
        f = str(path / f"b{i}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(f)
        mtime = time.time() - 100 + i * 10
        for root, _, files in os.walk(f):
            for name in files:
                os.utime(os.path.join(root, name), (mtime, mtime))
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(path))
    )


def test_running_engagement_score_decays_across_batches(spark, tmp_path):
    stream = _write_batches(
        spark,
        tmp_path,
        [
            [(T0, 1, 10.0)],
            [(T0 + dt.timedelta(hours=1), 1, 4.0)],  # one half-life later
        ],
    )
    out = stateful.running_engagement_score(stream, half_life_s=3600.0)
    jobs.run_to_memory_sink(out, "scores", output_mode="append")
    rows = sorted(
        spark.sql("SELECT * FROM scores").collect(), key=lambda r: r.batch_max_ts
    )
    assert [r.n_events for r in rows] == [1, 1]
    assert rows[0].score == 10.0
    # 10 decayed by exactly one half-life (=5) plus the new 4
    assert rows[1].score == pytest.approx(10.0 * 0.5 + 4.0, abs=1e-6)


def test_streaming_sessionize_emits_closed_sessions(spark, tmp_path):
    stream = _write_batches(
        spark,
        tmp_path,
        [
            [(T0, 1, 1.0), (T0 + dt.timedelta(minutes=10), 1, 1.0)],
            # 40-min gap since the last event -> closes session 1
            [(T0 + dt.timedelta(minutes=50), 1, 1.0)],
        ],
    )
    out = stateful.streaming_sessionize(stream, gap_s=1800.0)
    jobs.run_to_memory_sink(out, "sessions", output_mode="append")
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert len(rows) == 1  # only the CLOSED session is emitted
    r = rows[0]
    assert r.n_events == 2
    assert r.session_start == T0
    assert r.session_end == T0 + dt.timedelta(minutes=10)


@pytest.mark.skipif(
    not stateful.HAVE_TWS_DEPS,
    reason="transformWithState needs protobuf (state-server protocol), "
    "absent in this container",
)
def test_transform_with_state_lifetime_stats(spark, tmp_path):
    """Spark-4 transformWithStateInPandas: ValueState accumulates across
    micro-batches; each batch emits the updated per-key snapshot."""
    stream = _write_batches(
        spark,
        tmp_path,
        [
            [(T0, 1, 10.0), (T0, 2, 1.0)],
            [(T0 + dt.timedelta(minutes=5), 1, 2.5)],
        ],
    )
    out = stateful.lifetime_engagement_stats(stream)
    jobs.run_to_memory_sink(out, "lifetime_out", output_mode="update")
    rows = spark.sql("SELECT * FROM lifetime_out").collect()
    snapshots = sorted((r.user_id, r.n_events, r.total_value) for r in rows)
    # batch 1: user1 (1, 10.0), user2 (1, 1.0); batch 2: user1 -> (2, 12.5)
    assert (1, 1, 10.0) in snapshots
    assert (1, 2, 12.5) in snapshots  # state carried across batches
    assert (2, 1, 1.0) in snapshots
