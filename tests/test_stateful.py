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
