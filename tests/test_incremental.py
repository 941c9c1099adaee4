"""Incremental run-folder source: watermark-driven delta reads."""

from __future__ import annotations

import datetime as dt
import json
import os

from wistia_video_analytics_project_spark import schemas
from wistia_video_analytics_project_spark.sources import incremental


def _write_run(base, name, records):
    d = os.path.join(base, name)
    os.makedirs(d)
    with open(os.path.join(d, "part-0.json"), "w") as f:
        json.dump(records, f)


def test_parse_run_ts():
    assert incremental.parse_run_ts("m1_20240101_020000") == dt.datetime(2024, 1, 1, 2)
    assert incremental.parse_run_ts("no-timestamp") is None
    assert incremental.parse_run_ts("bad_99999999_999999") is None


def test_list_new_run_folders(tmp_path):
    base = str(tmp_path / "media")
    for name in ["m1_20240101_020000", "m1_20240102_020000", "m1_20240103_020000",
                 "junk-folder"]:
        os.makedirs(os.path.join(base, name))
    got = incremental.list_new_run_folders(base, dt.datetime(2024, 1, 1, 12))
    assert [os.path.basename(p) for p in got] == [
        "m1_20240102_020000", "m1_20240103_020000"
    ]
    assert incremental.list_new_run_folders(str(tmp_path / "missing"), dt.datetime(2024, 1, 1)) == []


def test_read_new_runs_delta_only(spark, tmp_path):
    base = str(tmp_path / "media")
    _write_run(base, "m1_20240101_020000",
               [{"hashed_id": "old", "name": "Old", "created": 1}])
    _write_run(base, "m1_20240102_020000",
               [{"hashed_id": "new1", "name": "New 1", "created": 2}])
    _write_run(base, "m2_20240102_030000",
               [{"hashed_id": "new2", "name": "New 2", "created": 3}])

    df, folders, max_ts = incremental.read_new_runs(
        spark, base, dt.datetime(2024, 1, 1, 12), schemas.RAW_MEDIA
    )
    got = sorted(r.hashed_id for r in df.collect())
    assert got == ["new1", "new2"]  # the 0101 run is NOT re-read
    assert len(folders) == 2
    assert max_ts == dt.datetime(2024, 1, 2, 3)
    # provenance column present for downstream partition recovery
    assert "__run_folder" in df.columns


def test_read_new_runs_empty_delta(spark, tmp_path):
    base = str(tmp_path / "media")
    _write_run(base, "m1_20240101_020000", [{"hashed_id": "x", "name": "X", "created": 1}])
    df, folders, max_ts = incremental.read_new_runs(
        spark, base, dt.datetime(2024, 2, 1), schemas.RAW_MEDIA
    )
    assert df.count() == 0 and folders == [] and max_ts is None
    assert [f.name for f in df.schema.fields] == ["hashed_id", "name", "created"]
