"""Manifest-committed snapshot publishing (sinks.publish_snapshot)."""
from __future__ import annotations

import json
import os

import pytest

from wistia_video_analytics_project_spark import sinks


def _df(spark, n, tag):
    return spark.range(n).selectExpr(
        "id", f"'{tag}' AS tag", "CAST(id * 2 AS DOUBLE) AS val"
    )


def test_publish_and_read_latest(spark, tmp_path):
    base = str(tmp_path / "snap")
    m1 = sinks.publish_snapshot(_df(spark, 10, "v1"), base, 1, zone_cols=["id"])
    m2 = sinks.publish_snapshot(_df(spark, 25, "v2"), base, 2, zone_cols=["id"])
    assert m1["rows"] == 10 and m2["rows"] == 25
    assert m2["zone_stats"]["id"] == {"min": 0, "max": 24}
    assert sinks.snapshot_versions(base) == [1, 2]
    latest = sinks.read_snapshot(spark, base, verify=True)
    assert latest.count() == 25
    assert latest.select("tag").distinct().collect()[0][0] == "v2"
    old = sinks.read_snapshot(spark, base, version=1, verify=True)
    assert old.count() == 10


def test_uncommitted_version_is_invisible(spark, tmp_path):
    """A version directory without a manifest (torn job) must never be
    resolved as latest."""
    base = str(tmp_path / "snap")
    sinks.publish_snapshot(_df(spark, 5, "good"), base, 1)
    # simulate a torn write: data present, no manifest
    _df(spark, 99, "torn").write.parquet(os.path.join(base, "v=000002"))
    assert sinks.snapshot_versions(base) == [1]
    df = sinks.read_snapshot(spark, base)
    assert df.count() == 5
    with pytest.raises(FileNotFoundError, match="not committed"):
        sinks.read_snapshot(spark, base, version=2)


def test_verify_detects_tampering(spark, tmp_path):
    base = str(tmp_path / "snap")
    sinks.publish_snapshot(_df(spark, 8, "x"), base, 1)
    # tamper with the manifest row count
    mpath = os.path.join(base, "v=000001", "_MANIFEST.json")
    manifest = json.load(open(mpath))
    manifest["rows"] = 999
    json.dump(manifest, open(mpath, "w"))
    with pytest.raises(ValueError, match="row count"):
        sinks.read_snapshot(spark, base, verify=True)
    # unverified read still works (trusts the data)
    assert sinks.read_snapshot(spark, base).count() == 8


def test_versions_are_immutable(spark, tmp_path):
    base = str(tmp_path / "snap")
    sinks.publish_snapshot(_df(spark, 3, "a"), base, 7)
    with pytest.raises(Exception):
        sinks.publish_snapshot(_df(spark, 4, "b"), base, 7)


def test_partitioned_snapshot_roundtrip(spark, tmp_path):
    base = str(tmp_path / "snap")
    df = spark.range(20).selectExpr("id", "id % 2 AS part")
    m = sinks.publish_snapshot(df, base, 1, partition_by=["part"])
    assert m["partition_by"] == ["part"]
    back = sinks.read_snapshot(spark, base, verify=True)
    assert back.count() == 20
    assert {r["part"] for r in back.select("part").distinct().collect()} == {0, 1}


def test_empty_snapshot_publishes(spark, tmp_path):
    base = str(tmp_path / "snap")
    m = sinks.publish_snapshot(_df(spark, 0, "e"), base, 1, zone_cols=["id"])
    assert m["rows"] == 0
    assert m["zone_stats"]["id"]["min"] is None
    assert sinks.read_snapshot(spark, base, verify=True).count() == 0


def test_publish_next_snapshot_advances_and_skips_wreckage(spark, tmp_path):
    base = str(tmp_path / "snap")
    m1 = sinks.publish_next_snapshot(_df(spark, 3, "a"), base)
    m2 = sinks.publish_next_snapshot(_df(spark, 4, "b"), base)
    assert (m1["version"], m2["version"]) == (1, 2)
    # torn attempt at v3 (no manifest): next publish must skip it
    _df(spark, 9, "torn").write.parquet(os.path.join(base, "v=000003"))
    m3 = sinks.publish_next_snapshot(_df(spark, 5, "c"), base)
    assert m3["version"] == 4
    assert sinks.snapshot_versions(base) == [1, 2, 4]
    assert sinks.read_snapshot(spark, base, verify=True).count() == 5
