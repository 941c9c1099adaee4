"""SCD2 dimension maintenance."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from wistia_video_analytics_project_spark.operators import scd

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 2, 1)
T2 = dt.datetime(2024, 3, 1)


@pytest.fixture()
def dim(spark):
    snap = spark.createDataFrame(
        [("m1", "YouTube", "Title A"), ("m2", "Wistia", "Title B")],
        "media_id string, channel string, title string",
    )
    return scd.scd2_init(snap, F.lit(T0))


def test_scd2_change_insert_noop(spark, dim):
    updates = spark.createDataFrame(
        [
            ("m1", "Facebook", "Title A"),   # channel changed -> new version
            ("m2", "Wistia", "Title B"),     # unchanged -> no-op
            ("m3", "Wistia", "Title C"),     # new key -> insert
        ],
        "media_id string, channel string, title string",
    )
    out = scd.scd2_apply(
        dim, updates, "media_id", ["channel", "title"], F.lit(T1)
    )
    rows = {(r.media_id, r.is_current): r for r in out.collect()}
    assert len(rows) == 4
    old_m1 = rows[("m1", False)]
    assert old_m1.channel == "YouTube" and old_m1.valid_to == T1
    new_m1 = rows[("m1", True)]
    assert new_m1.channel == "Facebook" and new_m1.valid_from == T1
    assert rows[("m2", True)].valid_from == T0  # untouched
    assert rows[("m3", True)].valid_from == T1


def test_scd2_idempotent_reapply(spark, dim):
    updates = spark.createDataFrame(
        [("m1", "Facebook", "Title A")],
        "media_id string, channel string, title string",
    )
    once = scd.scd2_apply(dim, updates, "media_id", ["channel", "title"], F.lit(T1))
    twice = scd.scd2_apply(once, updates, "media_id", ["channel", "title"], F.lit(T2))
    # second apply is a no-op: same attribute values
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_scd2_history_chain(spark, dim):
    u1 = spark.createDataFrame([("m1", "Facebook", "Title A")],
                               "media_id string, channel string, title string")
    u2 = spark.createDataFrame([("m1", "Instagram", "Title A")],
                               "media_id string, channel string, title string")
    s1 = scd.scd2_apply(dim, u1, "media_id", ["channel", "title"], F.lit(T1))
    s2 = scd.scd2_apply(s1, u2, "media_id", ["channel", "title"], F.lit(T2))
    m1 = sorted(
        [r for r in s2.collect() if r.media_id == "m1"],
        key=lambda r: r.valid_from,
    )
    assert [(r.channel, r.valid_to, r.is_current) for r in m1] == [
        ("YouTube", T1, False),
        ("Facebook", T2, False),
        ("Instagram", None, True),
    ]


def test_scd2_rejects_untracked_columns(spark):
    snap = spark.createDataFrame(
        [("m1", "YouTube", "x")], "media_id string, channel string, extra string"
    )
    d = scd.scd2_init(snap, F.lit(T0))
    u = spark.createDataFrame([("m1", "Wistia")], "media_id string, channel string")
    with pytest.raises(ValueError, match="non-tracked"):
        scd.scd2_apply(d, u, "media_id", ["channel"], F.lit(T1))


def test_cdc_apply_semantics(spark):
    from wistia_video_analytics_project_spark.operators import scd as scd_ops

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 1, "U"),      # update
            (3, "c", 1, "D"),       # delete
            (4, "d", 1, "I"),       # insert
            (2, "b3", 2, "U"),      # later update wins
        ],
        "k long, v string, seq long, op string",
    )
    got = {r.k: r.v for r in
           scd_ops.cdc_apply(base, changes, ["k"], "seq").collect()}
    assert got == {1: "a", 2: "b3", 4: "d"}


def test_cdc_apply_idempotent_replay(spark):
    from wistia_video_analytics_project_spark.operators import scd as scd_ops

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, "a2", 5, "U"), (2, "b", 6, "D"), (9, "z", 4, "I")],
        "k long, v string, seq long, op string",
    )
    once = scd_ops.cdc_apply(base, changes, ["k"], "seq")
    twice = scd_ops.cdc_apply(once, changes, ["k"], "seq")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_cdc_apply_update_then_delete_resolves_to_delete(spark):
    from wistia_video_analytics_project_spark.operators import scd as scd_ops

    base = spark.createDataFrame([(1, "a")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, "a2", 1, "U"), (1, "a2", 2, "D")],
        "k long, v string, seq long, op string",
    )
    assert scd_ops.cdc_apply(base, changes, ["k"], "seq").count() == 0


def test_cdc_apply_same_seq_tie_keeps_data(spark):
    """Contract violation (duplicate seq per key) must still resolve
    deterministically: the update outranks the delete on a tie."""
    from wistia_video_analytics_project_spark.operators import scd as scd_ops

    base = spark.createDataFrame([(1, "a")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, "a2", 7, "U"), (1, "a2", 7, "D")],
        "k long, v string, seq long, op string",
    )
    got = scd_ops.cdc_apply(base, changes, ["k"], "seq").collect()
    assert [(r.k, r.v) for r in got] == [(1, "a2")]
