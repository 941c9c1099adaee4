"""Z-order clustering: measured row-group/file pruning, not assumed."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from wistia_video_analytics_project_spark.operators import scale

LO, HI = 0, 1024
BOX = (100, 228)  # selective range in BOTH dimensions (~12.5% per dim)


def _grid(spark):
    # two independent uniform dimensions: every (x, y) cell once
    return spark.range(HI * HI).select(
        (F.col("id") % HI).alias("x"),
        F.floor(F.col("id") / HI).alias("y"),
        F.col("id").alias("payload"),
    )


def _overlap_fraction(path: str) -> float:
    """Fraction of row groups whose [min, max] stats intersect BOX on
    both x and y — exactly what a stats-based reader must scan."""
    lo, hi = BOX
    total = overlapping = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            sx = md.row_group(rg).column(names["x"]).statistics
            sy = md.row_group(rg).column(names["y"]).statistics
            if sx.min < hi and sx.max >= lo and sy.min < hi and sy.max >= lo:
                overlapping += 1
    assert total > 8, f"layout produced too few row groups ({total}) to measure"
    return overlapping / total


def test_zorder_prunes_2d_boxes_better_than_linear_sort(spark, tmp_path):
    df = _grid(spark)
    bounds = [("x", LO, HI), ("y", LO, HI)]

    rg = 64 * 1024  # small row groups: enough stats granularity to measure

    z_path = str(tmp_path / "zord")
    scale.write_zordered(df, z_path, bounds, bits=10, n_files=16, row_group_bytes=rg)

    lin_path = str(tmp_path / "linear")
    (df.repartitionByRange(16, "x")
       .sortWithinPartitions("x")
       .write.mode("overwrite").option("parquet.block.size", str(rg))
       .parquet(lin_path))

    z_frac = _overlap_fraction(z_path)
    lin_frac = _overlap_fraction(lin_path)
    # linear layout prunes x only: every surviving x-stripe spans all y.
    # z-order clusters both dims, so a 2D box touches far fewer groups.
    assert z_frac < lin_frac / 2, (z_frac, lin_frac)

    # correctness: clustering is layout-only
    lo, hi = BOX
    want = (hi - lo) * (hi - lo)
    got = (
        spark.read.parquet(z_path)
        .filter((F.col("x") >= lo) & (F.col("x") < hi)
                & (F.col("y") >= lo) & (F.col("y") < hi))
        .count()
    )
    assert got == want


def test_zorder_key_locality_beats_concatenation(spark):
    """Neighbors in 2D space land near each other on the Z-curve: the
    max key distance between adjacent cells is bounded far below the
    keyspace, unlike (x << bits | y) ordering where stepping x jumps the
    whole y range."""
    df = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), F.floor(F.col("id") / 64).alias("y")
    )
    out = df.select(
        "x", "y", scale.zorder_key([("x", 0, 64), ("y", 0, 64)], bits=6).alias("z")
    ).collect()
    zmap = {(r.x, r.y): r.z for r in out}
    # interleave is a bijection on the grid
    assert len(set(zmap.values())) == 64 * 64
    assert min(zmap.values()) == 0 and max(zmap.values()) == 64 * 64 - 1
    # distinct cells -> distinct keys, identical cell -> identical key
    assert zmap[(0, 0)] == 0
    # bit interleave property: (1,0) and (0,1) are the two lowest bits
    assert {zmap[(1, 0)], zmap[(0, 1)]} == {1, 2}


def test_zorder_key_validates_args(spark):
    with pytest.raises(ValueError):
        scale.zorder_key([])
    with pytest.raises(ValueError):
        scale.zorder_key([("x", 0, 1)] * 4, bits=16)  # 64 bits > signed long
    with pytest.raises(ValueError):
        scale.zorder_key([("x", 5, 5)])
