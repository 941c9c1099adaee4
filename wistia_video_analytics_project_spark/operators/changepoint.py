"""Offline changepoint detection by binary segmentation.

The classic recursive mean-shift segmenter (Scott & Knott / the
textbook binary-segmentation algorithm behind `ruptures.Binseg`):
at each level, every current segment is split at the point maximizing
the between-segment SSE reduction

    gain(k) = S_L²/n_L + S_R²/n_R − S²/n

and the recursion continues on both halves.  Complements the CUSUM
single-changepoint query (`cusum_changepoint`) with a multi-change
hierarchy.

Engine-parity design (CLAUDE.md cumulative-stats rule): the series
values are EXACT integers (cents), prefix sums are integer window
sums, and every gain is assembled elementwise from those integers cast
to double — division and multiplication are correctly rounded, so both
engines compute bit-identical gain doubles and the argmax (gain desc,
index asc tiebreak) picks the same split everywhere.

Scale shape: the input series is a BOUNDED per-key aggregate (one row
per day), so each level is two window passes over n rows — no
data-sized shuffle, no driver loop over rows.  Levels chain lazily
(2-4 levels = one action); the per-level segment relabel is a
broadcast join against the ≤2^level chosen splits.

No counterpart in the reference repo; extends the trend/anomaly tier
(CUSUM, MAD outliers, Theil-Sen, Mann-Kendall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["binary_segmentation"]


def binary_segmentation(
    series: DataFrame,
    idx_col: str = "idx",
    val_col: str = "val",
    depth: int = 2,
) -> DataFrame:
    """Depth-``depth`` binary segmentation over an integer-valued
    series ``(idx_col, val_col)`` (idx dense 1..n, val exact integer).

    Returns one row per accepted split: ``(level, seg, cp_idx, gain)``
    where ``seg`` is the level-local segment label the split occurred
    in, ``cp_idx`` is the LAST index of the left half, and ``gain`` is
    the SSE reduction in squared value units (bit-identical across
    engines — see module docstring).  Segments shorter than 2 points
    produce no split."""
    if int(depth) < 1:
        raise ValueError(
            f"binary_segmentation requires depth >= 1, got {depth}"
        )
    cur = series.select(
        F.col(idx_col).alias("idx"),
        F.col(val_col).cast("long").alias("val"),
        F.lit(0).alias("seg"),
    )
    out: DataFrame | None = None
    for level in range(1, int(depth) + 1):
        w_seg = Window.partitionBy("seg")
        w_pre = w_seg.orderBy("idx").rowsBetween(
            Window.unboundedPreceding, 0
        )
        stats = cur.select(
            "idx",
            "val",
            "seg",
            F.sum("val").over(w_pre).alias("__cum"),
            F.row_number().over(w_seg.orderBy("idx")).alias("__k"),
            F.sum("val").over(w_seg).alias("__tot"),
            F.count(F.lit(1)).over(w_seg).alias("__n"),
        )
        cand = stats.filter(F.col("__k") < F.col("__n"))
        sl = F.col("__cum").cast("double")
        sr = (F.col("__tot") - F.col("__cum")).cast("double")
        nl = F.col("__k").cast("double")
        nr = (F.col("__n") - F.col("__k")).cast("double")
        tot = F.col("__tot").cast("double")
        n = F.col("__n").cast("double")
        gain = sl * sl / nl + sr * sr / nr - tot * tot / n
        scored = cand.select(
            "seg", "idx", gain.alias("gain")
        )
        w_best = Window.partitionBy("seg").orderBy(
            F.desc("gain"), F.asc("idx")
        )
        best = (
            scored.withColumn("__r", F.row_number().over(w_best))
            .filter(F.col("__r") == 1)
            .select(
                F.lit(level).alias("level"),
                "seg",
                F.col("idx").alias("cp_idx"),
                "gain",
            )
        )
        out = best if out is None else out.unionByName(best)
        cur = (
            cur.join(
                F.broadcast(
                    best.select("seg", F.col("cp_idx").alias("__cp"))
                ),
                "seg",
                "left",
            )
            .select(
                "idx",
                "val",
                (
                    F.col("seg") * 2
                    + F.when(
                        F.col("__cp").isNotNull()
                        & (F.col("idx") > F.col("__cp")),
                        1,
                    ).otherwise(0)
                ).alias("seg"),
            )
        )
    assert out is not None
    return out
