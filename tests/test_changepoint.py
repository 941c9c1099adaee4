"""Binary segmentation: brute-force reference parity and planted
changepoint recovery."""

from __future__ import annotations

import numpy as np
import pytest

from wistia_video_analytics_project_spark.operators import changepoint


def _brute_splits(vals: list[int], depth: int):
    """Reference: same algorithm, plain numpy, same tiebreak (gain
    desc, index asc)."""
    out = []

    def gain_curve(seg: np.ndarray):
        n = len(seg)
        cum = np.cumsum(seg, dtype=np.float64)
        tot = cum[-1]
        k = np.arange(1, n, dtype=np.float64)
        sl = cum[:-1].astype(np.float64)
        return sl * sl / k + (tot - sl) ** 2 / (n - k) - tot * tot / n

    segments = {0: (0, len(vals))}  # seg -> [start, end) in 0-based idx
    arr = np.asarray(vals, dtype=np.int64)
    for level in range(1, depth + 1):
        nxt = {}
        for seg in sorted(segments):
            start, end = segments[seg]
            if end - start < 2:
                nxt[seg * 2] = (start, end)
                continue
            g = gain_curve(arr[start:end])
            best = int(np.argmax(g))  # first max = smallest index
            cp0 = start + best  # 0-based index of last-left element
            out.append((level, seg, cp0 + 1, float(g[best])))
            nxt[seg * 2] = (start, cp0 + 1)
            nxt[seg * 2 + 1] = (cp0 + 1, end)
        segments = nxt
    return out


def _series_df(spark, vals):
    return spark.createDataFrame(
        [(i + 1, v) for i, v in enumerate(vals)], "idx long, val long"
    )


def test_binseg_matches_bruteforce_reference(spark):
    # deterministic wiggly series with two planted shifts
    vals = [100 + ((i * 37) % 11) for i in range(30)]
    vals += [180 + ((i * 23) % 13) for i in range(25)]
    vals += [60 + ((i * 31) % 7) for i in range(20)]
    got = sorted(
        (r["level"], r["seg"], r["cp_idx"], r["gain"])
        for r in changepoint.binary_segmentation(
            _series_df(spark, vals), depth=2
        ).collect()
    )
    want = sorted(_brute_splits(vals, 2))
    assert [(a, b, c) for a, b, c, _ in got] == [
        (a, b, c) for a, b, c, _ in want
    ]
    for (_, _, _, gg), (_, _, _, wg) in zip(got, want):
        assert gg == pytest.approx(wg, rel=1e-12)


def test_binseg_recovers_planted_level1_shift(spark):
    vals = [10] * 40 + [200] * 35
    rows = changepoint.binary_segmentation(
        _series_df(spark, vals), depth=1
    ).collect()
    assert len(rows) == 1
    assert rows[0]["cp_idx"] == 40


def test_binseg_short_segments_produce_no_split(spark):
    # depth 2 on a 3-point series: level 1 splits, at most one level-2
    # segment is long enough
    rows = changepoint.binary_segmentation(
        _series_df(spark, [5, 5, 100]), depth=2
    ).collect()
    levels = sorted(r["level"] for r in rows)
    assert levels[0] == 1
    assert len(rows) <= 2


def test_binseg_depth_zero_rejected(spark):
    """depth < 1 is a usage error, not an AssertionError (round-7
    ADVICE): validated up front with a clear message."""
    df = spark.createDataFrame([(1, 10), (2, 20)], "idx long, val long")
    with pytest.raises(ValueError, match="depth >= 1"):
        changepoint.binary_segmentation(df, depth=0)
    with pytest.raises(ValueError, match="depth >= 1"):
        changepoint.binary_segmentation(df, depth=-3)
