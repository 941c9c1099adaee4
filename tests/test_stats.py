"""Statistical queries vs direct numpy references.

The oracle gate proves Spark and DuckDB agree; these tests prove the
shared FORMULA is right — each statistic is recomputed from the raw
parquet with an independent in-memory implementation (textbook
definitions, not the query's algebra) and compared to the query output.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod
from conftest import SF_SMOKE


def _events() -> pd.DataFrame:
    df = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    # NANOS timestamps load as datetime64[ns] in pandas — already usable
    return df


def _orders() -> pd.DataFrame:
    return pq.read_table(f"{SF_SMOKE}/orders.parquet").to_pandas()


def test_mann_whitney_matches_textbook(spark):
    orders = _orders()
    a = orders.loc[
        orders.o_orderpriority.isin(["1-URGENT", "2-HIGH"]), "o_totalprice"
    ].to_numpy()
    b = orders.loc[
        ~orders.o_orderpriority.isin(["1-URGENT", "2-HIGH"]), "o_totalprice"
    ].to_numpy()
    # textbook midrank U: rank the pooled sample, U1 = R1 - n1(n1+1)/2
    pooled = np.concatenate([a, b])
    uniq, inv, cnt = np.unique(pooled, return_inverse=True, return_counts=True)
    before = np.cumsum(cnt) - cnt
    midrank = before + (cnt + 1) / 2.0  # 1-based
    r = midrank[inv]
    n1, n2 = len(a), len(b)
    u1 = r[:n1].sum() - n1 * (n1 + 1) / 2.0
    big_t = float((cnt.astype(np.float64) ** 3 - cnt).sum())
    nn = n1 + n2
    sigma = np.sqrt(
        n1 * n2 / 12.0 * ((nn + 1.0) - big_t / (nn * (nn - 1.0)))
    )
    z = (u1 - n1 * n2 / 2.0) / sigma

    row = entrymod.queries()["mann_whitney_order_values"](spark, SF_SMOKE).collect()[0]
    assert row["n_a"] == n1 and row["n_b"] == n2
    assert row["u_statistic"] == pytest.approx(u1, abs=0.51)
    assert row["sigma_u"] == pytest.approx(sigma, abs=1e-3)
    assert row["z_score"] == pytest.approx(z, abs=1e-3)


def test_chi_square_matches_textbook(spark):
    ev = _events()
    dow = ev.ts.dt.dayofweek + 1  # pandas Monday=0 -> isodow
    table = pd.crosstab(ev.event_type, dow)
    o = table.to_numpy(dtype=np.float64)
    e = np.outer(o.sum(axis=1), o.sum(axis=0)) / o.sum()
    chi2 = ((o - e) ** 2 / e).sum()

    row = entrymod.queries()["chi_square_type_weekday"](spark, SF_SMOKE).collect()[0]
    assert row["n_events"] == int(o.sum())
    assert row["n_cells"] == o.size
    assert row["chi2"] == pytest.approx(chi2, abs=1e-3)


def test_kaplan_meier_matches_textbook(spark):
    ev = _events()
    g = ev.groupby("user_id")
    first = g.ts.min().dt.normalize()
    last = g.ts.max().dt.normalize()
    purch = ev[ev.event_type == "purchase"].groupby("user_id").ts.min().dt.normalize()
    t = pd.Series(index=first.index, dtype="float64")
    observed = first.index.isin(purch.index)
    t[observed] = (purch - first[purch.index]).dt.days
    t[~observed] = (last[~observed] - first[~observed]).dt.days
    t = t.to_numpy()
    obs = np.asarray(observed)

    # textbook product-limit over event times
    surv = {}
    s = 1.0
    for ti in np.sort(np.unique(t[obs])):
        n_i = int((t >= ti).sum())
        d_i = int(((t == ti) & obs).sum())
        s *= 1.0 - d_i / n_i
        surv[int(ti)] = s

    got = {
        r["t"]: r
        for r in entrymod.queries()["purchase_survival_km"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(surv)
    for ti, s_ref in surv.items():
        assert got[ti]["survival"] == pytest.approx(s_ref, abs=1e-5), ti
        assert got[ti]["n_at_risk"] == int((t >= ti).sum())


def test_ab_test_matches_textbook(spark):
    ev = _events()
    g = ev.groupby("user_id")
    first = g.ts.min()
    purch = ev[ev.event_type == "purchase"].groupby("user_id").ts.min()
    conv = pd.Series(0, index=first.index)
    joined = purch.reindex(first.index)
    conv[(joined - first) <= pd.Timedelta(days=3)] = 1
    variant_a = first.index.to_numpy() % 2 == 0
    n1, n2 = int(variant_a.sum()), int((~variant_a).sum())
    c1, c2 = int(conv[variant_a].sum()), int(conv[~variant_a].sum())
    p1, p2 = c1 / n1, c2 / n2
    pooled = (c1 + c2) / (n1 + n2)
    se = np.sqrt(pooled * (1 - pooled) * (1 / n1 + 1 / n2))
    z = (p2 - p1) / se

    row = entrymod.queries()["ab_test_report"](spark, SF_SMOKE).collect()[0]
    assert (row["n_a"], row["n_b"], row["conv_a"], row["conv_b"]) == (
        n1, n2, c1, c2,
    )
    assert row["z_score"] == pytest.approx(z, abs=1e-3)
    assert row["significant"] == (abs(round(z, 4)) > 1.96)


def test_decomposition_additive_identity(spark):
    """revenue - trend - seasonal - remainder == 0 wherever the trend is
    defined (the decomposition is additive BY CONSTRUCTION; rounding at
    4 decimals bounds the residual)."""
    rows = entrymod.queries()["daily_revenue_decomposition"](
        spark, SF_SMOKE
    ).collect()
    assert rows, "no purchase days"
    n_defined = 0
    for r in rows:
        if r["trend"] is None:
            assert r["remainder"] is None
            continue
        n_defined += 1
        resid = r["revenue"] - r["trend"] - r["seasonal"] - r["remainder"]
        assert abs(resid) < 5e-4, r
    assert n_defined > 0
    # edge days (first/last 3) have no full centered window
    assert rows[0]["trend"] is None and rows[-1]["trend"] is None


def test_decomposition_trend_is_7day_mean(spark):
    rows = entrymod.queries()["daily_revenue_decomposition"](
        spark, SF_SMOKE
    ).collect()
    by_day = {r["day"]: r for r in rows}
    days = sorted(by_day)
    for i, d in enumerate(days):
        window = [
            by_day[x]["revenue"]
            for x in days
            if abs((x - d).days) <= 3
        ]
        r = by_day[d]
        if len(window) == 7 and all(
            (x - d).days in range(-3, 4)
            for x in days
            if abs((x - d).days) <= 3
        ):
            if r["trend"] is not None:
                assert r["trend"] == pytest.approx(
                    sum(window) / 7.0, abs=1e-3
                ), d


def test_ar2_matches_numpy_lstsq(spark):
    """The closed-form Cramer solution must equal numpy's least-squares
    fit of the same lagged design matrix."""
    import numpy as np

    import __spark_entry__ as entrymod
    from conftest import SF_SMOKE

    row = entrymod.q_ar2_revenue_forecast(spark, SF_SMOKE).collect()[0]
    # rebuild the daily series independently with plain SQL
    import duckdb

    ser = duckdb.sql(
        f"""
        SELECT CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) / 100.0 AS rev
        FROM '{SF_SMOKE}/orders.parquet'
        GROUP BY CAST(o_orderdate AS DATE) ORDER BY CAST(o_orderdate AS DATE)
        """
    ).fetchnumpy()["rev"].astype(np.float64)
    y, x1, x2 = ser[2:], ser[1:-1], ser[:-2]
    design = np.column_stack([x1, x2, np.ones_like(y)])
    coef, *_ = np.linalg.lstsq(design, y, rcond=None)
    assert row.phi1 == pytest.approx(coef[0], abs=2e-4)
    assert row.phi2 == pytest.approx(coef[1], abs=2e-4)
    assert row.intercept == pytest.approx(coef[2], abs=0.02)
    f1 = coef[2] + coef[0] * ser[-1] + coef[1] * ser[-2]
    assert row.forecast_1 == pytest.approx(f1, abs=0.02)


def test_haar_wavelet_matches_numpy_reference(spark):
    """Per-level detail energies must equal an integer-exact numpy Haar
    computed from the same daily-cents series."""
    import duckdb
    import numpy as np

    import __spark_entry__ as entrymod
    from conftest import SF_SMOKE

    rel = duckdb.sql(
        f"""
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM '{SF_SMOKE}/orders.parquet'
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    d0 = rel[0][0]
    n = (rel[-1][0] - d0).days + 1
    series = np.zeros(n, dtype=object)  # python ints: no overflow
    for day, cents in rel:
        series[(day - d0).days] = int(cents)
    rows = entrymod.q_haar_revenue_wavelet(spark, SF_SMOKE).collect()
    assert [r.level for r in rows] == list(range(1, 9))
    for r in rows:
        half = 1 << (r.level - 1)
        nblocks = -(-n // half)
        blocks = [
            int(series[b * half : (b + 1) * half].sum())
            for b in range(nblocks)
        ]
        present = [
            bool((series[b * half : (b + 1) * half] != 0).any())
            for b in range(nblocks)
        ]
        details = [
            blocks[2 * p] - (blocks[2 * p + 1] if 2 * p + 1 < nblocks else 0)
            for p in range(-(-nblocks // 2))
        ]
        nonzero_pairs = sum(
            1
            for p in range(-(-nblocks // 2))
            if present[2 * p]
            or (2 * p + 1 < nblocks and present[2 * p + 1])
        )
        assert r.n_nonzero_pairs == nonzero_pairs
        # dense-spine energies equal the sparse ones: empty pairs add 0;
        # emitted as the exact integer digit string (cents^2) — doubles
        # above 2^50 round differently per engine (round-7 driver fail)
        want = sum(d * d for d in details)
        assert r.energy_cents2 == str(want)


def test_periodogram_matches_numpy_reference(spark):
    """Power shares must match a numpy periodogram of the same
    mean-centered daily-cents series at each candidate period."""
    import duckdb
    import numpy as np

    import __spark_entry__ as entrymod
    from conftest import SF_SMOKE

    rel = duckdb.sql(
        f"""
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM '{SF_SMOKE}/orders.parquet'
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    d0 = rel[0][0]
    i = np.array([(day - d0).days for day, _ in rel])
    rev = np.array([c for _, c in rel], dtype=np.float64) / 100.0
    dev = rev - rev.mean()
    rows = entrymod.q_revenue_periodogram(spark, SF_SMOKE).collect()
    assert [r.period for r in rows] == [7, 14, 30, 91, 365]
    for r in rows:
        theta = 2 * np.pi * (i % r.period) / r.period
        c = float((dev * np.cos(theta)).sum())
        s = float((dev * np.sin(theta)).sum())
        share = (
            2.0 * (c * c + s * s) / (len(dev) * float((dev * dev).sum()))
        )
        assert r.power_share == pytest.approx(share, abs=2e-6)
        amp = 2.0 * (c * c + s * s) ** 0.5 / len(dev)
        assert r.amplitude_usd == pytest.approx(amp, abs=0.02)
        assert 0.0 <= r.power_share <= 1.0


def test_brand_elasticity_matches_numpy_lstsq(spark):
    import duckdb
    import numpy as np

    import __spark_entry__ as entrymod
    from conftest import SF_SMOKE

    rows = entrymod.q_brand_price_elasticity(spark, SF_SMOKE).collect()
    assert rows
    brand = rows[0].p_brand
    rel = duckdb.sql(
        f"""
        SELECT ln(CAST(l.l_quantity AS DOUBLE)) AS ly,
               ln(CAST(l.l_extendedprice AS DOUBLE)
                  / CAST(l.l_quantity AS DOUBLE)) AS lx
        FROM '{SF_SMOKE}/lineitem.parquet' l
        JOIN '{SF_SMOKE}/part.parquet' p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand = '{brand}'
          AND l.l_quantity > 0 AND l.l_extendedprice > 0
        """
    ).fetchnumpy()
    lx, ly = rel["lx"], rel["ly"]
    design = np.column_stack([lx, np.ones_like(lx)])
    coef, *_ = np.linalg.lstsq(design, ly, rcond=None)
    assert rows[0].n_lines == len(lx)
    assert rows[0].elasticity == pytest.approx(coef[0], abs=2e-4)
    assert rows[0].intercept == pytest.approx(coef[1], abs=2e-4)


def test_conformal_interval_coverage_and_quantile(spark):
    """q90 must be the discrete 0.9-quantile of the |lag-7 residual|
    set (an actual element), and calibration coverage >= 90% by
    construction."""
    import duckdb
    import numpy as np

    import __spark_entry__ as entrymod
    from conftest import SF_SMOKE

    [row] = entrymod.q_conformal_revenue_interval(spark, SF_SMOKE).collect()
    rel = duckdb.sql(
        f"""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS cents
          FROM '{SF_SMOKE}/orders.parquet' GROUP BY 1)
        SELECT abs(d.cents - p.cents) AS ar
        FROM daily d JOIN daily p ON d.day = p.day + 7
        """
    ).fetchnumpy()["ar"].astype(np.int64)
    assert row.n_calib == len(rel)
    srt = np.sort(rel)
    # discrete quantile: smallest element with cumdist >= 0.9
    q = int(srt[int(np.ceil(0.9 * len(srt))) - 1])
    assert row.q90_abs_resid == pytest.approx(q / 100.0, abs=0.005)
    coverage = float((rel <= q).mean())
    assert coverage >= 0.9
    assert row.lo == pytest.approx(row.point_forecast - row.q90_abs_resid, abs=0.02)
    assert row.hi == pytest.approx(row.point_forecast + row.q90_abs_resid, abs=0.02)


def test_circadian_profile_matches_numpy_circular_stats(spark):
    import numpy as np

    import __spark_entry__ as entrymod
    from conftest import SF_SMOKE

    ev = _events()
    rows = entrymod.q_circadian_profile(spark, SF_SMOKE).collect()
    got = {r.event_type: r for r in rows}
    # pandas reads the nanos parquet as datetime64[us]: int64 IS micros
    assert str(ev.ts.dtype) == "datetime64[us]"
    us = ev.ts.astype("int64") % 86_400_000_000
    theta = us.to_numpy() * 2 * np.pi / 86_400_000_000
    for etype, grp in ev.groupby("event_type"):
        th = theta[ev.event_type == etype]
        c, s = float(np.cos(th).sum()), float(np.sin(th).sum())
        r = got[etype]
        assert r.n == len(th)
        mean = (np.arctan2(s, c) + 2 * np.pi) % (2 * np.pi)
        assert r.peak_hour_utc == pytest.approx(
            mean * 24 / (2 * np.pi), abs=0.01
        )
        assert r.resultant_r == pytest.approx(
            np.hypot(c, s) / len(th), abs=1e-3
        )
        # synthetic timestamps are uniform around the clock: R ~ 0
        assert r.resultant_r < 0.1


def test_cuped_reduces_variance_and_matches_numpy(spark):
    import numpy as np

    import __spark_entry__ as entrymod
    from conftest import SF_SMOKE

    ev = _events()
    cut = ev.ts.min().normalize() + pd.Timedelta(days=15)
    g = ev.groupby("user_id")
    x = g.ts.apply(lambda s: int((s.dt.normalize() < cut).sum()))
    y = g.ts.apply(lambda s: int((s.dt.normalize() >= cut).sum()))
    xv, yv = x.to_numpy(np.float64), y.to_numpy(np.float64)
    mx, my = xv.mean(), yv.mean()
    sxx = ((xv - mx) ** 2).sum()
    sxy = ((xv - mx) * (yv - my)).sum()
    syy = ((yv - my) ** 2).sum()
    theta = sxy / sxx
    rho2 = sxy * sxy / (sxx * syy)
    rows = {r.variant: r for r in
            entrymod.q_cuped_adjusted_ab(spark, SF_SMOKE).collect()}
    assert set(rows) == {0, 1}
    for v, r in rows.items():
        mask = (x.index.to_numpy() % 2) == v
        assert r.n_users == int(mask.sum())
        assert r.mean_y == pytest.approx(yv[mask].mean(), abs=1e-3)
        adj = yv[mask] - theta * (xv[mask] - mx)
        assert r.mean_y_cuped == pytest.approx(adj.mean(), abs=1e-3)
        assert r.theta == pytest.approx(theta, abs=1e-5)
        assert r.var_reduction == pytest.approx(rho2, abs=1e-5)
    # the adjusted per-user metric must genuinely shrink variance
    adj_all = yv - theta * (xv - mx)
    assert adj_all.var() < yv.var()
