#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry through Spark AND its ``oracle_sql()``
through DuckDB at sf0.01 (or $SF_DIR), comparing row count, sorted column
names, and an order-insensitive value hash. Queries without an oracle get
a rows-only check. Usage::

    python scripts/check_oracle.py [query ...]
    python scripts/check_oracle.py @window   # exactly the driver's first 50
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols) -> tuple[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                # %.17g = driver-equivalent sensitivity (round-7 escape:
                # %.9g locally PASSED a one-ulp divergence the driver
                # flagged). 17 significant digits round-trips any double.
                vals.append(f"{v:.17g}")
            elif isinstance(v, bool):
                vals.append(str(int(v)))
            else:
                vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    h = hashlib.sha256("\n".join(out).encode()).hexdigest()[:16]
    return h, len(out)


def main() -> int:
    import __spark_entry__ as entrymod
    from wistia_video_analytics_project_spark.session import get_spark

    args = sys.argv[1:]
    if args == ["@window"]:
        only = set(list(entrymod.queries())[:50])
    else:
        only = set(args)
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        s_hash, s_n = canon(s_rows, s_cols)
        if name not in oracles:
            status = "ROWS-ONLY" if s_n >= 0 else "EMPTY"
            print(f"ok?   {name}: {status} rows={s_n} ({time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = rel.columns
            d_rows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        d_hash, d_n = canon(d_rows, d_cols)
        ok_schema = sorted(s_cols) == sorted(d_cols)
        ok = s_n == d_n and ok_schema and s_hash == d_hash
        tag = "PASS " if ok else "FAIL "
        if not ok:
            failures.append(name)
        print(
            f"{tag} {name}: rows {s_n}/{d_n} schema={'ok' if ok_schema else f'{sorted(s_cols)} vs {sorted(d_cols)}'} "
            f"hash {'ok' if s_hash == d_hash else f'{s_hash} vs {d_hash}'} ({time.time()-t0:.1f}s)"
        )
        if not ok and s_n and d_n:
            srt = sorted("|".join(str(x) for x in r) for r in s_rows)[:3]
            drt = sorted("|".join(str(x) for x in r) for r in d_rows)[:3]
            print(f"      spark sample:  {srt}")
            print(f"      duckdb sample: {drt}")
    print(f"\n{'ALL PASS' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
