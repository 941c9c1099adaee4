#!/usr/bin/env python
"""Per-query optimization profiler (round-13 optimization tooling).

For each named query (default: none — pass names or @topN to take the
N slowest entries of BENCH_RECORDED.json):

- builds the DataFrame at $SF_DIR (default sf0.1),
- dumps ``explain("formatted")`` to ``plans/$PLANS_ROUND/<name>_<tag>.txt``
  (``PLANS_ROUND`` defaults to r14),
- times ``count()`` best-of-$BENCH_REPEAT (the bench methodology) and
  reports the Spark job delta OF THE BEST repeat (round-13 ADVICE: the
  last repeat's job count can misattribute deltas when caches/AQE
  change job counts between repeats),
- prints a one-line summary per query: seconds, jobs, #Exchange,
  #scans, join strategies, Python-eval nodes.

Usage::

    python scripts/profile_queries.py [--tag before|after] NAME ...
    python scripts/profile_queries.py --tag before @top30
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    args = sys.argv[1:]
    tag = "before"
    if args and args[0] == "--tag":
        tag = args[1]
        args = args[2:]
    names: list[str] = []
    for a in args:
        if a.startswith("@top"):
            rec = json.load(open(os.path.join(HERE, "BENCH_RECORDED.json")))
            top = sorted(rec["queries"].items(), key=lambda kv: -kv[1])
            names.extend(k for k, _ in top[: int(a[4:])])
        else:
            names.append(a)
    if not names:
        print("no queries named", file=sys.stderr)
        return 2

    import __spark_entry__ as entrymod
    from wistia_video_analytics_project_spark.cache import release_caches
    from wistia_video_analytics_project_spark.session import get_spark

    spark = get_spark("profile")
    qs = entrymod.queries()
    plans_dir = os.path.join(
        HERE, "plans", os.environ.get("PLANS_ROUND", "r14")
    )
    os.makedirs(plans_dir, exist_ok=True)
    repeat = int(os.environ.get("BENCH_REPEAT", "2"))

    def njobs() -> int:
        return int(spark.sparkContext._jsc.sc().dagScheduler().nextJobId())

    # warm the session the same way bench.py does
    qs["daily_plays_trend"](spark, "/root/testdata/sf0.001").count()

    results = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        best, jobs, n = float("inf"), 0, 0
        for _ in range(max(repeat, 1)):
            j0 = njobs()
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            n = df.count()
            lap = time.perf_counter() - t0
            if lap < best:
                # jobs from the SAME repeat that produced the best time
                # (round-13 ADVICE: last-repeat jobs misattribute when
                # caches/AQE change counts between repeats)
                best, jobs = lap, njobs() - j0
        # plan AFTER the timed runs (it can trigger extra jobs itself)
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        release_caches()
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        ex = len(re.findall(r"\bExchange\b", plan))
        scans = len(re.findall(r"Scan parquet|FileScan", plan))
        joins = sorted(
            set(re.findall(r"\b(\w*(?:HashJoin|MergeJoin|NestedLoopJoin|CartesianProduct))", plan))
        )
        py = sorted(
            set(
                re.findall(
                    r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas|AggregateInPandas)\w*",
                    plan,
                )
            )
        )
        results[name] = {
            "sec": round(best, 3),
            "jobs": jobs,
            "rows": n,
            "exchanges": ex,
            "scans": scans,
            "joins": joins,
            "python": py,
        }
        print(
            f"{name}: {best:.3f}s jobs={jobs} rows={n} exch={ex} "
            f"scans={scans} joins={joins} py={py}",
            flush=True,
        )
    print(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
