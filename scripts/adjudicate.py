#!/usr/bin/env python
"""Solo adjudication of bench-guard flags — the standing protocol,
scripted (rounds 6, 11, and 12 each hand-rolled this).

When ``check_bench.py`` (or a driver run) flags entries >2x, the flag
must be EARNED before it is treated as a regression: measured solo
(one fresh session, otherwise-idle box), best-of-N per entry, at probe
parity with the recorded reference, beside untouched same-session
controls.  This script runs exactly that and prints a verdict table::

    python scripts/adjudicate.py QUERY [QUERY ...]
    ADJ_REPEAT=4 ADJ_SF_DIR=/root/testdata/sf0.1 python scripts/adjudicate.py ...

Rules encoded (from BASELINE.md's adjudication history):

- probe parity: the compute probe must be within ``ADJ_PARITY``
  (default 1.25x either way) of the recorded reference's, or the run
  cannot clear OR convict a flag (exit 2 — re-run when the box is
  closer to parity);
- controls: a fixed set of untouched entries runs in the SAME session;
  if the controls are elevated too, the elevation is box-shaped, not
  code-shaped (printed per control, not part of the exit code);
- verdict per flagged entry: REPRODUCES iff its box-normalized ratio
  exceeds ``ADJ_RATIO`` (default 2.0) at parity — exit 1 if any entry
  reproduces (treat as real; fix the plan), exit 0 if all clear.

The timing loop mirrors bench.py exactly (best-of-N ``count()`` with
``release_caches()`` AFTER the repeats, never between them).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: untouched same-session controls (small/medium/heavy cross-section of
#: stable entries — none has flagged in any round)
DEFAULT_CONTROLS = [
    "pricing_summary",
    "doc_chunks",
    "similar_documents",
    "dedup_ngram_jaccard",
]


def verdicts(
    flagged: dict[str, float],
    recorded: dict[str, float],
    cal_ratio: float,
    ratio: float = 2.0,
) -> dict[str, tuple[float, bool]]:
    """{name: (box_normalized_ratio, reproduces)} for each measured
    entry present in the recorded reference.  Pure function — pinned in
    tests/test_bench_guard.py without a Spark session."""
    out: dict[str, tuple[float, bool]] = {}
    for name, cur in flagged.items():
        rec = recorded.get(name)
        if not rec:
            continue
        norm = (cur / cal_ratio) / float(rec)
        out[name] = (round(norm, 3), norm > ratio)
    return out


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__)
        return 2
    repeat = int(os.environ.get("ADJ_REPEAT", "3"))
    sf_dir = os.environ.get("ADJ_SF_DIR", "/root/testdata/sf0.1")
    ratio = float(os.environ.get("ADJ_RATIO", "2.0"))
    parity = float(os.environ.get("ADJ_PARITY", "1.25"))

    with open(os.path.join(REPO, "BENCH_RECORDED.json")) as f:
        rec_doc = json.load(f)
    recorded = rec_doc["queries"]
    rec_cal = rec_doc.get("calibration")
    unknown = [q for q in argv if q not in recorded]
    if unknown:
        raise SystemExit(f"not in BENCH_RECORDED.json: {unknown}")

    import bench
    import __spark_entry__ as entrymod
    from wistia_video_analytics_project_spark.session import get_spark
    from wistia_video_analytics_project_spark.cache import release_caches

    spark = get_spark("adjudicate")
    qs = entrymod.queries()
    qs["daily_plays_trend"](spark, "/root/testdata/sf0.001").count()  # warm
    cal0 = bench.calibration_probe(spark)
    sched0 = bench.scheduling_probe(spark)
    print(f"# start probes: cal={cal0}s sched={sched0}s/job "
          f"(recorded cal={rec_cal}s)", file=sys.stderr)

    controls = [c for c in DEFAULT_CONTROLS if c in recorded
                and c not in argv]
    timings: dict[str, float] = {}
    for name in list(argv) + controls:
        best = float("inf")
        for _ in range(max(repeat, 1)):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        release_caches()
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)
    cal1 = bench.calibration_probe(spark)
    spark.stop()

    cal_ratio = (cal0 / rec_cal) if rec_cal else 1.0
    at_parity = rec_cal and (1 / parity) <= cal_ratio <= parity
    print(f"probes: start cal {cal0}s, end cal {cal1}s, recorded "
          f"{rec_cal}s -> cal_ratio {cal_ratio:.2f} "
          f"({'PARITY' if at_parity else 'NOT AT PARITY'})")

    v_flag = verdicts({q: timings[q] for q in argv}, recorded,
                      cal_ratio, ratio)
    v_ctrl = verdicts({c: timings[c] for c in controls}, recorded,
                      cal_ratio, ratio)
    for name, (norm, rep) in v_ctrl.items():
        print(f"control    {name}: {recorded[name]}s -> {timings[name]}s"
              f" = {norm}x normalized")
    bad = []
    for name, (norm, rep) in v_flag.items():
        tag = "REPRODUCES" if rep else "clears"
        print(f"{tag:10} {name}: {recorded[name]}s -> {timings[name]}s"
              f" = {norm}x normalized (ratio {ratio:g})")
        if rep:
            bad.append(name)
    if not at_parity:
        print("verdict: INCONCLUSIVE — compute probe not at parity with"
              f" the reference (|log ratio| > {parity:g}x); re-run when"
              " the box is closer to the recorded probe")
        return 2
    if bad:
        print(f"verdict: {len(bad)} flag(s) reproduce at parity — treat"
              f" as real regressions: {', '.join(bad)}")
        return 1
    print("verdict: all flags clear at parity — run-shaped box variance;"
          " record the adjudication in BASELINE.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
