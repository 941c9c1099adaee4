#!/usr/bin/env python
"""Solo adjudication of bench-guard flags — the standing protocol,
scripted (rounds 6, 11, and 12 each hand-rolled this).

When ``check_bench.py`` (or a driver run) flags entries >2x, the flag
must be EARNED before it is treated as a regression: measured solo
(one fresh session, otherwise-idle box), best-of-N per entry, at probe
parity with the recorded reference, beside untouched same-session
controls.  This script runs exactly that and prints a verdict table::

    python scripts/adjudicate.py QUERY [QUERY ...]
    python scripts/adjudicate.py --from-check BENCH_FLAGS.json
    ADJ_REPEAT=4 ADJ_SF_DIR=/root/testdata/sf0.1 python scripts/adjudicate.py ...

``--from-check`` consumes the machine-readable flags artifact every
``check_bench.py`` comparison writes (``BENCH_FLAGS.json``), so the
guard's flag set flows here verbatim — no hand-typed entry lists
(round-12 VERDICT item 5).

Rules encoded (from BASELINE.md's adjudication history):

- probe parity: the compute probe must be within ``ADJ_PARITY``
  (default 1.25x either way) of the recorded reference's — measured at
  BOTH the start (cal0) AND the end (cal1) of the run, with the
  cal1/cal0 spread under ``ADJ_SPREAD`` (default 1.5x): a box that
  drifts DURING the adjudication run is the exact intra-run failure
  mode the round-12 bench guard instruments, and must not clear or
  convict a flag at nominal start-probe parity (round-12 ADVICE).
  Otherwise the run cannot clear OR convict (exit 2 — re-run when the
  box is closer to parity);
- settled-probe comparability: a session's first probe sample rides
  ~1.45x of JIT/codegen warm-up that decays over the first dozens of
  jobs (the driver's own round-12 run stamped calibration_samples
  [0.549, 0.415, 0.379] — monotone start->settled decline, which the
  round-13 spread gate then correctly refused as "drift" in two
  otherwise-clean adjudication runs).  When the recorded reference
  carries ``calibration_samples``, this script therefore DEEP-WARMS
  the session (each control once, untimed) before cal0 and compares
  settled-to-settled (min of the recorded samples); legacy references
  without samples keep the start-sample-vs-start-sample protocol;
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


def parity_ok(
    cal0: float,
    cal1: float,
    rec_cal: float | None,
    parity: float = 1.25,
    spread_limit: float = 1.5,
) -> tuple[bool, str]:
    """(at_parity, reason) — a verdict-bearing run needs the compute
    probe inside the parity band at BOTH ends AND a bounded intra-run
    spread; gating only on the start probe lets a box that drifts
    mid-run clear or convict at nominal parity (round-12 ADVICE).
    Pure function — pinned in tests/test_bench_guard.py."""
    if not rec_cal or rec_cal <= 0:
        return False, "no recorded probe to compare against"
    if not cal0 or not cal1 or cal0 <= 0 or cal1 <= 0:
        return False, "missing/non-positive probe sample"
    spread = max(cal0, cal1) / min(cal0, cal1)
    if spread > spread_limit:
        return False, (
            f"intra-run probe spread {spread:.2f}x exceeds"
            f" {spread_limit:g}x — box changed speed during the run"
        )
    for label, cal in (("start", cal0), ("end", cal1)):
        r = cal / rec_cal
        if not (1 / parity) <= r <= parity:
            return False, (
                f"{label} probe {cal}s is {r:.2f}x the recorded"
                f" {rec_cal}s (band {1 / parity:.2f}-{parity:g}x)"
            )
    return True, "both probes in band, spread bounded"


def settled_reference(rec_doc: dict) -> tuple[float | None, bool]:
    """(reference probe value, settled_mode) for a recorded-reference
    document.  A record carrying ``calibration_samples`` compares
    settled-to-settled (min sample = the record run's deepest-warmed
    probe; the caller deep-warms before cal0 to match); a legacy
    scalar-only record keeps start-vs-start.  Pure function — pinned in
    tests/test_bench_guard.py."""
    samples = [s for s in (rec_doc.get("calibration_samples") or [])
               if s and s > 0]
    if samples:
        return min(samples), True
    return rec_doc.get("calibration"), False


def read_flags(path: str) -> list[str]:
    """Flag names from a ``check_bench.py`` flags artifact
    (``BENCH_FLAGS.json``) — the ``--from-check`` handoff.  Prints the
    artifact's drift annotation so an unreliable source run is visible
    at adjudication time."""
    with open(path) as f:
        doc = json.load(f)
    if doc.get("drift_unreliable"):
        print(
            f"# source run {doc.get('run_id')} stamped drift on probes "
            f"{doc['drift_unreliable']} — its flags are unreliable"
            " either way; this solo run is the arbiter",
            file=sys.stderr,
        )
    return [f["name"] for f in doc.get("flags", [])]


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__)
        return 2
    if argv[0] == "--from-check":
        if len(argv) != 2:
            raise SystemExit("--from-check takes exactly one artifact path")
        argv = read_flags(argv[1])
        if not argv:
            print("no flags in the artifact — nothing to adjudicate")
            return 0
    repeat = int(os.environ.get("ADJ_REPEAT", "3"))
    sf_dir = os.environ.get("ADJ_SF_DIR", "/root/testdata/sf0.1")
    ratio = float(os.environ.get("ADJ_RATIO", "2.0"))
    parity = float(os.environ.get("ADJ_PARITY", "1.25"))

    with open(os.path.join(REPO, "BENCH_RECORDED.json")) as f:
        rec_doc = json.load(f)
    recorded = rec_doc["queries"]
    rec_cal, settled_mode = settled_reference(rec_doc)
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
    controls = [c for c in DEFAULT_CONTROLS if c in recorded
                and c not in argv]
    if settled_mode:
        # deep-warm past the ~1.45x first-probe JIT inflation so cal0
        # is a settled sample comparable to min(calibration_samples)
        for c in controls:
            qs[c](spark, sf_dir).count()
        release_caches()
    cal0 = bench.calibration_probe(spark)
    sched0 = bench.scheduling_probe(spark)
    print(f"# start probes: cal={cal0}s sched={sched0}s/job (recorded "
          f"{'settled' if settled_mode else 'start'} cal={rec_cal}s)",
          file=sys.stderr)
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
    spread_limit = float(os.environ.get("ADJ_SPREAD", "1.5"))
    at_parity, parity_reason = parity_ok(
        cal0, cal1, rec_cal, parity, spread_limit
    )
    print(f"probes: start cal {cal0}s, end cal {cal1}s, recorded "
          f"{rec_cal}s -> cal_ratio {cal_ratio:.2f} "
          f"({'PARITY' if at_parity else 'NOT AT PARITY'}: "
          f"{parity_reason})")

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
        print("verdict: INCONCLUSIVE — not at probe parity with the"
              f" reference ({parity_reason}); re-run when the box is"
              " closer to the recorded probe and stable through the run")
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
