"""check_bench.py compare(): flags real per-query regressions, ignores
scheduling-floor noise and set drift (no Spark session needed)."""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "check_bench",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "check_bench.py",
    ),
)
check_bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(spec and check_bench)


def test_flags_injected_3x_slowdown():
    recorded = {"q1": 1.0, "q2": 2.0}
    current = {"q1": 3.0, "q2": 2.1}
    regs, _, _ = check_bench.compare(recorded, current)
    assert [(n, r, c) for n, r, c in regs] == [("q1", 1.0, 3.0)]


def test_ignores_sub_floor_noise():
    # 0.1 -> 0.4 s is 4x but under the 0.5 s scheduling floor: not real
    regs, _, _ = check_bench.compare({"tiny": 0.1}, {"tiny": 0.4})
    assert regs == []
    # ... unless it crosses the floor
    regs, _, _ = check_bench.compare({"tiny": 0.1}, {"tiny": 0.6})
    assert regs == [("tiny", 0.1, 0.6)]


def test_set_drift_is_informational_not_fatal():
    regs, only_rec, only_cur = check_bench.compare(
        {"old": 1.0, "both": 1.0}, {"both": 1.0, "new": 9.0}
    )
    assert regs == []
    assert only_rec == ["old"] and only_cur == ["new"]


def test_recorded_reference_exists_and_covers_bench_sets():
    import json
    import sys

    with open(check_bench.RECORDED_PATH) as f:
        recorded = json.load(f)["queries"]
    sys.path.insert(0, check_bench.REPO)
    import bench

    missing = [
        q for q in bench.HEADLINE + bench.SECONDARY if q not in recorded
    ]
    # new queries may be unrecorded briefly; the HEADLINE set is frozen
    # so it must always be fully covered
    assert not [q for q in bench.HEADLINE if q not in recorded], missing


def test_flatten_skips_sidecar_at_different_sf():
    head = {"sf": 0.1, "run_id": "r1", "queries": {"a": 1.0}}
    side_ok = {"sf": 0.1, "run_id": "r1", "queries": {"b": 2.0}}
    side_bad = {"sf": 0.001, "run_id": "r1", "queries": {"b": 0.02}}
    assert check_bench._flatten_run(head, side_ok) == {"a": 1.0, "b": 2.0}
    # a stale sidecar from another scale factor must NOT seed the map
    assert check_bench._flatten_run(head, side_bad) == {"a": 1.0}


def test_flatten_skips_sidecar_from_different_run():
    head = {"sf": 0.1, "run_id": "r1", "queries": {"a": 1.0}}
    other_run = {"sf": 0.1, "run_id": "r2", "queries": {"b": 2.0}}
    # same sf but a different run/commit: refusing the fill prevents
    # attributing another build's timings to this artifact
    assert check_bench._flatten_run(head, other_run) == {"a": 1.0}


def test_flatten_gives_no_fill_to_unstamped_artifacts():
    legacy = {"sf": 0.1, "queries": {"a": 1.0}}  # pre-run_id artifact
    side = {"sf": 0.1, "run_id": "r1", "queries": {"b": 2.0}}
    assert check_bench._flatten_run(legacy, side) == {"a": 1.0}


def test_flatten_given_run_is_authoritative_over_sidecar():
    head = {"sf": 0.1, "run_id": "r1", "queries": {"a": 1.0}}
    side = {"sf": 0.1, "run_id": "r1", "queries": {"a": 9.0, "b": 2.0}}
    # sidecars only FILL missing names, never replace the run's values
    assert check_bench._flatten_run(head, side) == {"a": 1.0, "b": 2.0}


def test_calibration_cancels_uniform_box_slowdown():
    """Replay of the round-6 incident shape: the whole box runs 40%
    slower (probe 1.0 -> 1.4s), every query drifts up proportionally —
    the normalized guard must NOT flag, while the raw guard would."""
    recorded = {"q1": 1.0, "q2": 3.0, "q3": 0.8}
    current = {"q1": 1.45, "q2": 4.1, "q3": 1.15}  # ~1.4x across the board
    # raw: q3 0.8 -> 1.15 is under 2x; but make one cross 2x+slack raw
    current["q1"] = 2.5  # 2.5x raw — the false-flag case
    raw, _, _ = check_bench.compare(recorded, current)
    assert raw, "sanity: raw guard would flag"
    cal = check_bench.calibration_ratio(1.0, 1.4)
    normalized, _, _ = check_bench.compare(recorded, current, cal_ratio=cal)
    assert normalized == [], normalized


def test_calibration_keeps_real_regression_flagged():
    """A genuine 3x single-query regression on the SAME 40%-slower box
    still flags: the probe moved 1.4x, the query moved 4.2x."""
    recorded = {"q1": 1.0, "q2": 3.0}
    current = {"q1": 4.2, "q2": 4.1}
    cal = check_bench.calibration_ratio(1.0, 1.4)
    regs, _, _ = check_bench.compare(recorded, current, cal_ratio=cal)
    assert [n for n, _, _ in regs] == ["q1"], regs


def test_calibration_ratio_clamps_and_defaults():
    assert check_bench.calibration_ratio(None, 1.0) == 1.0
    assert check_bench.calibration_ratio(1.0, None) == 1.0
    assert check_bench.calibration_ratio(0.0, 1.0) == 1.0
    assert check_bench.calibration_ratio(1.0, 10.0) == 3.0   # clamp high
    assert check_bench.calibration_ratio(10.0, 1.0) == 0.5   # clamp low
    assert check_bench.calibration_ratio(2.0, 2.8) == 1.4


def test_scheduling_probe_normalizes_job_dominated_entries():
    """Replay of the round-10 driver-run shape (VERDICT item 3): the
    compute probe moved only 1.25x but the per-job scheduling constant
    moved 4x — job-count-dominated entries (recursive-CTE ladder at 141
    jobs, ALS at 50) drifted 3-4.4x while compute-bound queries tracked
    the compute probe.  The compute-only guard false-flags them; the
    scheduling axis must cancel the drift."""
    recorded = {"cte_ladder": 3.0, "als": 4.4, "scan_heavy": 2.0}
    jobs = {"cte_ladder": 141, "als": 50, "scan_heavy": 4}
    current = {"cte_ladder": 13.2, "als": 13.0, "scan_heavy": 2.5}
    cal = check_bench.calibration_ratio(0.476, 0.595)  # 1.25x compute
    # compute-only normalization (the round-10 gap): false flags
    raw, _, _ = check_bench.compare(recorded, current, cal_ratio=cal)
    assert {n for n, _, _ in raw} == {"cte_ladder", "als"}
    # scheduling-normalized: the drift cancels, nothing flags
    sched = check_bench.scheduling_ratio(0.02, 0.08)  # 4x per-job
    regs, _, _ = check_bench.compare(
        recorded, current, cal_ratio=cal,
        sched_ratio=sched, jobs_recorded=jobs,
    )
    assert regs == [], regs


def test_scheduling_probe_keeps_real_regression_on_job_heavy_entry():
    """A genuine 3x regression in a job-heavy entry still flags when
    the scheduling constant itself has not moved."""
    recorded = {"cte_ladder": 3.0}
    jobs = {"cte_ladder": 141}
    current = {"cte_ladder": 9.0}
    sched = check_bench.scheduling_ratio(0.02, 0.021)  # flat
    regs, _, _ = check_bench.compare(
        recorded, current, sched_ratio=sched, jobs_recorded=jobs
    )
    assert [n for n, _, _ in regs] == ["cte_ladder"]


def test_scheduling_axis_only_applies_above_jobs_threshold():
    """A compute-bound query (few jobs) must NOT get the scheduling
    normalization — a real 3x plan regression on it flags even when
    the box's scheduling constant also drifted 3x."""
    recorded = {"scan_q": 2.0}
    current = {"scan_q": 6.0}
    sched = check_bench.scheduling_ratio(0.02, 0.06)  # 3x per-job
    regs, _, _ = check_bench.compare(
        recorded, current, sched_ratio=sched,
        jobs_recorded={"scan_q": 4},
    )
    assert [n for n, _, _ in regs] == ["scan_q"]


def test_scheduling_ratio_clamps_and_defaults():
    assert check_bench.scheduling_ratio(None, 0.02) is None
    assert check_bench.scheduling_ratio(0.02, None) is None
    assert check_bench.scheduling_ratio(0.0, 0.02) is None
    assert check_bench.scheduling_ratio(0.02, 0.5) == 5.0   # clamp high
    assert check_bench.scheduling_ratio(0.5, 0.02) == 0.5   # clamp low
    assert check_bench.scheduling_ratio(0.02, 0.08) == 4.0


def test_no_sched_probe_falls_back_to_compute_ratio():
    """Entries recorded before jobs/scheduling stamping get the old
    behavior: compute-probe normalization for everything."""
    recorded = {"cte_ladder": 3.0}
    current = {"cte_ladder": 9.5}
    cal = check_bench.calibration_ratio(1.0, 1.4)
    regs, _, _ = check_bench.compare(
        recorded, current, cal_ratio=cal,
        sched_ratio=None, jobs_recorded={"cte_ladder": 141},
    )
    assert [n for n, _, _ in regs] == ["cte_ladder"]


def test_faster_box_tightens_the_guard():
    """cal < 1 (current box faster) normalizes current timings UP, so a
    regression masked by a faster box is still caught."""
    recorded = {"q1": 1.0}
    current = {"q1": 1.9}  # under 2x raw...
    cal = check_bench.calibration_ratio(1.0, 0.6)  # box 40% faster
    regs, _, _ = check_bench.compare(recorded, current, cal_ratio=cal)
    assert [n for n, _, _ in regs] == ["q1"], regs


def test_sidecar_meta_respects_run_identity():
    """jobs/scheduling ride the ALLQ sidecar but must only attach to
    the run that wrote them — and a pre-run_id artifact gets none."""
    head = {"sf": 0.1, "run_id": "r1", "queries": {"a": 1.0}}
    side = {"sf": 0.1, "run_id": "r1", "queries": {},
            "jobs": {"a": 141}, "scheduling": 0.04}
    other = {"sf": 0.1, "run_id": "r2", "queries": {},
             "jobs": {"a": 9}, "scheduling": 0.9}
    jobs, sched = check_bench._sidecar_meta(head, side, other)
    assert jobs == {"a": 141} and sched == 0.04
    # headline's own stamp wins over the sidecar's
    head2 = dict(head, scheduling=0.05)
    _, sched2 = check_bench._sidecar_meta(head2, side)
    assert sched2 == 0.05
    legacy = {"sf": 0.1, "queries": {"a": 1.0}}  # no run_id
    jobs3, sched3 = check_bench._sidecar_meta(legacy, side)
    assert jobs3 == {} and sched3 is None


def test_combined_denominator_for_job_heavy_compute_dominated():
    """Round-11 ADVICE replay: a job-heavy but compute-DOMINATED entry
    (clamped_quarterly_balance shape, 141 jobs) on a uniformly
    compute-slower box (compute probe 2.5x, scheduling flat) used to
    false-flag — the sched-only denominator discarded the compute probe
    entirely.  Same-direction drift must divide by max(cal, sched)."""
    recorded = {"cqb": 2.0}
    jobs = {"cqb": 141}
    current = {"cqb": 4.8}  # 2.4x raw — pure box drift, within the probe
    cal = check_bench.calibration_ratio(0.5, 1.25)  # 2.5x compute
    sched = check_bench.scheduling_ratio(0.02, 0.021)  # flat
    regs, _, _ = check_bench.compare(
        recorded, current, cal_ratio=cal,
        sched_ratio=sched, jobs_recorded=jobs,
    )
    assert regs == [], regs
    # ...but a genuine regression beyond BOTH axes still flags
    regs, _, _ = check_bench.compare(
        recorded, {"cqb": 11.0}, cal_ratio=cal,
        sched_ratio=sched, jobs_recorded=jobs,
    )
    assert [n for n, _, _ in regs] == ["cqb"]
    # opposite-direction drift keeps the sched-only routing (no
    # coherent combined model): compute faster, scheduling 4x slower,
    # a job-dominated 4x raw move cancels on the sched axis
    cal_f = check_bench.calibration_ratio(1.0, 0.8)
    sched_s = check_bench.scheduling_ratio(0.02, 0.08)
    regs, _, _ = check_bench.compare(
        {"cqb": 2.0}, {"cqb": 7.8}, cal_ratio=cal_f,
        sched_ratio=sched_s, jobs_recorded=jobs,
    )
    assert regs == [], regs


def test_effective_denom_routing():
    # few jobs -> compute axis regardless of sched
    assert check_bench.effective_denom(1.4, 4.0, 4) == (1.4, "box")
    # no sched probe -> compute axis
    assert check_bench.effective_denom(1.4, None, 141) == (1.4, "box")
    # job-heavy, same direction -> max of the axes
    assert check_bench.effective_denom(1.2, 4.0, 141) == (4.0, "sched")
    assert check_bench.effective_denom(2.5, 1.1, 141) == (2.5, "box(max)")
    # job-heavy, opposite directions -> sched only (pre-round-12 rule)
    assert check_bench.effective_denom(0.8, 4.0, 141) == (4.0, "sched")


def test_run_drift_reads_stamp_with_run_identity():
    head = {"run_id": "r1", "probe_spread": {"calibration": 1.8,
                                             "scheduling": 1.1}}
    assert check_bench.run_drift(head) == {"calibration": 1.8,
                                           "scheduling": 1.1}
    # falls back to a same-run sidecar; ignores other runs' stamps
    head2 = {"run_id": "r1"}
    side = {"run_id": "r1", "probe_spread": {"calibration": 1.6}}
    other = {"run_id": "r2", "probe_spread": {"calibration": 9.9}}
    assert check_bench.run_drift(head2, other, side) == {"calibration": 1.6}
    # pre-stamp artifacts: no annotation
    assert check_bench.run_drift({"run_id": "r0"}, other) == {}
    assert check_bench.run_drift({}) == {}


def test_record_refuses_drifty_run(tmp_path, monkeypatch, capsys):
    """Round-11 VERDICT item 2: --record from a run whose intra-run
    probe spread exceeds the limit must refuse (the box changed speed
    DURING the run), and BENCH_GUARD_ALLOW_DRIFT=1 overrides."""
    import json

    artifact = tmp_path / "run.json"
    artifact.write_text(json.dumps({
        "metric": "headline_query_wall_clock_total", "value": 1.0,
        "unit": "sec", "queries": {"a": 1.0}, "sf": 0.1,
        "run_id": "rD", "calibration": 0.5, "scheduling": 0.04,
        # settled (mid/end) spread 0.9/0.55 = 1.64x: the box genuinely
        # changed speed after warm-up — the refusal case
        "calibration_samples": [0.5, 0.9, 0.55],
        "scheduling_samples": [0.04, 0.041, 0.042],
        "probe_spread": {"calibration": 1.8, "scheduling": 1.05},
    }))
    recorded = tmp_path / "BENCH_RECORDED.json"
    monkeypatch.setattr(check_bench, "RECORDED_PATH", str(recorded))
    monkeypatch.setattr(
        check_bench, "ALLQ_PATH", str(tmp_path / "m1.json")
    )
    monkeypatch.setattr(
        check_bench, "SECONDARY_PATH", str(tmp_path / "m2.json")
    )
    monkeypatch.delenv("BENCH_GUARD_ALLOW_DRIFT", raising=False)
    import pytest
    with pytest.raises(SystemExit, match="refusing --record"):
        check_bench.main(["--record", str(artifact)])
    assert not recorded.exists()
    # override records, and persists the probe samples + spread
    monkeypatch.setenv("BENCH_GUARD_ALLOW_DRIFT", "1")
    assert check_bench.main(["--record", str(artifact)]) == 0
    doc = json.loads(recorded.read_text())
    assert doc["probe_spread"] == {"calibration": 1.8, "scheduling": 1.05}
    assert doc["calibration_samples"] == [0.5, 0.9, 0.55]


def test_io_spread_annotates_but_does_not_veto_record(
    tmp_path, monkeypatch, capsys
):
    """The io probe is stamp-only (no normalization routes through it,
    and its start sample carries warm-up inflation): an io-only spread
    above the limit must still allow --record, while the annotation
    names it."""
    import json

    artifact = tmp_path / "run.json"
    artifact.write_text(json.dumps({
        "metric": "headline_query_wall_clock_total", "value": 1.0,
        "unit": "sec", "queries": {"a": 1.0}, "sf": 0.1,
        "run_id": "rI", "calibration": 0.5, "scheduling": 0.04,
        # io settled spread 0.95/0.45 = 2.11x — genuinely drifty on the
        # stamp-only axis, which annotates but must not veto
        "io": 1.1, "io_samples": [1.1, 0.45, 0.95],
        "probe_spread": {"calibration": 1.1, "scheduling": 1.2,
                         "io": 2.4},
    }))
    recorded = tmp_path / "BENCH_RECORDED.json"
    monkeypatch.setattr(check_bench, "RECORDED_PATH", str(recorded))
    monkeypatch.setattr(check_bench, "ALLQ_PATH", str(tmp_path / "m1"))
    monkeypatch.setattr(
        check_bench, "SECONDARY_PATH", str(tmp_path / "m2")
    )
    monkeypatch.delenv("BENCH_GUARD_ALLOW_DRIFT", raising=False)
    assert check_bench.main(["--record", str(artifact)]) == 0
    err = capsys.readouterr().err
    assert "INTRA-RUN PROBE DRIFT" in err and "io spread 2.11x" in err
    doc = json.loads(recorded.read_text())
    assert doc["io"] == 1.1
    assert doc["io_samples"] == [1.1, 0.45, 0.95]


def test_drifty_comparison_is_annotated(tmp_path, monkeypatch, capsys):
    """A comparison fed a drifty run still runs, but stderr carries the
    INTRA-RUN PROBE DRIFT annotation so a human discounts its flags."""
    import json

    recorded = tmp_path / "BENCH_RECORDED.json"
    recorded.write_text(json.dumps({
        "sf": 0.1, "calibration": 0.5, "queries": {"a": 1.0},
    }))
    artifact = tmp_path / "run.json"
    artifact.write_text(json.dumps({
        "metric": "headline_query_wall_clock_total", "value": 1.0,
        "unit": "sec", "queries": {"a": 1.1}, "sf": 0.1,
        "run_id": "rD", "calibration": 0.55,
        "probe_spread": {"calibration": 2.1, "scheduling": 1.0},
    }))
    monkeypatch.setattr(check_bench, "RECORDED_PATH", str(recorded))
    monkeypatch.setattr(
        check_bench, "ALLQ_PATH", str(tmp_path / "m1.json")
    )
    monkeypatch.setattr(
        check_bench, "SECONDARY_PATH", str(tmp_path / "m2.json")
    )
    monkeypatch.setattr(
        check_bench, "FLAGS_PATH", str(tmp_path / "BENCH_FLAGS.json")
    )
    assert check_bench.main([str(artifact)]) == 0
    err = capsys.readouterr().err
    assert "INTRA-RUN PROBE DRIFT" in err
    assert "calibration spread 2.10x" in err
    # ... and even a clean comparison stamps the drift annotation into
    # the flags artifact, so --from-check sees the unreliability
    flags = json.loads((tmp_path / "BENCH_FLAGS.json").read_text())
    assert flags["drift_unreliable"] == ["calibration"]
    assert flags["flags"] == []


def test_bench_probe_spread_helper():
    import bench

    assert bench.probe_spread([0.5, 0.9, 0.6]) == 1.8
    assert bench.probe_spread([0.5]) is None
    assert bench.probe_spread([0.0, None]) is None
    assert bench.probe_spread([0.04, 0.041, 0.042]) == 1.05


def test_adjudicate_verdict_logic():
    """scripts/adjudicate.py's pure verdict function: box-normalized
    ratio vs the recorded reference, reproduce iff above the ratio."""
    spec2 = importlib.util.spec_from_file_location(
        "adjudicate",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "adjudicate.py",
        ),
    )
    adj = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(adj)

    recorded = {"a": 1.0, "b": 2.0}
    # box at parity (cal_ratio 1.0): a at 2.5x reproduces, b at 1.5x clears
    v = adj.verdicts({"a": 2.5, "b": 3.0}, recorded, 1.0)
    assert v == {"a": (2.5, True), "b": (1.5, False)}
    # the same raw numbers on a 2x-slower box all clear
    v = adj.verdicts({"a": 2.5, "b": 3.0}, recorded, 2.0)
    assert v == {"a": (1.25, False), "b": (0.75, False)}
    # entries missing from the reference are skipped, not crashed on
    assert adj.verdicts({"new": 9.0}, recorded, 1.0) == {}


def test_record_persists_scheduling_and_jobs(tmp_path, monkeypatch):
    """--record must carry the scheduling probe and per-query jobs map
    into the reference — that is the handoff that activates the
    scheduling axis at the next natural re-record."""
    import json

    artifact = tmp_path / "run.json"
    artifact.write_text(json.dumps({
        "metric": "headline_query_wall_clock_total", "value": 1.0,
        "unit": "sec", "queries": {"a": 1.0}, "sf": 0.1,
        "run_id": "rX", "calibration": 0.5, "scheduling": 0.04,
    }))
    allq = tmp_path / "BENCH_ALLQ.json"
    allq.write_text(json.dumps({
        "metric": "all_query_wall_clock", "unit": "sec",
        "queries": {"a": 1.0, "b": 2.0}, "sf": 0.1, "run_id": "rX",
        "calibration": 0.5, "scheduling": 0.04, "jobs": {"a": 4, "b": 44},
    }))
    recorded = tmp_path / "BENCH_RECORDED.json"
    monkeypatch.setattr(check_bench, "RECORDED_PATH", str(recorded))
    monkeypatch.setattr(check_bench, "ALLQ_PATH", str(allq))
    monkeypatch.setattr(
        check_bench, "SECONDARY_PATH", str(tmp_path / "missing.json")
    )
    monkeypatch.setattr(
        check_bench, "FLAGS_PATH", str(tmp_path / "BENCH_FLAGS.json")
    )
    assert check_bench.main(["--record", str(artifact)]) == 0
    doc = json.loads(recorded.read_text())
    assert doc["scheduling"] == 0.04
    assert doc["jobs"] == {"a": 4, "b": 44}
    assert doc["queries"] == {"a": 1.0, "b": 2.0}
    assert doc["calibration"] == 0.5

    # and a comparison against that reference uses the scheduling axis
    # for the 44-job entry: compute probe flat, scheduling 4x -> the b
    # entry moving 3x raw CANCELS on the sched axis (compute-only
    # normalization would have flagged it — exit 0 proves the handoff
    # activated the axis)
    current = tmp_path / "run2.json"
    current.write_text(json.dumps({
        "metric": "headline_query_wall_clock_total", "value": 1.0,
        "unit": "sec", "queries": {"a": 1.0, "b": 6.0}, "sf": 0.1,
        "run_id": "rY", "calibration": 0.5, "scheduling": 0.16,
    }))
    assert check_bench.main([str(current)]) == 0
    # with BOTH probes flat the same 3x move is a real regression
    flat = tmp_path / "run3.json"
    flat.write_text(json.dumps({
        "metric": "headline_query_wall_clock_total", "value": 1.0,
        "unit": "sec", "queries": {"a": 1.0, "b": 6.0}, "sf": 0.1,
        "run_id": "rZ", "calibration": 0.5, "scheduling": 0.041,
    }))
    assert check_bench.main([str(flat)]) == 1


def _load_adjudicate():
    spec2 = importlib.util.spec_from_file_location(
        "adjudicate",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "adjudicate.py",
        ),
    )
    adj = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(adj)
    return adj


def test_flags_block_shapes_the_handoff():
    """flags_block carries entry, raw/normalized ratio, axis, jobs and
    the drift annotation — everything adjudication needs, nothing
    hand-typed (round-12 VERDICT item 5)."""
    block = check_bench.flags_block(
        regs=[("q_fast", 1.0, 3.0), ("q_jobs", 2.0, 9.0)],
        rec_jobs={"q_jobs": 44},
        cal=1.1,
        sched=1.0,
        jobs_threshold=12,
        headline={"run_id": "r13", "sf": 0.1},
        drifty={"scheduling": 1.89},
        ratio=2.0,
        floor=0.5,
    )
    assert block["run_id"] == "r13"
    assert block["drift_unreliable"] == ["scheduling"]
    by_name = {f["name"]: f for f in block["flags"]}
    # few-job entry normalizes on the compute axis
    assert by_name["q_fast"]["axis"] == "box"
    assert by_name["q_fast"]["raw_ratio"] == 3.0
    assert by_name["q_fast"]["normalized"] == round(3.0 / 1.1, 3)
    # job-heavy entry with same-direction probes -> max(cal, sched)
    assert by_name["q_jobs"]["jobs"] == 44
    assert by_name["q_jobs"]["normalized"] == round(9.0 / 1.1 / 2.0, 3)


def test_from_check_roundtrip(tmp_path, monkeypatch):
    """check_bench writes BENCH_FLAGS.json on a flagging comparison and
    adjudicate.read_flags returns exactly the flagged entry names —
    the mechanical handoff that replaces hand-typed flag lists."""
    import json

    recorded = tmp_path / "BENCH_RECORDED.json"
    recorded.write_text(json.dumps({
        "sf": 0.1, "calibration": 0.5,
        "queries": {"a": 1.0, "b": 2.0, "c": 0.8},
    }))
    artifact = tmp_path / "run.json"
    artifact.write_text(json.dumps({
        "metric": "headline_query_wall_clock_total", "value": 1.0,
        "unit": "sec", "queries": {"a": 3.0, "b": 2.1, "c": 2.5},
        "sf": 0.1, "run_id": "rQ", "calibration": 0.5,
    }))
    flags_path = tmp_path / "BENCH_FLAGS.json"
    monkeypatch.setattr(check_bench, "RECORDED_PATH", str(recorded))
    monkeypatch.setattr(check_bench, "ALLQ_PATH", str(tmp_path / "m1"))
    monkeypatch.setattr(check_bench, "SECONDARY_PATH", str(tmp_path / "m2"))
    monkeypatch.setattr(check_bench, "FLAGS_PATH", str(flags_path))
    assert check_bench.main([str(artifact)]) == 1

    adj = _load_adjudicate()
    assert adj.read_flags(str(flags_path)) == ["a", "c"]


def test_adjudicate_parity_gates_on_both_probes():
    """round-12 ADVICE: the verdict must not rest on the start probe
    alone — an end probe out of band or a >1.5x intra-run spread makes
    the run inconclusive."""
    adj = _load_adjudicate()
    ok, _ = adj.parity_ok(0.5, 0.52, 0.5)
    assert ok
    # start at parity, end drifted out of the 1.25x band -> not parity
    ok, why = adj.parity_ok(0.5, 0.9, 0.5)
    assert not ok and "spread" in why
    # both ends inside the band but spread > 1.5x is impossible with
    # the default band; widen the band to isolate the spread gate
    ok, why = adj.parity_ok(0.4, 0.7, 0.5, parity=2.0)
    assert not ok and "spread" in why
    # end probe out of band at a bounded spread
    ok, why = adj.parity_ok(0.55, 0.75, 0.5, parity=1.25, spread_limit=2.0)
    assert not ok and "end probe" in why
    # missing recorded probe can never produce a verdict
    ok, why = adj.parity_ok(0.5, 0.5, None)
    assert not ok


def test_adjudicate_settled_reference():
    """A record with calibration_samples compares settled-to-settled
    (min sample); a legacy scalar-only record keeps start-vs-start —
    the comparability rule behind the round-13 deep-warm."""
    adj = _load_adjudicate()
    assert adj.settled_reference(
        {"calibration": 0.549,
         "calibration_samples": [0.549, 0.415, 0.379]}
    ) == (0.379, True)
    assert adj.settled_reference({"calibration": 0.598}) == (0.598, False)
    # zero/None samples are junk, not a settled basis
    assert adj.settled_reference(
        {"calibration": 0.5, "calibration_samples": [0.0, None]}
    ) == (0.5, False)


def test_settled_drift_excludes_warmup_sample():
    """Round-13: the start probe sample rides systematic JIT warm-up
    (~1.4-2.3x, measured in four independent runs) — drift is the
    spread over the SETTLED samples only."""
    doc = {
        "calibration_samples": [0.598, 0.424, 0.348],  # full 1.72x
        "scheduling_samples": [0.0405, 0.0262, 0.0206],  # full 1.97x
        "io_samples": [0.645, 0.471, 0.409],
    }
    d = check_bench.settled_drift(doc)
    assert d["calibration"] == round(0.424 / 0.348, 3)  # 1.22x
    assert d["scheduling"] == round(0.0262 / 0.0206, 3)
    assert d["io"] == round(0.471 / 0.409, 3)
    # fewer than 2 settled samples -> no basis
    assert check_bench.settled_drift({"calibration_samples": [0.5, 0.4]}) \
        == {}
    assert check_bench.settled_drift({}) == {}


def test_run_drift_prefers_settled_over_stamped_spread():
    head = {
        "run_id": "r1",
        "probe_spread": {"calibration": 1.72},
        "calibration_samples": [0.598, 0.424, 0.348],
    }
    assert check_bench.run_drift(head) == {
        "calibration": round(0.424 / 0.348, 3)
    }
    # legacy artifact without samples falls back to the stamp
    legacy = {"run_id": "r2", "probe_spread": {"calibration": 1.72}}
    assert check_bench.run_drift(legacy) == {"calibration": 1.72}


def test_record_allowed_when_only_warmup_decay(tmp_path, monkeypatch):
    """A run whose full probe spread exceeds 1.5x purely from the
    start-sample warm-up decay (settled spread small) must be
    recordable — otherwise every honest run on this box is refused."""
    import json

    artifact = tmp_path / "run.json"
    artifact.write_text(json.dumps({
        "metric": "headline_query_wall_clock_total", "value": 1.0,
        "unit": "sec", "queries": {"a": 1.0}, "sf": 0.1,
        "run_id": "rW", "calibration": 0.598,
        "calibration_samples": [0.598, 0.424, 0.348],
        "probe_spread": {"calibration": 1.718},
    }))
    recorded = tmp_path / "BENCH_RECORDED.json"
    monkeypatch.setattr(check_bench, "RECORDED_PATH", str(recorded))
    monkeypatch.setattr(check_bench, "ALLQ_PATH", str(tmp_path / "m1"))
    monkeypatch.setattr(check_bench, "SECONDARY_PATH", str(tmp_path / "m2"))
    monkeypatch.setattr(
        check_bench, "FLAGS_PATH", str(tmp_path / "BENCH_FLAGS.json")
    )
    assert check_bench.main(["--record", str(artifact)]) == 0
    doc = json.loads(recorded.read_text())
    assert doc["calibration_samples"] == [0.598, 0.424, 0.348]


def test_additive_slack_absorbs_scheduling_jitter_on_tiny_entries():
    """Round-13: entries recorded near the floor are scheduling-bound;
    ~0.3s of per-run jitter must not read as a 2x regression, while a
    real blow-up on the same entry still flags."""
    # the round-13 run-3 false-flag shapes: 0.301 -> 0.573, 0.446 -> 0.786
    regs, _, _ = check_bench.compare(
        {"centroid": 0.301, "moments": 0.446},
        {"centroid": 0.573, "moments": 0.786},
    )
    assert regs == []
    # a genuine 10x regression on the same tiny entry still flags
    regs, _, _ = check_bench.compare({"centroid": 0.301}, {"centroid": 3.0})
    assert regs == [("centroid", 0.301, 3.0)]
    # slack is negligible for normal-sized entries: 2.2x on a 2 s entry
    regs, _, _ = check_bench.compare({"big": 2.0}, {"big": 4.5})
    assert regs == [("big", 2.0, 4.5)]
