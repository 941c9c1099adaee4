#!/usr/bin/env python
"""Round-over-round drift tracker for the approximate operator tier.

The oracle gate hash-checks exact queries every round, but the
rows-only approximates (minhash, simhash, SRP-LSH, IVF, PQ, IVFADC,
HLL, KLL, Theta) were only guarded by pytest PASS/FAIL thresholds —
a recall that quietly sinks from 0.9 to 0.4 while staying above an
0.3 assert floor is invisible.  This script measures the same
quality metrics the pytests assert and writes them to a JSON artifact
(``APPROX_REPORT.json`` by default; commit a copy as
``APPROX_r{N}.json`` per round) so drift is diffable the way oracle
hashes are::

    python scripts/approx_report.py            # sf0.001, ~1-2 min
    python scripts/approx_report.py OUT.json

Metrics (higher recall is better; errors are relative/rank errors):

- ``minhash_lsh``: recall of exact-Jaccard>=0.3 shingle pairs at LSH
  threshold 0.1; mean |est - exact| Jaccard on the recalled pairs.
- ``simhash``: recall of exact-Jaccard>=0.5 pairs at hamming<=8.
- ``srp_lsh`` / ``ivf`` / ``pq`` / ``ivf_pq``: mean recall@5 vs the
  exact brute-force top-5 over a fixed 20-query set.  IVF/IVFADC are
  measured at TWO operating points: the SPEED point (nprobe=4 of 16
  cells, unrefined centroids — 25% corpus scan, the cheapest partial
  probe; on the synthetic near-uniform embeddings, IVF's worst case,
  recall sits near the scan fraction by construction) and the QUALITY
  point (nprobe=8 of 16, 2 Lloyd refinements, IVFADC rerank shortlist
  100 — target recall@5 >= 0.7, asserted in tests/test_similarity.py;
  measured 0.81 for both, i.e. cell-limited, the PQ shortlist loses
  nothing).  Real clustered embeddings
  land between the two; both dials are caller-visible parameters.
- ``semantic_dedup_lsh``: drop-set recall vs the exact drop set.
- ``hll``: max relative error of 7-day rolling distinct users.
- ``kll``: max rank error at p50/p90 of event values.
- ``theta``: max relative error across the 5 set-cardinality outputs
  (n_a, n_b, n_both, n_either, n_only_a — everything
  ``segment_overlap_theta`` emits).

All inputs are the driver-generated parquet tables; every metric is
deterministic (fixed seeds in the operators), so a changed number in
the diff means the CODE changed, not the data.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.001")


def _topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def _mean_recall(truth: dict, got: dict, k: int) -> float:
    recalls = [len(truth[q] & got.get(q, set())) / k for q in truth]
    return round(sum(recalls) / len(recalls), 4)


def main() -> int:
    from pyspark.sql import functions as F

    from wistia_video_analytics_project_spark.operators import (
        analytics,
        dedup,
        similarity,
        sketch,
    )
    from wistia_video_analytics_project_spark.session import (
        configure_runtime,
        get_spark,
    )
    from wistia_video_analytics_project_spark.sources import load_table

    spark = get_spark("approx-report")
    configure_runtime(spark)
    report: dict[str, dict] = {}

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    events = load_table(spark, SF_DIR, "events")

    # --- minhash vs exact n-gram jaccard -------------------------------
    exact = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    approx = {
        (r.doc_id_a, r.doc_id_b): r.est_jaccard
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.1).collect()
    }
    hit = set(exact) & set(approx)
    report["minhash_lsh"] = {
        "strong_pair_recall": round(len(hit) / len(exact), 4) if exact else None,
        "n_strong_pairs": len(exact),
        "mean_abs_jaccard_err": round(
            sum(abs(exact[p] - approx[p]) for p in hit) / len(hit), 4
        ) if hit else None,
    }

    # --- simhash -------------------------------------------------------
    strong = {
        (r.doc_id_a, r.doc_id_b)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    sh = {
        (r.doc_id_a, r.doc_id_b)
        for r in dedup.simhash_pairs(docs, max_hamming=8).collect()
    }
    report["simhash"] = {
        "strong_pair_recall": round(len(strong & sh) / len(strong), 4)
        if strong else None,
        "n_strong_pairs": len(strong),
    }

    # --- ANN family: recall@5 vs brute force over 20 fixed queries -----
    queries = emb.filter("vec_id < 20")
    k = 5
    truth = _topk_sets(similarity.brute_force_topk(queries, emb, k=k).collect())
    report["srp_lsh"] = {
        "recall_at_5": _mean_recall(truth, _topk_sets(
            similarity.ann_lsh_topk(
                queries, emb, dim=similarity.EMB_DIM, k=k).collect()), k),
    }
    report["ivf"] = {
        "recall_at_5_nprobe4of16": _mean_recall(truth, _topk_sets(
            similarity.ann_ivf_topk(
                queries, emb, k=k, n_centroids=16, nprobe=4).collect()), k),
        "recall_at_5_nprobe8of16_refined2": _mean_recall(truth, _topk_sets(
            similarity.ann_ivf_topk(
                queries, emb, k=k, n_centroids=16, nprobe=8,
                refine_iterations=2).collect()), k),
    }
    report["pq"] = {
        "recall_at_5": _mean_recall(truth, _topk_sets(
            similarity.ann_pq_topk(queries, emb, k=k).collect()), k),
    }
    report["ivf_pq"] = {
        "recall_at_5_nprobe4of16": _mean_recall(truth, _topk_sets(
            similarity.ann_ivf_pq_topk(
                queries, emb, k=k, n_centroids=16, nprobe=4).collect()), k),
        "recall_at_5_nprobe8of16_refined2_sl100": _mean_recall(
            truth, _topk_sets(
                similarity.ann_ivf_pq_topk(
                    queries, emb, k=k, n_centroids=16, nprobe=8,
                    shortlist=100, refine_iterations=2).collect()), k),
    }

    # --- semantic dedup drop-set recall --------------------------------
    sl = emb.filter("vec_id < 300")
    exact_drop = {r.vec_id for r in similarity.near_dup_drop_ids(
        sl, threshold=0.4, strategy="exact").collect()}
    lsh_drop = {r.vec_id for r in similarity.near_dup_drop_ids(
        sl, threshold=0.4, strategy="lsh", dim=similarity.EMB_DIM).collect()}
    report["semantic_dedup_lsh"] = {
        "drop_set_recall": round(len(lsh_drop) / len(exact_drop), 4)
        if exact_drop else None,
        "n_exact_drops": len(exact_drop),
        "lsh_subset_of_exact": lsh_drop <= exact_drop,
    }

    # --- HLL rolling distinct ------------------------------------------
    daily = events.select(F.to_date("ts").alias("day"), "user_id")
    exact_roll = {r.day: r.n_distinct for r in analytics.sliding_distinct(
        daily, "day", "user_id", 7).collect()}
    sk = sketch.daily_hll_sketches(daily, "day", "user_id")
    approx_roll = {r.day: r.approx_distinct
                   for r in sketch.hll_rolling_distinct(sk, 7).collect()}
    report["hll"] = {
        "max_rel_err_rolling7": round(max(
            abs(approx_roll[d] - n) / max(n, 1) for d, n in exact_roll.items()
        ), 4),
        "n_days": len(exact_roll),
    }

    # --- KLL quantiles (rank error) ------------------------------------
    vals = events.select(F.to_date("ts").alias("day"), "value")
    ksk = sketch.daily_kll_sketches(vals, "day", "value")
    kq = sketch.kll_quantiles_over_all(ksk, (0.5, 0.9)).collect()[0]
    n = events.count()
    rank_errs = {}
    for name, q in (("p50", 0.5), ("p90", 0.9)):
        rank = events.filter(F.col("value") <= kq[name]).count() / n
        rank_errs[name] = round(abs(rank - q), 4)
    report["kll"] = {"rank_err": rank_errs}

    # --- Theta set operations ------------------------------------------
    got = sketch.segment_overlap_theta(
        events, "user_id",
        F.col("event_type") == "view", F.col("event_type") == "purchase",
    ).collect()[0]
    viewers = {r.user_id for r in events.filter("event_type = 'view'")
               .select("user_id").distinct().collect()}
    buyers = {r.user_id for r in events.filter("event_type = 'purchase'")
              .select("user_id").distinct().collect()}
    exacts = {
        "n_a": len(viewers), "n_b": len(buyers),
        "n_both": len(viewers & buyers), "n_either": len(viewers | buyers),
        "n_only_a": len(viewers - buyers),
    }
    report["theta"] = {
        "max_rel_err": round(max(
            abs(got[k_] - v) / max(v, 1) for k_, v in exacts.items()
        ), 4),
    }

    # --- Frequent-Directions sketch: achieved Gram error vs bound -----
    import numpy as np

    from wistia_video_analytics_project_spark.operators import linalg

    from wistia_video_analytics_project_spark.operators.similarity import (
        EMB_DIM as _EMB_DIM,
    )

    emb_d = emb.selectExpr(
        "CAST(embedding AS array<double>) AS embedding"
    )
    b = linalg.frequent_directions(
        emb_d, "embedding", ell=linalg.FD_SKETCH_ELL, dim=_EMB_DIM
    )
    a = np.array(
        [list(r.embedding) for r in emb_d.collect()], dtype=np.float64
    )
    gap = float(np.linalg.norm(a.T @ a - b.T @ b, 2))
    budget = float((a * a).sum() / linalg.FD_SKETCH_ELL)
    report["frequent_directions"] = {
        "gram_err_over_budget_ell16": round(gap / budget, 4),
        "bound_holds": gap <= budget + 1e-6,
    }

    # --- bloom contamination: observed vs planner-predicted FPP --------
    # (the bloom_fpp_planner query predicts (1-e^{-kn/m})^k; measure the
    # filter's actual false-positive rate on probes disjoint from the
    # benchmark — mirrors tests/test_cleaning.py::
    # test_contamination_bloom_fpp_matches_planner_prediction)
    import math

    from wistia_video_analytics_project_spark.operators import cleaning

    bench = spark.createDataFrame(
        [(1, " ".join(f"b{i}" for i in range(2004)))],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [(2, " ".join(f"p{i}" for i in range(8004)))],
        "doc_id long, text string",
    )
    expected_items, bits_per_key, k = 2000, 8, 5
    n_bits = ((expected_items * bits_per_key + 63) // 64) * 64
    row = cleaning.ngram_contamination_bloom(
        probes, bench, n=5, expected_items=expected_items,
        bits_per_item=bits_per_key, k_hashes=k,
    ).collect()[0]
    predicted = (1.0 - math.exp(-k * expected_items / n_bits)) ** k
    report["bloom_fpp"] = {
        "predicted": round(predicted, 4),
        "observed": round(row.n_contaminated / row.n_ngrams, 4),
        "n_probes": int(row.n_ngrams),
        "bits_per_key": bits_per_key,
        "k_hashes": k,
    }

    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "APPROX_REPORT.json",
    )
    doc = {"sf_dir": SF_DIR, "metrics": report}
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps(doc, indent=1, sort_keys=True))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
