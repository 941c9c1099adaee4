#!/usr/bin/env python
"""Mechanical physical-plan audit over the ENTIRE query registry.

For every ``queries()`` entry, builds the DataFrame at sf0.001 and
inspects the executed-plan text for the shapes that decide 100 TB
viability:

- ``exchanges``      shuffle count (every one is a full network pass)
- ``scans``          parquet scan count (re-reads of the same fact)
- ``cartesian``      unbounded CartesianProduct (banned — a plan bug)
- ``bnlj``           BroadcastNestedLoopJoin (fine for 1-row scalars)
- ``python_stages``  Arrow/Pandas UDF stages (slow path — only the
                     documented vector/multimodal operators may carry
                     them)
- ``row_sorts``      global Sort without a partition bound (top-k via
                     TakeOrderedAndProject does NOT count)

Writes ``PLAN_AUDIT.json`` (per-query metrics + run metadata) and
prints a summary.  ``tests/test_plan_audit.py`` asserts the global
invariants (no cartesians anywhere; Python stages only on the
allowlisted operators).

Usage::

    python scripts/plan_audit.py            # all queries, sf0.001
    python scripts/plan_audit.py NAME ...   # subset
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.001")

#: operators whose semantics genuinely need an Arrow-batched Python
#: stage (vector math over array columns, native codec decode, custom
#: stateful logic) — everything else must stay JVM-side
PYTHON_STAGE_ALLOWLIST = {
    "ann_brute_force", "ann_lsh", "ann_ivf", "ann_pq", "ann_ivf_pq",
    "ann_mmr", "ann_ivf_full_probe", "als_part_recommender",
    "als_ann_recommender", "semantic_dedup_lsh", "semantic_dedup_keep",
    "embedding_mahalanobis", "embedding_fd_sketch", "embedding_centroids",
    "embedding_whiten_check", "pca_explained_variance",
    "label_effective_rank", "hard_negative_pairs", "truncated_dim_recall",
    "multimodal_metadata", "frame_grid", "quality_classifier_train",
    "langid_train", "unigram_tokenizer_train", "bpe_merges",
    "streaming_timeout_sessions", "centroid_label_confusion",
    "embedding_quantize", "embedding_cosine_pairs",
    # count-min sketch candidates merge in an Arrow-batched UDAF by
    # design (exact verification stays JVM-side)
    "heavy_hitter_users",
    # FFD bin packing is inherently sequential per shard —
    # applyInPandas over salted shards is the documented design
    "pack_sequences",
}


def audit_one(plan: str) -> dict:
    lines = plan.splitlines()
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "scans": sum(
            1 for l in lines if "FileScan" in l or "Scan parquet" in l
        ),
        "cartesian": "CartesianProduct" in plan,
        "bnlj": "BroadcastNestedLoopJoin" in plan,
        "python_stages": len(
            re.findall(
                r"BatchEvalPython|ArrowEvalPython|MapInPandas"
                r"|FlatMapGroupsInPandas|AggregateInPandas", plan
            )
        ),
        "row_at_a_time_python": "BatchEvalPython" in plan,
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "take_ordered": "TakeOrderedAndProject" in plan,
    }


def main() -> int:
    import __spark_entry__ as entrymod
    from wistia_video_analytics_project_spark.cache import release_caches
    from wistia_video_analytics_project_spark.plans import executed_plan
    from wistia_video_analytics_project_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("plan-audit")
    qs = entrymod.queries()
    out: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            out[name] = audit_one(executed_plan(df))
        except Exception as e:  # noqa: BLE001 — audit must cover all
            errors[name] = str(e)[:200]
        release_caches()
        print(f"# {name}: {out.get(name, 'ERROR')}", file=sys.stderr)

    cart = sorted(n for n, m in out.items() if m["cartesian"])
    row_py = sorted(n for n, m in out.items() if m["row_at_a_time_python"])
    off_list = sorted(
        n
        for n, m in out.items()
        if m["python_stages"] and n not in PYTHON_STAGE_ALLOWLIST
    )
    heavy = sorted(out.items(), key=lambda kv: -kv[1]["exchanges"])[:10]
    doc = {
        "sf_dir": SF_DIR,
        "n_queries": len(out),
        "errors": errors,
        "cartesian_products": cart,
        "row_at_a_time_python": row_py,
        "python_stages_off_allowlist": off_list,
        "max_exchanges": heavy[0][1]["exchanges"] if heavy else 0,
        "queries": out,
    }
    if not only:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(here, "PLAN_AUDIT.json"), "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
    print(
        f"audited {len(out)} queries: cartesians={cart or 'none'}, "
        f"row-at-a-time python={row_py or 'none'}, "
        f"python off-allowlist={off_list or 'none'}, "
        f"errors={len(errors)}"
    )
    print("top exchanges: " + ", ".join(f"{n}={m['exchanges']}" for n, m in heavy))
    spark.stop()
    return 1 if (cart or row_py or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
