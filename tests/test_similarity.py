"""Similarity search: brute-force correctness + LSH recall."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from wistia_video_analytics_project_spark.operators import similarity

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_cosine_matches_python(spark):
    a = [1.0, 2.0, 3.0]
    b = [2.0, 0.0, 1.0]
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    got = df.select(similarity.cosine(F.col("a"), F.col("b")).alias("c")).collect()[0].c
    dot = sum(x * y for x, y in zip(a, b))
    want = dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))
    assert abs(got - want) < 1e-12


def test_brute_force_topk_shape(spark, emb):
    queries = emb.filter("vec_id < 3")
    out = similarity.brute_force_topk(queries, emb, k=5).collect()
    assert len(out) == 15
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        sims = [r.cosine_sim for r in sorted(rows, key=lambda r: r.rnk)]
        assert sims == sorted(sims, reverse=True)
        assert all(r.neighbor_id != q for r in rows)


def test_ann_lsh_recall(spark, emb):
    """SRP-LSH top-5 must recover a decent fraction of true top-5 and the
    true top-1 for most queries (16-bit sigs, 2 bands on random-ish data)."""
    queries = emb.filter("vec_id < 10")
    brute = similarity.brute_force_topk(queries, emb, k=5).collect()
    ann = similarity.ann_lsh_topk(queries, emb, dim=similarity.EMB_DIM, k=5).collect()
    truth = {}
    for r in brute:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in ann:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(truth[q] & got.get(q, set())) / 5 for q in truth]
    assert sum(recalls) / len(recalls) >= 0.3, f"mean recall too low: {recalls}"


def test_srp_signatures_deterministic(spark, emb):
    s1 = {r.vec_id: r.sig for r in
          similarity.srp_signatures(emb, similarity.EMB_DIM).collect()}
    s2 = {r.vec_id: r.sig for r in
          similarity.srp_signatures(emb.repartition(5), similarity.EMB_DIM).collect()}
    assert s1 == s2


def test_ann_ivf_full_probe_equals_brute_force(spark, emb):
    """nprobe == n_centroids scans every cell: must EQUAL brute force."""
    queries = emb.filter("vec_id < 5")
    brute = {(r.query_id, r.rnk): r.neighbor_id
             for r in similarity.brute_force_topk(queries, emb, k=5).collect()}
    full = {(r.query_id, r.rnk): r.neighbor_id
            for r in similarity.ann_ivf_topk(
                queries, emb, k=5, n_centroids=8, nprobe=8).collect()}
    assert full == brute


def test_ann_ivf_partial_probe_recall(spark, emb):
    queries = emb.filter("vec_id < 10")
    brute = similarity.brute_force_topk(queries, emb, k=5).collect()
    ivf = similarity.ann_ivf_topk(queries, emb, k=5, n_centroids=16, nprobe=4).collect()
    truth, got = {}, {}
    for r in brute:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in ivf:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(truth[q] & got.get(q, set())) / 5 for q in truth]
    assert sum(recalls) / len(recalls) >= 0.25, f"mean recall too low: {recalls}"


def test_ivf_assign_deterministic(spark, emb):
    cents = similarity.ivf_centroids(emb, 8)
    a = {(r.vec_id, r.cell) for r in similarity.ivf_assign(emb, cents).collect()}
    b = {(r.vec_id, r.cell)
         for r in similarity.ivf_assign(emb.repartition(7), cents).collect()}
    assert a == b


def test_brute_force_np_agrees_with_builtin(spark, emb):
    queries = emb.filter("vec_id < 5")
    builtin = {(r.query_id, r.neighbor_id)
               for r in similarity.brute_force_topk(queries, emb, k=5).collect()}
    vectorized = {(r.query_id, r.neighbor_id)
                  for r in similarity.brute_force_topk_np(queries, emb, k=5).collect()}
    # identical neighbor sets barring 6th-decimal ties (none in this data)
    assert vectorized == builtin


def test_brute_force_np_large_query_set_falls_back_to_join(spark, emb, monkeypatch):
    """Query sets over the collect cap must never reach the driver: the
    operator routes to the distributed join path (no broadcast hint —
    AQE may still broadcast at toy scale) with identical results."""
    queries = emb.filter("vec_id < 5")
    want = {(r.query_id, r.neighbor_id)
            for r in similarity.brute_force_topk(queries, emb, k=3).collect()}
    calls = []
    real = similarity.brute_force_topk

    def spy(*args, **kwargs):
        calls.append(kwargs)
        return real(*args, **kwargs)

    monkeypatch.setattr(similarity, "brute_force_topk", spy)
    out = similarity.brute_force_topk_np(queries, emb, k=3, max_query_rows=2)
    got = {(r.query_id, r.neighbor_id) for r in out.collect()}
    assert got == want
    assert calls == [{"broadcast_queries": False}]
    # under the cap the numpy path runs: no fallback call
    calls.clear()
    similarity.brute_force_topk_np(queries, emb, k=3, max_query_rows=100)
    assert calls == []


def test_ivf_lloyd_refinement_runs_and_improves_or_holds(spark, emb):
    """Refined centroids must stay correct (full probe == brute force)
    and partial-probe recall should not collapse vs sampled centroids."""
    queries = emb.filter("vec_id < 10")
    brute = similarity.brute_force_topk(queries, emb, k=5).collect()
    truth = {}
    for r in brute:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    def mean_recall(res):
        got = {}
        for r in res:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(len(truth[q] & got.get(q, set())) / 5 for q in truth) / len(truth)

    plain = similarity.ann_ivf_topk(queries, emb, k=5, n_centroids=16, nprobe=4)
    refined = similarity.ann_ivf_topk(
        queries, emb, k=5, n_centroids=16, nprobe=4, refine_iterations=2
    )
    r_plain, r_ref = mean_recall(plain.collect()), mean_recall(refined.collect())
    assert r_ref >= max(0.2, r_plain - 0.15), (r_plain, r_ref)
    # correctness invariant unchanged under refinement: full probe == brute
    full = {(r.query_id, r.rnk): r.neighbor_id
            for r in similarity.ann_ivf_topk(
                queries.filter("vec_id < 3"), emb, k=5,
                n_centroids=8, nprobe=8, refine_iterations=1).collect()}
    brute3 = {(r.query_id, r.rnk): r.neighbor_id
              for r in similarity.brute_force_topk(
                  queries.filter("vec_id < 3"), emb, k=5).collect()}
    assert full == brute3


def test_ivf_persisted_index_prunes_and_matches(spark, emb, tmp_path):
    """Persisted-index path: results equal the in-memory IVF, and the
    index scan is partition-pruned to the probed cells."""
    from wistia_video_analytics_project_spark import plans

    idx = str(tmp_path / "ivf")
    similarity.ivf_write_index(emb, idx, n_centroids=8)
    queries = emb.filter("vec_id < 5")
    from_index = similarity.ivf_query_index(spark, idx, queries, k=5, nprobe=2)
    in_memory = similarity.ann_ivf_topk(queries, emb, k=5, n_centroids=8, nprobe=2)
    assert sorted(map(tuple, from_index.collect())) == sorted(
        map(tuple, in_memory.collect())
    )
    plan = plans.executed_plan(from_index)
    import re

    all_pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("cell" in pf for pf in all_pf), plan


def test_semantic_dedup_keep_invariants(spark, emb):
    """Dominated-by-earlier rule on a bounded slice: every dropped id has
    an earlier id within the threshold; no kept id does."""
    sl = emb.filter("vec_id < 150")
    kept = {r.vec_id for r in
            similarity.semantic_dedup_keep(sl, threshold=0.4).collect()}
    all_ids = {r.vec_id for r in sl.select("vec_id").collect()}
    pairs = similarity.cosine_pairs(sl, threshold=0.4).collect()
    dominated = {r.id_b for r in pairs}
    assert kept == all_ids - dominated
    assert kept  # slice is not degenerate


def test_semantic_dedup_lsh_subset_and_recall(spark, emb):
    """LSH candidates are a subset of all pairs, so its drop set is a
    subset of the exact drop set; band collisions must still find most
    true near-dups at this threshold."""
    sl = emb.filter("vec_id < 300")
    exact_drop = {r.vec_id for r in similarity.near_dup_drop_ids(
        sl, threshold=0.4, strategy="exact").collect()}
    lsh_drop = {r.vec_id for r in similarity.near_dup_drop_ids(
        sl, threshold=0.4, strategy="lsh", dim=similarity.EMB_DIM).collect()}
    assert lsh_drop <= exact_drop
    if exact_drop:
        recall = len(lsh_drop) / len(exact_drop)
        assert recall >= 0.5, f"drop-set recall too low: {recall}"


def test_semantic_dedup_requires_dim_for_lsh(spark, emb):
    with pytest.raises(ValueError):
        similarity.near_dup_drop_ids(emb, 0.4, strategy="lsh")
    with pytest.raises(ValueError):
        similarity.near_dup_drop_ids(emb, 0.4, strategy="nope")


def test_pq_rerank_recall(spark, emb):
    """ADC shortlist + exact re-rank recovers most true top-5; the pure
    compressed-domain shortlist alone is the coarse filter."""
    queries = emb.filter("vec_id < 10")
    brute = similarity.brute_force_topk(queries, emb, k=5).collect()
    pq = similarity.ann_pq_topk(queries, emb, k=5, m=8, n_codes=32,
                                shortlist=50).collect()
    truth, got = {}, {}
    for r in brute:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in pq:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(truth[q] & got.get(q, set())) / 5 for q in truth]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_pq_encode_shape_and_determinism(spark, emb):
    books = similarity.pq_train(emb, m=8, n_codes=16)
    assert len(books) == 8 and all(len(b) <= 16 for b in books)
    assert all(len(c) == similarity.EMB_DIM // 8 for b in books for c in b)
    c1 = {r.vec_id: list(r.codes) for r in similarity.pq_encode(emb, books).collect()}
    c2 = {r.vec_id: list(r.codes) for r in similarity.pq_encode(emb, books).collect()}
    assert c1 == c2
    assert all(len(v) == 8 and all(0 <= x < 16 for x in v) for v in c1.values())


def test_pq_train_rejects_indivisible_dim(spark, emb):
    with pytest.raises(ValueError):
        similarity.pq_train(emb, m=7)


def test_ivf_pq_recall_improves_with_nprobe(spark, emb):
    """IVFADC: recall must rise monotonically-ish with nprobe and reach
    the PQ-only ceiling at full probe (every cell scanned)."""
    queries = emb.filter("vec_id < 10")
    brute = similarity.brute_force_topk(queries, emb, k=5).collect()
    truth = {}
    for r in brute:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(nprobe):
        out = similarity.ann_ivf_pq_topk(
            queries, emb, k=5, n_centroids=16, nprobe=nprobe, shortlist=50
        ).collect()
        got = {}
        for r in out:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(len(truth[q] & got.get(q, set())) / 5 for q in truth) / len(truth)

    r_low, r_full = recall(4), recall(16)
    assert r_full >= r_low, (r_low, r_full)
    assert r_full >= 0.6, r_full

    pq_only = similarity.ann_pq_topk(
        queries, emb, k=5, m=8, n_codes=32, shortlist=50
    ).collect()
    got_pq = {}
    for r in pq_only:
        got_pq.setdefault(r.query_id, set()).add(r.neighbor_id)
    r_pq = sum(len(truth[q] & got_pq.get(q, set())) / 5 for q in truth) / len(truth)
    # full probe == PQ-only candidates (same codes, same shortlist)
    assert abs(r_full - r_pq) < 1e-9, (r_full, r_pq)


def test_topk_deterministic_at_score_ties(spark):
    """Per-batch shortlist truncation must not depend on partition
    layout at exact score ties (round-2 ADVICE: bare argpartition broke
    ties arbitrarily). A corpus of many identical vectors ties every
    score — the survivors must be the lowest neighbor_ids, on any
    layout."""
    vec = [1.0, 0.0, 0.0, 0.0]
    corpus_rows = [(i, vec) for i in range(40)]
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id long, embedding array<float>"
    )
    queries = corpus.filter("vec_id = 0")

    def run(c):
        return {
            (r.query_id, r.neighbor_id, r.rnk)
            for r in similarity.brute_force_topk_np(queries, c, k=5).collect()
        }

    want = {(0, n, n) for n in range(1, 6)}  # lowest ids win ties
    assert run(corpus.repartition(1)) == want
    assert run(corpus.repartition(7)) == want
    assert run(corpus.repartition(17, "vec_id")) == want


def test_ivf_add_to_index_incremental(spark, tmp_path):
    """Incremental add: new vectors join the frozen-centroid index, are
    findable at cosine 1.0 by an identical query vector, and the index
    grows by exactly the batch size with assignments matching
    ivf_assign against the frozen centroids."""
    import json
    import os

    from wistia_video_analytics_project_spark.operators import similarity
    from wistia_video_analytics_project_spark.sources import load_table

    from conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivf")
    similarity.ivf_write_index(half_a, path, n_centroids=8)
    n_a = spark.read.parquet(os.path.join(path, "cells")).count()

    similarity.ivf_add_to_index(spark, path, half_b)
    cells = spark.read.parquet(os.path.join(path, "cells"))
    assert cells.count() == n_a + half_b.count()

    # assignments of the added batch match the frozen centroid table
    with open(os.path.join(path, "centroids.json")) as f:
        cents = [(int(c), v) for c, v in json.load(f)]
    expect = {
        (r.vec_id, r.cell)
        for r in similarity.ivf_assign(half_b, cents, nprobe=1).collect()
    }
    got = {
        (r.vec_id, r.cell)
        for r in cells.join(half_b.select("vec_id"), "vec_id").select(
            "vec_id", "cell"
        ).collect()
    }
    assert got == expect

    # a query identical to an added vector finds it at cosine 1.0
    probe = half_b.orderBy("vec_id").limit(1).collect()[0]
    q = spark.createDataFrame(
        [(999999, probe.embedding)], "vec_id long, embedding array<float>"
    )
    top = similarity.ivf_query_index(spark, path, q, k=1, nprobe=1).collect()
    assert top and top[0].neighbor_id == probe.vec_id
    assert top[0].cosine_sim == 1.0


def test_pq_index_persist_query_recall(spark, tmp_path):
    """Persisted PQ index: shortlist+re-rank recall@5 vs exact brute
    force stays high, and with shortlist == corpus size the result
    EQUALS brute force (re-rank is exact)."""
    from wistia_video_analytics_project_spark.operators import similarity
    from wistia_video_analytics_project_spark.sources import load_table

    from conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path / "pq")
    similarity.pq_write_index(emb, path, m=8, n_codes=16)

    queries = emb.orderBy("vec_id").limit(8)
    exact = similarity.brute_force_topk(queries, emb, k=5)
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)

    got = similarity.pq_query_index(spark, path, queries, k=5, shortlist=32)
    got_sets = {}
    for r in got.collect():
        got_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(exact_sets[q] & got_sets.get(q, set())) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total >= 0.6, f"recall {hits}/{total}"

    n = emb.count()
    full = similarity.pq_query_index(spark, path, queries, k=5, shortlist=n)
    full_rows = {(r.query_id, r.neighbor_id, r.cosine_sim) for r in full.collect()}
    exact_rows = {(r.query_id, r.neighbor_id, r.cosine_sim) for r in exact.collect()}
    assert full_rows == exact_rows


def test_hard_negatives_labels_always_differ(spark):
    """Every mined pair crosses a label boundary, ranks are dense per
    query, and each negative is at least as similar as the next rank."""
    from wistia_video_analytics_project_spark.sources.readers import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = similarity.hard_negatives(
        emb.filter(F.col("vec_id") < 10), emb, k=3
    ).collect()
    assert len(out) == 30
    by_q = {}
    for r in out:
        assert r.query_label != r.neighbor_label
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rows] == [1, 2, 3]
        sims = [r.cosine_sim for r in rows]
        assert sims == sorted(sims, reverse=True)


def test_ivf_compaction_policy_restores_recall(spark, emb, tmp_path):
    """Continuous-ingestion maintenance: a skewed incremental batch
    (near-duplicates piling into one frozen cell) trips the health
    thresholds; compaction re-trains and the rebuilt index's recall
    equals a from-scratch build on the same corpus (same deterministic
    training pipeline)."""
    idx = str(tmp_path / "ivf_maint")
    base = emb.filter("vec_id < 80")
    similarity.ivf_write_index(base, idx, n_centroids=8, refine_iterations=2)
    h0 = similarity.ivf_index_health(spark, idx)
    assert h0["n_vectors"] == 80 and h0["n_cells"] == 8

    # adversarial batch: 60 jittered copies of one base vector -> all
    # land in that vector's (frozen) cell
    seed_vec = base.filter("vec_id = 0").collect()[0]["embedding"]
    jitter = [
        (
            10_000 + i,
            [float(v) + 1e-4 * ((i + j) % 7) for j, v in enumerate(seed_vec)],
            0,
        )
        for i in range(60)
    ]
    batch = spark.createDataFrame(
        jitter, "vec_id long, embedding array<float>, label long"
    ).select("vec_id", "embedding", "label")
    similarity.ivf_add_to_index(spark, idx, batch.select("vec_id", "embedding"))

    h1 = similarity.ivf_index_health(spark, idx)
    assert h1["n_vectors"] == 140
    assert h1["skew_ratio"] > h0["skew_ratio"]
    assert h1["max_cell"] >= 60

    # below-threshold call is a no-op
    noop = similarity.ivf_compact_index(
        spark, idx, skew_threshold=h1["skew_ratio"] + 1
    )
    assert noop["rebuilt"] is False

    res = similarity.ivf_compact_index(spark, idx, skew_threshold=3.0)
    assert res["rebuilt"] is True
    h2 = similarity.ivf_index_health(spark, idx)
    assert h2["n_vectors"] == 140
    assert h2["skew_ratio"] <= h1["skew_ratio"]

    # recall after incremental adds + rebuild == from-scratch build on
    # the union corpus (identical deterministic training pipeline)
    union = base.select("vec_id", "embedding").unionByName(
        batch.select("vec_id", "embedding")
    )
    fresh = str(tmp_path / "ivf_fresh")
    similarity.ivf_write_index(union, fresh, n_centroids=8, refine_iterations=2)
    queries = emb.filter("vec_id < 10").select("vec_id", "embedding")

    def topk(path):
        return sorted(
            map(
                tuple,
                similarity.ivf_query_index(
                    spark, path, queries, k=5, nprobe=2
                ).collect(),
            )
        )

    assert topk(idx) == topk(fresh)


def test_ivf_ingest_loop_full_maintenance_cycle(spark, emb, tmp_path):
    """Round-5 VERDICT item: the full degrade -> compact -> recover
    cycle under a REAL ingestion loop, not one adversarial batch.
    Sequential ``ivf_add_to_index`` batches of drifted vectors pile
    into frozen cells until the health policy trips; compaction then
    rebuilds, and partial-probe recall on the drifted region must come
    back to exactly the fresh-index level (deterministic pipeline)."""
    idx = str(tmp_path / "ivf_loop")
    base = emb.filter("vec_id < 80").select("vec_id", "embedding")
    similarity.ivf_write_index(base, idx, n_centroids=8, refine_iterations=2)
    h0 = similarity.ivf_index_health(spark, idx)

    # ingestion: batches of vectors jittered around one seed, i.e. a
    # drifting workload the frozen centroids never trained on
    seed_vec = [float(v) for v in base.filter("vec_id = 0").collect()[0]["embedding"]]
    tripped = False
    batch_no = 0
    while batch_no < 6 and not tripped:
        rows = [
            (
                20_000 + 100 * batch_no + i,
                [v + 2e-4 * ((batch_no + i + j) % 5) for j, v in enumerate(seed_vec)],
            )
            for i in range(20)
        ]
        batch = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        similarity.ivf_add_to_index(spark, idx, batch)
        batch_no += 1
        h = similarity.ivf_index_health(spark, idx)
        tripped = h["skew_ratio"] > 3.0
    assert tripped, f"6 drift batches never tripped the skew policy: {h}"
    assert h["n_vectors"] == 80 + 20 * batch_no
    assert h["skew_ratio"] > h0["skew_ratio"]

    res = similarity.ivf_compact_index(spark, idx, skew_threshold=3.0)
    assert res["rebuilt"] is True
    h2 = similarity.ivf_index_health(spark, idx)
    assert h2["n_vectors"] == h["n_vectors"]
    assert h2["skew_ratio"] < h["skew_ratio"]

    # recovery: rebuilt index == from-scratch build on the same corpus,
    # compared on actual partial-probe query results over the drifted
    # region (the workload the stale centroids served worst)
    union = spark.read.parquet(f"{idx}/cells").drop("cell")
    fresh = str(tmp_path / "ivf_loop_fresh")
    similarity.ivf_write_index(
        union, fresh, n_centroids=8, refine_iterations=2
    )
    queries = emb.filter("vec_id < 10").select("vec_id", "embedding")

    def topk(path):
        return sorted(
            (r.query_id, r.rnk, r.neighbor_id)
            for r in similarity.ivf_query_index(
                spark, path, queries, k=5, nprobe=2
            ).collect()
        )

    assert topk(idx) == topk(fresh)


def test_mmr_lambda_one_equals_plain_topk(spark, emb):
    """lam=1 removes the redundancy term: MMR must reproduce the plain
    relevance top-k order exactly."""
    queries = emb.filter("vec_id < 5")
    plain = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in similarity.brute_force_topk(queries, emb, k=5).collect()
    }
    mmr = {
        (r.query_id, r.mmr_rank): r.neighbor_id
        for r in similarity.mmr_rerank(
            queries, emb, k=5, pool=25, lam=1.0
        ).collect()
    }
    assert mmr == plain


def test_mmr_first_pick_is_top1_and_deterministic(spark, emb):
    queries = emb.filter("vec_id < 5")
    out = similarity.mmr_rerank(queries, emb, k=3, pool=10, lam=0.5)
    rows = out.collect()
    top1 = {
        r.query_id: r.neighbor_id
        for r in similarity.brute_force_topk(queries, emb, k=1).collect()
    }
    for r in rows:
        if r.mmr_rank == 1:
            # redundancy term is 0 for the first pick -> pure relevance
            assert r.neighbor_id == top1[r.query_id]
    again = similarity.mmr_rerank(
        queries.repartition(3), emb.repartition(5), k=3, pool=10, lam=0.5
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_mmr_diversifies_clustered_candidates(spark):
    """Two tight clusters: plain top-2 stays in the query's cluster;
    MMR's second pick crosses to the other cluster."""
    import numpy as np

    rng = np.random.RandomState(3)
    a = np.array([1.0, 0.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0, 0.0])
    rows = []
    for i in range(6):  # cluster A: ids 0-5
        v = a + 0.01 * rng.randn(4)
        rows.append((i, [float(x) for x in v], 0))
    for i in range(6, 12):  # cluster B: ids 6-11
        v = b + 0.01 * rng.randn(4)
        rows.append((i, [float(x) for x in v], 1))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )
    q = df.filter("vec_id = 0")
    plain = [
        r.neighbor_id
        for r in sorted(
            similarity.brute_force_topk(q, df, k=2).collect(),
            key=lambda r: r.rnk,
        )
    ]
    assert all(n < 6 for n in plain)  # same-cluster near-dups
    mmr = [
        r.neighbor_id
        for r in sorted(
            similarity.mmr_rerank(df.filter("vec_id = 0"), df, k=2,
                                  pool=11, lam=0.3).collect(),
            key=lambda r: r.mmr_rank,
        )
    ]
    assert mmr[0] == plain[0]  # relevance wins the first slot
    assert mmr[1] >= 6  # diversity pulls the second from cluster B


def test_ivf_quality_operating_point_recall(spark, emb):
    """The documented QUALITY operating point (nprobe 8/16 cells, 2
    Lloyd refinements) must reach recall@5 >= 0.7 for both IVF-flat and
    IVFADC on the synthetic embeddings — the worst-case (near-uniform)
    data for IVF.  The speed point (nprobe 4/16, unrefined) is measured
    separately in APPROX_REPORT.json and intentionally sits near its
    25% scan fraction."""
    queries = emb.filter("vec_id < 20")
    brute = similarity.brute_force_topk(queries, emb, k=5).collect()
    truth = {}
    for r in brute:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    def mean_recall(rows):
        got = {}
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(
            len(truth[q] & got.get(q, set())) / 5 for q in truth
        ) / len(truth)

    ivf = similarity.ann_ivf_topk(
        queries, emb, k=5, n_centroids=16, nprobe=8, refine_iterations=2
    ).collect()
    r_ivf = mean_recall(ivf)
    assert r_ivf >= 0.7, f"ivf quality-point recall {r_ivf}"
    ivfadc = similarity.ann_ivf_pq_topk(
        queries, emb, k=5, n_centroids=16, nprobe=8, shortlist=100,
        refine_iterations=2,
    ).collect()
    r_adc = mean_recall(ivfadc)
    assert r_adc >= 0.7, f"ivf_pq quality-point recall {r_adc}"


def test_ivf_delete_tombstones_and_compaction(spark, emb, tmp_path):
    """Full delete lifecycle: tombstoned ids vanish from queries
    IMMEDIATELY (no rewrite), health reports the tombstone debt,
    compaction triggered by tombstone fraction physically removes the
    rows and clears the set, and the post-compact index equals a fresh
    build on the surviving corpus."""
    path = str(tmp_path / "ivf_del")
    corpus = emb.filter("vec_id < 400")
    similarity.ivf_write_index(corpus, path, n_centroids=8)
    queries = emb.filter("vec_id >= 400 AND vec_id < 410")

    before = similarity.ivf_query_index(
        spark, path, queries, k=5, nprobe=8
    ).collect()
    victim_ids = sorted({r.neighbor_id for r in before})[:10]
    similarity.ivf_delete_from_index(spark, path, victim_ids)

    # 1) deletes visible immediately, no cell rewrite
    after = similarity.ivf_query_index(
        spark, path, queries, k=5, nprobe=8
    ).collect()
    assert not {r.neighbor_id for r in after} & set(victim_ids)

    # 2) health reports the debt
    h = similarity.ivf_index_health(spark, path)
    assert h["n_tombstones"] == len(victim_ids)
    assert h["tombstone_frac"] > 0

    # 3) compaction triggered by tombstone fraction alone (skew/empty
    # thresholds set un-trippable) physically removes rows + clears set
    res = similarity.ivf_compact_index(
        spark, path,
        skew_threshold=1e9, empty_frac_threshold=1.1,
        tombstone_frac_threshold=h["tombstone_frac"] / 2,
    )
    assert res["rebuilt"] is True
    h2 = similarity.ivf_index_health(spark, path)
    assert h2["n_tombstones"] == 0
    assert h2["n_vectors"] == h["n_vectors"] - len(victim_ids)

    # 4) post-compact equals a fresh build on the surviving corpus
    fresh = str(tmp_path / "ivf_fresh")
    surviving = corpus.filter(~F.col("vec_id").isin(victim_ids))
    similarity.ivf_write_index(
        surviving, fresh, n_centroids=8, refine_iterations=2
    )
    got = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in similarity.ivf_query_index(
            spark, path, queries, k=5, nprobe=8
        ).collect()
    }
    want = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in similarity.ivf_query_index(
            spark, fresh, queries, k=5, nprobe=8
        ).collect()
    }
    assert got == want

    # 5) deleting via a DataFrame also works and no-ops on absent ids
    df_ids = spark.createDataFrame([(99999,)], "vec_id long")
    similarity.ivf_delete_from_index(spark, path, df_ids)
    again = similarity.ivf_query_index(
        spark, path, queries, k=5, nprobe=8
    ).collect()
    assert {
        (r.query_id, r.rnk, r.neighbor_id) for r in again
    } == {
        (q, r, n) for (q, r), n in got.items()
    }


def test_ivf_delete_then_readd_resurrects(spark, emb, tmp_path):
    """Round-7 ADVICE (medium): tombstones are epoch-sequenced, so
    re-adding a previously deleted id (a) serves the NEW vector
    immediately, (b) keeps the pre-delete rows of that id hidden, and
    (c) survives compaction (the old anti-join-on-id design hid the
    fresh rows and the next compaction physically stripped them)."""
    path = str(tmp_path / "ivf_readd")
    corpus = emb.filter("vec_id < 200").select("vec_id", "embedding")
    similarity.ivf_write_index(corpus, path, n_centroids=8)
    queries = emb.filter("vec_id >= 400 AND vec_id < 405").select(
        "vec_id", "embedding"
    )

    # pick a victim that actually serves: the top-1 neighbor of q0
    full = similarity.ivf_query_index(spark, path, queries, k=3, nprobe=8)
    victim = sorted(
        (r.rnk, r.neighbor_id) for r in full.collect() if r.rnk == 1
    )[0][1]
    similarity.ivf_delete_from_index(spark, path, [victim])
    gone = similarity.ivf_query_index(spark, path, queries, k=3, nprobe=8)
    assert victim not in {r.neighbor_id for r in gone.collect()}

    # re-add the SAME id with the exact embedding of one query vector:
    # if the new row serves, it must rank at cosine ~1.0 for that query
    q0 = queries.orderBy("vec_id").collect()[0]
    readd = spark.createDataFrame(
        [(int(victim), [float(v) for v in q0.embedding])],
        "vec_id long, embedding array<float>",
    )
    similarity.ivf_add_to_index(spark, path, readd)
    back = similarity.ivf_query_index(
        spark, path, queries.filter(F.col("vec_id") == q0.vec_id),
        k=1, nprobe=8,
    ).collect()
    assert len(back) == 1 and back[0].neighbor_id == victim
    assert back[0].cosine_sim == pytest.approx(1.0, abs=1e-5)
    # exactly ONE row of the victim id serves (old pre-delete row stays
    # tombstoned), so no duplicate id can appear in a k=3 result either
    k3 = similarity.ivf_query_index(
        spark, path, queries.filter(F.col("vec_id") == q0.vec_id),
        k=3, nprobe=8,
    ).collect()
    assert sum(1 for r in k3 if r.neighbor_id == victim) == 1

    # compaction physically strips the dead row but KEEPS the re-added
    # one, and its return value is post-rebuild health (ADVICE: the old
    # return showed the pre-rebuild tombstone debt)
    h = similarity.ivf_index_health(spark, path)
    res = similarity.ivf_compact_index(
        spark, path,
        skew_threshold=1e9, empty_frac_threshold=1.1,
        tombstone_frac_threshold=h["tombstone_frac"] / 2,
    )
    assert res["rebuilt"] is True
    assert res["n_tombstones"] == 0 and res["tombstone_frac"] == 0.0
    assert res["trigger_health"]["n_tombstones"] == 1
    assert res["n_vectors"] == 200  # 200 - 1 deleted + 1 re-added
    still = similarity.ivf_query_index(
        spark, path, queries.filter(F.col("vec_id") == q0.vec_id),
        k=1, nprobe=8,
    ).collect()
    assert still[0].neighbor_id == victim
    assert still[0].cosine_sim == pytest.approx(1.0, abs=1e-5)


def test_ivf_assign_preserves_id_type(spark):
    """Round-7 ADVICE (als auto-ANN routing): ivf_assign's output id
    column inherits the INPUT id type instead of a hard-coded long, so
    string/decimal ids survive the ANN path."""
    rows = [(f"doc-{i}", [float(i % 3), 1.0, 0.5]) for i in range(12)]
    vecs = spark.createDataFrame(
        rows, "vec_id string, embedding array<float>"
    )
    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]
    out = similarity.ivf_assign(vecs, cents, nprobe=1)
    assert dict(out.dtypes)["vec_id"] == "string"
    got = {r.vec_id for r in out.collect()}
    assert got == {f"doc-{i}" for i in range(12)}


def test_ivf_meta_torn_write_self_heals(spark, tmp_path):
    """Round-8 VERDICT item 3: a torn / lost / garbage ``meta.json``
    must never leave ``next_epoch`` behind existing row or tombstone
    epochs.  Verify-on-read (sha256) detects corruption and rebuilds
    the counter from the data itself; a stray ``meta.json.tmp`` from a
    crash before the atomic rename is ignored."""
    import json
    import os

    from wistia_video_analytics_project_spark.operators.similarity import (
        _ivf_meta_read,
    )
    from wistia_video_analytics_project_spark.sources import load_table

    from conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    base = emb.filter(F.col("vec_id") < 100)
    path = str(tmp_path / "ivf_torn")
    similarity.ivf_write_index(base, path, n_centroids=8)          # next=1
    batch = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 120))
    similarity.ivf_add_to_index(spark, path, batch)                # epoch 1
    victim = batch.orderBy("vec_id").limit(1).collect()[0]
    similarity.ivf_delete_from_index(spark, path, [victim.vec_id])  # del 2
    meta_path = os.path.join(path, "meta.json")
    with open(meta_path) as f:
        committed = json.load(f)
    assert committed["next_epoch"] == 3
    assert committed["sha"]  # checksum stored

    # 1. torn file (truncated mid-write on a non-atomic filesystem)
    blob = json.dumps(committed)
    with open(meta_path, "w") as f:
        f.write(blob[: len(blob) // 2])
    assert _ivf_meta_read(path)["next_epoch"] == 3  # rebuilt, not reset

    # 2. valid JSON but stale payload smuggled in (checksum mismatch)
    with open(meta_path, "w") as f:
        json.dump({"next_epoch": 1, "sha": committed["sha"]}, f)
    assert _ivf_meta_read(path)["next_epoch"] == 3

    # 3. meta lost entirely + a garbage .tmp left by a crashed writer
    os.remove(meta_path)
    with open(meta_path + ".tmp", "w") as f:
        f.write("{half a wri")
    assert _ivf_meta_read(path)["next_epoch"] == 3

    # 4. end-to-end: with meta still lost, re-adding the deleted id
    # must stamp an epoch >= the tombstone's del_epoch so the row
    # RESURRECTS (a reset counter would stamp 1 < del_epoch 2 and the
    # tombstone would silently hide the fresh row)
    readd = emb.filter(F.col("vec_id") == victim.vec_id)
    similarity.ivf_add_to_index(spark, path, readd)
    q = spark.createDataFrame(
        [(999999, victim.embedding)], "vec_id long, embedding array<float>"
    )
    top = similarity.ivf_query_index(spark, path, q, k=1, nprobe=8).collect()
    assert top and top[0].neighbor_id == victim.vec_id
    # the heal re-committed a checksummed meta via the add
    with open(meta_path) as f:
        healed = json.load(f)
    assert healed["next_epoch"] == 4 and "sha" in healed


def test_ivf_assign_carry_passthrough(spark):
    """r14 internals pin: ``carry`` columns ride through the assignment
    map unchanged (repeated per probed cell), and the (id, cell)
    assignments are identical to the carry-free call."""
    from pyspark.sql import functions as F

    from wistia_video_analytics_project_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
    )

    rows = [
        (i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(4)],
         [float(i), float(i + 1)])
        for i in range(40)
    ]
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, payload array<double>"
    )
    cents = ivf_centroids(vecs, 4)
    plain = {
        (r.vec_id, r.cell)
        for r in ivf_assign(vecs, cents, nprobe=2).collect()
    }
    carried = ivf_assign(vecs, cents, nprobe=2, carry=["payload"]).collect()
    assert {(r.vec_id, r.cell) for r in carried} == plain
    # every carried row holds ITS id's payload, on every probed cell
    for r in carried:
        assert [float(x) for x in r.payload] == [
            float(r.vec_id), float(r.vec_id + 1)
        ]
