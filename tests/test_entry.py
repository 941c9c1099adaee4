"""Smoke: the driver contract surface."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_queries_registry_well_formed(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 30
    # every oracle key has a query
    assert set(oracles) <= set(qs)
    # oracle-less queries are the documented approximate/imperative ones
    assert set(qs) - set(oracles) == {
        "dedup_minhash_lsh", "dedup_simhash", "ann_lsh", "ann_ivf",
        "ann_pq", "ann_ivf_pq", "semantic_dedup_lsh",
        "weekly_active_users_hll", "value_quantiles_kll",
        "segment_overlap_theta",
        "approx_distinct_users",
        # greedy FFD packing is imperative — rows-only by design,
        # invariants pinned in tests/test_corpus.py
        "pack_sequences",
        # iterative-argmax BPE training — not SQL-expressible; exact
        # agreement with a reference implementation pinned in
        # tests/test_bpe.py
        "bpe_merges",
        # eigendecomposition / power iteration aren't SQL-expressible;
        # exact agreement with numpy on the same rows pinned in
        # tests/test_linalg.py
        "pca_explained_variance",
        "event_markov_stationary",
        "label_effective_rank",
        "embedding_mahalanobis",
        # sequential Holt recursion over the driver-sized daily series;
        # invariants pinned in tests/test_temporal.py
        "holt_revenue_trend",
        # xxhash64-keyed throughput variants (DuckDB has no xxhash64);
        # equality vs their string-keyed oracle-checked twins pinned in
        # tests/test_cleaning.py / tests/test_dedup.py
        "doc_novelty_hashed",
        "duplicated_spans_hashed",
        # Newton-IRLS training loop — no SQL equivalent; numpy-reference
        # parity pinned in tests/test_linalg.py
        "quality_classifier_train",
        # shared-scan one-vs-rest IRLS language-ID training — no SQL
        # equivalent; numpy parity + learnability pinned in
        # tests/test_langid.py
        "langid_train",
        # greedy per-query MMR recursion — not SQL-expressible;
        # invariants + lam=1 degeneracy pinned in tests/test_similarity.py
        "ann_mmr",
        # unigram-LM EM tokenizer training — no SQL equivalent;
        # lattice exactness vs brute-force enumeration, pure-Python EM
        # parity, and loglik monotonicity pinned in tests/test_unigram.py
        "unigram_tokenizer_train",
        # alternating least-squares factor solves — no SQL equivalent;
        # numpy-reference parity + loss monotonicity pinned in
        # tests/test_als.py
        "als_part_recommender",
        # ANN-served variant: ALS (above) + approximate IVF cell probe;
        # nprobe==cells exactness, clustered recall, and the
        # no-cartesian plan pinned in tests/test_als.py / test_plans.py
        "als_ann_recommender",
        # Frequent-Directions SVD shrink — no SQL equivalent; the
        # spectral error bound + merge invariance pinned in
        # tests/test_linalg.py
        "embedding_fd_sketch",
        # iterative label-propagation rounds — no SQL equivalent;
        # determinism + planted-partition recovery pinned in
        # tests/test_graph.py
        "part_communities",
        # PAVA's sequential pooling — no SQL equivalent; optimality vs
        # brute force + invariants pinned in tests/test_linalg.py
        "isotonic_late_by_price",
        # ZCA whitening needs a driver eigendecomposition — no SQL
        # equivalent; numpy parity + identity-covariance pinned in
        # tests/test_linalg.py
        "embedding_whiten_check",
    }


def test_each_query_runs_at_smoke_sf(spark):
    from conftest import SF_SMOKE

    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.columns, name
        df.limit(1).collect()


def test_funnel_with_repeated_step_type(spark):
    """view -> view funnel: step 2 requires a SECOND view strictly after
    the first (same-type steps must not double-count one event)."""
    import datetime as dt

    from wistia_video_analytics_project_spark.operators import analytics

    t = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, "view", t), (1, "view", t + dt.timedelta(minutes=1)),
         (2, "view", t)],
        "user_id long, event_type string, ts timestamp",
    )
    got = {r.step: r.entities
           for r in analytics.funnel(df, [("v1", "view"), ("v2", "view")]).collect()}
    assert got == {1: 2, 2: 1}  # only user 1 viewed twice
