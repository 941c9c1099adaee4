"""Kneser-Ney bigram LM: pure-Python reference parity and the KN
normalization property (Σ_w2 P_kn(w2|w1) == 1 over the continuation
vocabulary)."""

from __future__ import annotations

import pytest

from wistia_video_analytics_project_spark.operators import ngram_lm

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ate the fish"),
    (3, "a dog sat on a log"),
    (4, "the dog ate the bone"),
    (5, "one token"),
    (6, ""),
]
D = 0.75


def _ref_kn(docs):
    from collections import Counter, defaultdict

    bc: Counter = Counter()
    for _, text in docs:
        toks = text.strip().lower().split()
        for a, b in zip(toks, toks[1:]):
            bc[(a, b)] += 1
    c1 = Counter()
    n_follow = Counter()
    n_precede = Counter()
    for (a, b), c in bc.items():
        c1[a] += c
        n_follow[a] += 1
        n_precede[b] += 1
    n_types = len(bc)
    out = {}
    for (a, b), c in bc.items():
        pcont = n_precede[b] / n_types
        out[(a, b)] = (
            max(c - D, 0.0) / c1[a] + D * n_follow[a] / c1[a] * pcont
        )
    return out, bc, n_precede, n_types, c1, n_follow


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_kn_matches_python_reference(spark, docs_df):
    want, bc, *_ = _ref_kn(DOCS)
    rows = ngram_lm.kneser_ney_bigram(
        docs_df, discount=D, top_k=None
    ).collect()
    got = {(r["w1"], r["w2"]): r["p_kn"] for r in rows}
    assert got.keys() == want.keys()
    for k, p in want.items():
        assert got[k] == pytest.approx(round(p, 6), abs=1e-9), k
    counts = {(r["w1"], r["w2"]): r["c12"] for r in rows}
    assert counts == dict(bc)


def test_kn_sums_to_one_per_context(spark, docs_df):
    """Interpolated KN is a proper distribution over the continuation
    vocabulary: for every context w1, Σ_{w2 ∈ V} P_kn(w2|w1) = 1,
    where unseen (w1,w2) pairs contribute only the backoff term
    D·N1+(w1·)/c1 · Pcont(w2)."""
    want, bc, n_precede, n_types, c1, n_follow = _ref_kn(DOCS)
    vocab2 = set(n_precede)
    for w1 in c1:
        total = 0.0
        for w2 in vocab2:
            if (w1, w2) in want:
                total += want[(w1, w2)]
            else:
                total += (
                    D * n_follow[w1] / c1[w1] * (n_precede[w2] / n_types)
                )
        assert total == pytest.approx(1.0, abs=1e-12), w1
    # and the engine agrees with the reference on every seen pair
    rows = ngram_lm.kneser_ney_bigram(
        docs_df, discount=D, top_k=None
    ).collect()
    assert len(rows) == len(want)


def test_kn_context_diversity_beats_raw_frequency(spark):
    """The KN signature: a frequent-but-single-context continuation
    gets a LOWER continuation probability than a rarer token that
    follows many contexts."""
    docs = [
        (1, "san francisco san francisco san francisco san francisco"),
        (2, "red fish blue fish old fish new fish"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = ngram_lm.kneser_ney_bigram(df, top_k=None).collect()
    pcont = {r["w2"]: r["p_cont"] for r in rows}
    # "francisco" is very frequent but only ever follows "san";
    # "fish" follows red/blue/old/new
    assert pcont["fish"] > pcont["francisco"]
