"""Trainable language-ID: featurizer reference parity, shared-scan IRLS
numpy parity, learnability on a separable corpus (beats the marker
heuristic), layout independence."""

from __future__ import annotations

import numpy as np
import pytest

from wistia_video_analytics_project_spark.operators import langid, text


def _ref_feature(txt: str, dim: int = 64, n: int = 3):
    """Independent featurizer re-implementation (plain Python loop)."""
    raw = (" " + txt.lower() + " ").encode("utf-8")
    counts = np.zeros(dim)
    for i in range(len(raw) - n + 1):
        h = 2166136261
        for byte in raw[i : i + n]:
            h = ((h ^ byte) * 16777619) & 0xFFFFFFFF
        counts[h % dim] += 1.0
    norm = float(np.sqrt((counts * counts).sum()))
    return counts / norm if norm else counts


# deterministic synthetic corpus: three "languages" with disjoint-ish
# character inventories (latin / accented / cyrillic-like), so byte
# trigrams are genuinely separable — the learnability proof the random
# shared-vocabulary documents table cannot provide
_WORDS = {
    "lat": ["stone", "river", "cloud", "grain", "field", "light"],
    "acc": ["étoile", "déjà", "çédille", "naïve", "forêt", "mañana"],
    "cyr": ["вода", "камень", "облако", "поле", "свет", "зерно"],
}


def _synth_docs(n_per_lang: int = 60, words_per_doc: int = 12):
    rows = []
    doc_id = 0
    for lang, words in _WORDS.items():
        state = 12345
        for _ in range(n_per_lang):
            picked = []
            for _ in range(words_per_doc):
                state = (state * 1103515245 + 12721) % (1 << 31)
                picked.append(words[state % len(words)])
            rows.append((doc_id, " ".join(picked), lang))
            doc_id += 1
    return rows


def test_featurizer_matches_independent_reference():
    for txt in ["hello world", "déjà vu Привет", "", "ab"]:
        got = langid.ngram_feature_vector(txt)
        want = _ref_feature(txt)
        assert np.allclose(got, want, atol=0), txt
    # unit norm for non-trivial text
    assert abs(np.linalg.norm(langid.ngram_feature_vector("hello")) - 1) < 1e-12


def test_distributed_featurizer_matches_local(spark):
    rows = _synth_docs(5)
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r.doc_id: np.array(r.features)
        for r in langid.hashed_char_ngram_features(
            df.repartition(4), keep_cols=("lang",)
        ).collect()
    }
    for doc_id, txt, _ in rows:
        assert np.allclose(got[doc_id], _ref_feature(txt), atol=0)


def test_ovr_stats_match_numpy(spark):
    """The shared-scan (cls, idx, val) statistics equal the per-class
    numpy Hessian/gradient/NLL at arbitrary non-zero weights."""
    rows = _synth_docs(8)
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    langs = ["acc", "cyr", "lat"]
    feats = langid.hashed_char_ngram_features(df, keep_cols=("lang",))
    feats = feats.withColumn(
        "label_idx",
        sum(
            (feats["lang"] == g).cast("long") * i
            for i, g in enumerate(langs)
        ),
    )
    rng = np.random.RandomState(7)
    w = rng.randn(3, 65) * 0.1
    got_rows = langid.ovr_logistic_stats(
        feats, "features", "label_idx", w, 64
    ).collect()
    aug, n_h = 65, 65 * 65
    per_cls = n_h + aug + 1
    buf = np.zeros(3 * per_cls + 1)
    for r in got_rows:
        pos = -1 if r["cls"] >= 3 else r["cls"] * per_cls + r["idx"]
        buf[pos] = r["val"]

    x = np.array([_ref_feature(t) for _, t, _ in rows])
    x = np.hstack([x, np.ones((len(x), 1))])
    labels = np.array([langs.index(lg) for _, _, lg in rows])
    assert buf[-1] == len(rows)
    for k in range(3):
        z = x @ w[k]
        p = 1 / (1 + np.exp(-z))
        y = (labels == k).astype(float)
        base = k * per_cls
        hess = buf[base : base + n_h].reshape(aug, aug)
        grad = buf[base + n_h : base + n_h + aug]
        nll = buf[base + n_h + aug]
        assert np.allclose(hess, (x * (p * (1 - p))[:, None]).T @ x, atol=1e-9)
        assert np.allclose(grad, x.T @ (y - p), atol=1e-9)
        want_nll = float(np.sum(np.log1p(np.exp(-np.abs(z))) + np.maximum(z, 0) - y * z))
        assert abs(nll - want_nll) < 1e-7


def test_trained_model_separates_and_beats_heuristic(spark):
    rows = _synth_docs(60)
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    langs = sorted(_WORDS)
    feats = langid.hashed_char_ngram_features(df, keep_cols=("lang",))
    feats = feats.withColumn(
        "label_idx",
        sum(
            (feats["lang"] == g).cast("long") * i
            for i, g in enumerate(langs)
        ),
    ).cache()
    w, b, losses = langid.langid_train(feats, langs, iterations=4)
    from pyspark.sql import functions as F

    scored = langid.langid_score(feats, langs, w, b)
    acc = scored.agg(
        F.avg((scored["lang_pred"] == scored["lang"]).cast("double"))
    ).collect()[0][0]
    assert acc > 0.9, acc
    # loss decreased monotonically from the null model
    assert losses[0] > losses[-1]
    # the stopword-marker heuristic knows none of these synthetic
    # languages: it answers 'und'/wrong for (nearly) everything
    heur = df.withColumn("guess", text.lang_guess("text"))
    heur_acc = heur.agg(
        F.avg((heur["guess"] == heur["lang"]).cast("double"))
    ).collect()[0][0]
    assert acc > heur_acc + 0.5, (acc, heur_acc)
    feats.unpersist()


def test_scoring_is_deterministic_across_layout(spark):
    rows = _synth_docs(10)
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    langs = sorted(_WORDS)
    feats = langid.hashed_char_ngram_features(df, keep_cols=("lang",))
    feats = feats.withColumn(
        "label_idx",
        sum(
            (feats["lang"] == g).cast("long") * i
            for i, g in enumerate(langs)
        ),
    )
    w, b, _ = langid.langid_train(feats, langs, iterations=2)
    one = {
        r.doc_id: r.lang_pred
        for r in langid.langid_score(feats.coalesce(1), langs, w, b).collect()
    }
    many = {
        r.doc_id: r.lang_pred
        for r in langid.langid_score(
            feats.repartition(7), langs, w, b
        ).collect()
    }
    assert one == many


def test_binding_reports_summary(spark):
    from conftest import SF_SMOKE

    import __spark_entry__ as entrymod

    df = entrymod.queries()["langid_train"](spark, SF_SMOKE)
    vals = {r.term: r.value for r in df.collect()}
    assert set(vals) == {
        "train_accuracy",
        "majority_baseline",
        "n_docs",
        "n_langs",
        "final_loss",
        "null_loss",
        "w_norm",
    }
    assert 0.0 <= vals["train_accuracy"] <= 1.0
    assert vals["null_loss"] >= vals["final_loss"]
    assert vals["n_docs"] > 0 and vals["n_langs"] >= 2
