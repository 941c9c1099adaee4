"""RAKE keyphrase extraction: hand-computed reference on a toy corpus
and the delimiter/segmentation invariants."""

from __future__ import annotations

import pytest

from wistia_video_analytics_project_spark.operators import keyphrase


def test_rake_matches_hand_computation(spark):
    # One doc: "deep learning models; the deep models!" ->
    # phrases: "deep learning models" (stop 'the' splits) "deep models"
    docs = spark.createDataFrame(
        [(1, "deep learning models; the deep models!")],
        "doc_id long, text string",
    )
    rows = keyphrase.rake_keyphrases(docs, top_k=10).collect()
    by_phrase = {r["phrase"]: r for r in rows}
    # token cleanup strips ';' and '!', 'the' delimits
    assert set(by_phrase) == {"deep learning models", "deep models"}
    # word stats: deep: freq 2, deg 3+2=5; learning: freq 1 deg 3;
    # models: freq 2, deg 5
    # scores: deep 2.5, learning 3.0, models 2.5
    # phrase scores: dlm = 2.5+3+2.5 = 8.0 ; dm = 2.5+2.5 = 5.0
    assert by_phrase["deep learning models"]["score"] == pytest.approx(8.0)
    assert by_phrase["deep models"]["score"] == pytest.approx(5.0)
    assert by_phrase["deep learning models"]["n_words"] == 3
    assert by_phrase["deep models"]["n_occurrences"] == 1


def test_rake_drops_overlong_phrases_and_counts_repeats(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),  # 5 words > max 4
            (2, "red widget and red widget"),
        ],
        "doc_id long, text string",
    )
    rows = keyphrase.rake_keyphrases(docs, top_k=10).collect()
    phrases = {r["phrase"]: r for r in rows}
    assert "alpha beta gamma delta epsilon" not in phrases
    assert phrases["red widget"]["n_occurrences"] == 2


def test_rake_stopword_only_docs_yield_nothing(spark):
    docs = spark.createDataFrame(
        [(1, "the and of to"), (2, "... !!! ;;;")],
        "doc_id long, text string",
    )
    assert keyphrase.rake_keyphrases(docs, top_k=5).count() == 0
