"""Cleaning tier: PII scrub, repetition, boilerplate lines, contamination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wistia_video_analytics_project_spark.operators import cleaning

from conftest import SF_SMOKE


def test_pii_scrub_counts_and_replaces(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.io and c.d+x@e-f.org call 555-123-4567 from 10.0.0.1"),
            (2, "no pii here"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in cleaning.pii_scrub(df).collect()}
    assert (out[1].n_email, out[1].n_phone, out[1].n_ipv4) == (2, 1, 1)
    assert out[1].text_scrubbed == "mail <EMAIL> and <EMAIL> call <PHONE> from <IP>"
    assert (out[2].n_email, out[2].text_scrubbed) == (0, "no pii here")
    assert out[3].text_scrubbed is None and out[3].n_email is None


def test_repetition_metrics_extremes(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a a a"),            # maximal repetition
            (2, "q w e r t y"),            # no repetition
            (3, "xy"),                     # shorter than n: no ngrams
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in cleaning.repetition_metrics(df, n=3).collect()}
    assert out[1].n_tokens == 6 and out[1].n_distinct_tokens == 1
    assert out[1].dup_token_frac == pytest.approx(5 / 6, abs=1e-4)
    assert out[1].dup_ngram_frac == pytest.approx(3 / 4, abs=1e-4)
    assert out[2].dup_token_frac == 0.0 and out[2].dup_ngram_frac == 0.0
    assert out[3].n_ngrams == 0 and out[3].dup_ngram_frac == 0.0


def test_remove_boilerplate_lines(spark):
    footer = "all rights reserved"
    df = spark.createDataFrame(
        [
            (1, f"unique alpha\n{footer}\nunique beta"),
            (2, f"unique gamma\n{footer.upper()}"),   # df counts normalized
            (3, "unique delta\n\n  \nunique epsilon"),  # blanks dropped
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in cleaning.remove_boilerplate_lines(df, min_df=2).collect()}
    assert out[1].text_clean == "unique alpha\nunique beta"
    assert (out[1].n_lines_kept, out[1].n_lines_dropped) == (2, 1)
    # normalization matched the uppercase footer; original casing is gone
    assert out[2].text_clean == "unique gamma"
    assert out[2].n_lines_dropped == 1
    # blank lines are neither kept nor counted as dropped
    assert out[3].text_clean == "unique delta\nunique epsilon"
    assert (out[3].n_lines_kept, out[3].n_lines_dropped) == (2, 0)
    # within-doc repeats count once for df: a line repeated in ONE doc
    # only is not boilerplate
    solo = spark.createDataFrame(
        [(9, "same line\nsame line\nother")], "doc_id long, text string"
    )
    out9 = cleaning.remove_boilerplate_lines(solo, min_df=2).collect()[0]
    assert out9.n_lines_dropped == 0


def test_contamination_exact(spark):
    docs = spark.createDataFrame(
        [(1, "one two three four five six"),   # shares 5-grams with bench
         (2, "totally different words here now then")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "zero one two three four five six seven")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in cleaning.ngram_contamination(docs, bench, n=5).collect()}
    # doc 1: 2 distinct 5-grams, both inside the benchmark text
    assert out[1].n_ngrams == 2 and out[1].n_contaminated == 2
    assert out[1].contamination_rate == 1.0
    assert out[2].n_contaminated == 0 and out[2].contamination_rate == 0.0


def test_contamination_bloom_is_superset_of_exact(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(80)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    eval_docs = docs.filter(F.col("doc_id") % 20 != 0)
    exact = {r.doc_id: r.n_contaminated
             for r in cleaning.ngram_contamination(eval_docs, bench, n=5).collect()}
    bloom = {r.doc_id: r.n_contaminated
             for r in cleaning.ngram_contamination_bloom(
                 eval_docs, bench, n=5, expected_items=100_000).collect()}
    assert set(bloom) == set(exact)
    for d, n_exact in exact.items():
        # no false negatives ever; false positives stay a small tail
        assert bloom[d] >= n_exact
    total_exact = sum(exact.values())
    total_bloom = sum(bloom.values())
    assert total_bloom <= total_exact + max(10, total_exact // 10)
