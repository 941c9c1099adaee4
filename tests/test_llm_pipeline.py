"""End-to-end LLM corpus-prep composition: quality gate -> exact dedup
-> near-dup cluster dedup -> chunking -> document-granular split."""

from __future__ import annotations

from pyspark.sql import functions as F

from wistia_video_analytics_project_spark.llm_pipeline import prepare_training_corpus
from wistia_video_analytics_project_spark.session import configure_runtime
from wistia_video_analytics_project_spark.sources import load_table

from conftest import SF_SMOKE


def test_prepare_training_corpus_invariants(spark):
    configure_runtime(spark)
    docs = load_table(spark, SF_SMOKE, "documents")
    out = prepare_training_corpus(docs, chunk_size=50, stride=40).cache()

    assert out.count() > 0
    # chunk windows never exceed chunk_size and are non-empty
    bad = out.filter((F.col("n_tokens") < 1) | (F.col("n_tokens") > 50)).count()
    assert bad == 0
    # split is document-granular: no doc appears in two splits
    straddlers = (
        out.groupBy("doc_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert straddlers == 0
    # all three splits materialize at this corpus size
    assert {r.split for r in out.select("split").distinct().collect()} == {
        "train", "validation", "test",
    }
    out.unpersist()


def test_prepare_training_corpus_dedups(spark):
    configure_runtime(spark)
    docs = load_table(spark, SF_SMOKE, "documents")
    # plant an exact duplicate and a doc below the quality gate
    extra = spark.createDataFrame(
        [(900001, docs.select("text").first().text, "en", "srcX", 10),
         (900002, "too short", "en", "srcX", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = prepare_training_corpus(docs.unionByName(extra))
    ids = {r.doc_id for r in out.select("doc_id").distinct().collect()}
    assert 900001 not in ids  # exact dup of an earlier doc: dropped
    assert 900002 not in ids  # under min_tokens: dropped
