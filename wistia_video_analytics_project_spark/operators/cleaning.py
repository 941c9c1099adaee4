"""Corpus-cleaning operators for LLM training-data pipelines.

Extension tier beyond the reference's surface (SURVEY.md §2 charter:
"operations a large-scale training-data pipeline would need"): PII
scrubbing, within-document repetition metrics, cross-corpus boilerplate
line removal (the C4 pattern), and benchmark-contamination checks.

Design notes (100 TB):

- Everything row-local is pure JVM built-ins (regexp/array HOFs) — no
  UDF, no shuffle.
- Cross-corpus steps (line df counts, benchmark n-gram sets) reduce to
  SMALL hot/reference sets by construction, so they ship as broadcast
  joins against the corpus — the corpus itself never shuffles.
- The bloom-filter contamination variant keeps even the reference set
  off the executors' join path: one aggregated filter, ~10 bits per
  distinct n-gram.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import configure_runtime
from ..sources import load_table
from .dedup import _shingle_arrays
from .text import _occurrences, tokens

# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

#: name -> (pattern, replacement token). Dialect-safe regex subset: no
#: lookarounds/backrefs, so Java regex (Spark) and RE2 (DuckDB) agree.
DEFAULT_PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}", "<PHONE>"),
    "ipv4": (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
}


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    patterns: Mapping[str, tuple[str, str]] = DEFAULT_PII_PATTERNS,
) -> DataFrame:
    """Redact PII spans and count redactions per type.

    Adds ``{text_col}_scrubbed`` plus one ``n_{name}`` count column per
    pattern. Counts come from ``regexp_count`` BEFORE replacement;
    replacements apply in the declared pattern order (email before ipv4
    matters: an address inside an email would otherwise split it).
    Fully row-local — scans never shuffle, whatever the corpus size.
    """
    out = df
    scrubbed = F.col(text_col)
    for name, (pat, _) in patterns.items():
        out = out.withColumn(f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat)))
    for name, (pat, repl) in patterns.items():
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return out.withColumn(f"{text_col}_scrubbed", scrubbed)


# ---------------------------------------------------------------------------
# Within-document repetition metrics
# ---------------------------------------------------------------------------


def repetition_metrics(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc repetition signals: duplicate-token and duplicate-n-gram
    fractions (1 − distinct/total). High values mark degenerate,
    low-quality documents (boilerplate loops, keyword stuffing).

    Entirely row-local array built-ins: tokenize once, n-grams via
    ``sequence``/``slice``, distinct via ``array_distinct`` — zero
    shuffles at any corpus size.
    """
    toks = tokens(text_col)
    ng = F.when(
        F.size(F.col("__toks")) >= n,
        F.expr(
            f"transform(sequence(0, size(__toks) - {n}), "
            f"i -> concat_ws(' ', slice(__toks, i + 1, {n})))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = docs.withColumn("__toks", toks).withColumn("__ngrams", ng)
    n_tok = F.size(F.col("__toks"))
    n_ng = F.size(F.col("__ngrams"))
    dup_frac = lambda total, arr: F.when(  # noqa: E731
        total > 0,
        F.round(
            (total - F.size(F.array_distinct(arr))).cast("double") / total, 4
        ),
    ).otherwise(F.lit(0.0))
    return base.select(
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_tokens"),
        F.size(F.array_distinct(F.col("__toks"))).alias("n_distinct_tokens"),
        dup_frac(n_tok, F.col("__toks")).alias("dup_token_frac"),
        n_ng.alias("n_ngrams"),
        dup_frac(n_ng, F.col("__ngrams")).alias("dup_ngram_frac"),
    )


# ---------------------------------------------------------------------------
# Cross-corpus boilerplate line removal (the C4 pattern)
# ---------------------------------------------------------------------------


def split_lines(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, line_no, line): newline-split with positions preserved.
    Blank/whitespace-only lines are dropped (they never carry content
    and would dominate df counts)."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode_outer(F.split(F.col(text_col), "\n")).alias(
                "line_no", "line"
            ),
        )
        .filter(F.trim(F.col("line")) != "")
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style cleaning: drop every line whose normalized form appears
    in ``min_df`` or more DISTINCT documents (nav bars, cookie banners,
    license footers), then reassemble documents in original line order.

    Scale shape: line df is a partial-aggregated groupBy over distinct
    (doc, line) pairs; the hot-line set (df ≥ min_df) is small by
    definition — heavy hitters — so it broadcasts and the corpus itself
    is never shuffled on the way out except the per-doc reassembly.

    Returns (doc_id, text_clean, n_lines_kept, n_lines_dropped).
    """
    lines = split_lines(docs, text_col, id_col).withColumn(
        "__norm", F.trim(F.lower(F.col("line")))
    )
    hot = (
        lines.select("doc_id", "__norm")
        .distinct()
        .groupBy("__norm")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("__norm")
    )
    flagged = lines.join(
        F.broadcast(hot.withColumn("__hot", F.lit(1))), "__norm", "left"
    )
    kept_struct = F.when(
        F.col("__hot").isNull(),
        F.struct(F.col("line_no"), F.col("line")),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(kept_struct)
            ).alias("__kept"),
            F.sum(F.when(F.col("__hot").isNotNull(), 1).otherwise(0)).alias(
                "n_lines_dropped"
            ),
        )
        .select(
            "doc_id",
            F.concat_ws(
                "\n", F.expr("transform(__kept, s -> s.line)")
            ).alias("text_clean"),
            F.size("__kept").alias("n_lines_kept"),
            F.col("n_lines_dropped").cast("long").alias("n_lines_dropped"),
        )
    )


# ---------------------------------------------------------------------------
# Benchmark contamination
# ---------------------------------------------------------------------------


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc share of DISTINCT word n-grams that also occur anywhere
    in the benchmark corpus — the standard eval-set decontamination
    check before training.

    The benchmark n-gram set is small relative to a training corpus
    (eval suites are thousands of documents, not billions), so it
    broadcasts; the corpus side stays put. Docs shorter than ``n``
    tokens have no n-grams and report rate 0.0.

    Returns (doc_id, n_ngrams, n_contaminated, contamination_rate).
    """
    d = _shingle_arrays(docs, text_col, id_col, n)
    doc_ng = d.select(
        "doc_id",
        F.size("__shingles").alias("__total"),
        F.explode_outer("__shingles").alias("__ng"),
    )
    bench_ng = (
        _shingle_arrays(benchmark, text_col, id_col, n)
        .select(F.explode_outer("__shingles").alias("__ng"))
        .filter(F.col("__ng").isNotNull())
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    per_doc = (
        doc_ng.join(F.broadcast(bench_ng), "__ng", "left")
        .groupBy("doc_id")
        .agg(
            F.max("__total").alias("n_ngrams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_contaminated"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_ngrams").cast("long").alias("n_ngrams"),
        F.col("n_contaminated").cast("long").alias("n_contaminated"),
        F.round(
            F.col("n_contaminated").cast("double")
            / F.greatest(F.col("n_ngrams"), F.lit(1)),
            4,
        ).alias("contamination_rate"),
    )


def _bloom_positions(col: Column, n_bits: int, k: int) -> Column:
    """k bit positions per value: ``xxhash64(value, i)`` mod n_bits —
    pure JVM expressions, deterministic across clusters and engines."""
    return F.array(
        *[F.pmod(F.xxhash64(col, F.lit(i)), F.lit(n_bits)) for i in range(k)]
    )


def ngram_contamination_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    expected_items: int = 1_000_000,
    bits_per_item: int = 12,
    k_hashes: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Approximate contamination via a Bloom filter over the benchmark
    n-gram set — the scale path when even the benchmark n-gram set is
    too large to broadcast-join.

    The filter is assembled DISTRIBUTED: each benchmark n-gram maps to
    ``k_hashes`` bit positions (JVM-side ``xxhash64(ng, i)``), positions
    reduce to per-byte ``bit_or`` partial aggregates, and only the final
    ``n_bits/8``-byte bitmap reaches the driver — then ships back inside
    an Arrow-vectorized membership UDF (numpy bit tests per batch).

    Bloom filters have NO false negatives, so the reported rate is an
    UPPER bound on the exact rate (~0.5% false-positive tail at 12
    bits/item, k=5). Approximate ⇒ no SQL oracle; the pytest asserts the
    superset property against :func:`ngram_contamination`.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    n_bits = ((expected_items * bits_per_item + 63) // 64) * 64
    bench_pos = (
        _shingle_arrays(benchmark, text_col, id_col, n)
        .select(F.explode_outer("__shingles").alias("__ng"))
        .filter(F.col("__ng").isNotNull())
        .select(
            F.explode(_bloom_positions(F.col("__ng"), n_bits, k_hashes)).alias(
                "__pos"
            )
        )
    )
    byte_rows = (
        bench_pos.select(
            (F.col("__pos") / 8).cast("long").alias("__byte"),
            F.expr("shiftleft(1, cast(__pos % 8 as int))").alias("__m"),
        )
        .groupBy("__byte")
        .agg(F.bit_or("__m").alias("__mask"))
        .collect()
    )
    bitmap = np.zeros(n_bits // 8, dtype=np.uint8)
    for r in byte_rows:
        bitmap[r["__byte"]] = r["__mask"]

    # defined hint-free: `from __future__ import annotations` stringifies
    # hints, which pandas_udf's signature inspection cannot resolve here
    def _might_contain(pos):
        out = np.ones(len(pos), dtype=bool)
        for i in range(k_hashes):
            p = np.fromiter((x[i] for x in pos), dtype=np.int64, count=len(pos))
            out &= (bitmap[p >> 3] >> (p & 7).astype(np.uint8)) & 1 > 0
        return pd.Series(out)

    might_contain = pandas_udf(_might_contain, "boolean")

    d = _shingle_arrays(docs, text_col, id_col, n)
    doc_ng = d.select(
        "doc_id",
        F.size("__shingles").alias("__total"),
        F.explode_outer("__shingles").alias("__ng"),
    ).withColumn(
        "__hit",
        F.when(
            F.col("__ng").isNotNull(),
            might_contain(_bloom_positions(F.col("__ng"), n_bits, k_hashes)),
        ).otherwise(F.lit(False)),
    )
    per_doc = doc_ng.groupBy("doc_id").agg(
        F.max("__total").alias("n_ngrams"),
        F.sum(F.when(F.col("__hit"), 1).otherwise(0)).alias("n_contaminated"),
    )
    return per_doc.select(
        "doc_id",
        F.col("n_ngrams").cast("long").alias("n_ngrams"),
        F.col("n_contaminated").cast("long").alias("n_contaminated"),
        F.round(
            F.col("n_contaminated").cast("double")
            / F.greatest(F.col("n_ngrams"), F.lit(1)),
            4,
        ).alias("contamination_rate"),
    )


# ---------------------------------------------------------------------------
# Driver-contract bindings
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_runtime(spark)
    return load_table(spark, sf_dir, "documents")


#: tokens per synthetic line for bindings that need multi-line docs (the
#: corpus text is single-line word soup; chunking it into fixed-width
#: lines is expressible identically in Spark and DuckDB)
_LINE_WIDTH = 12


def _with_synthetic_lines(docs: DataFrame) -> DataFrame:
    """text -> newline-joined lines of ``_LINE_WIDTH`` tokens each."""
    lines = F.expr(
        f"""
        transform(sequence(0, cast(ceil(size(__toks) / {_LINE_WIDTH}.0) as int) - 1),
                  i -> concat_ws(' ', slice(__toks, i * {_LINE_WIDTH} + 1, {_LINE_WIDTH})))
        """
    )
    return (
        docs.withColumn("__toks", tokens("text"))
        .withColumn("text_lines", F.concat_ws("\n", lines))
    )


def _with_synthetic_pii(docs: DataFrame) -> DataFrame:
    """Deterministically inject PII spans so the scrubber has real work:
    every 7th doc gains an email, every 11th a phone, every 13th an IP —
    the same arithmetic the oracle replays."""
    did = F.col("doc_id")
    email = F.when(
        did % 7 == 0, F.concat(F.lit(" contact user"), did, F.lit("@example.com"))
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 11 == 0,
        F.concat(F.lit(" call 555-"), F.lpad((did % 1000).cast("string"), 3, "0"),
                 F.lit("-0199")),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 13 == 0,
        F.concat(F.lit(" from 10.0."), (did % 256).cast("string"), F.lit(".7")),
    ).otherwise(F.lit(""))
    return docs.withColumn("text_pii", F.concat(F.col("text"), email, phone, ip))


def q_pii_scrub_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII audit over deterministically injected spans:
    redaction counts per type and chars removed."""
    docs = _with_synthetic_pii(_docs(spark, sf_dir))
    scrubbed = pii_scrub(docs, text_col="text_pii")
    return (
        scrubbed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_email").cast("long").alias("emails_redacted"),
            F.sum("n_phone").cast("long").alias("phones_redacted"),
            F.sum("n_ipv4").cast("long").alias("ips_redacted"),
            F.sum(
                F.length("text_pii") - F.length("text_pii_scrubbed")
            ).cast("long").alias("chars_removed"),
        )
    )


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source repetition profile (token- and 3-gram-level)."""
    docs = _docs(spark, sf_dir)
    m = repetition_metrics(docs, n=3)
    joined = m.join(docs.select("doc_id", "source"), "doc_id")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_distinct_tokens").cast("long").alias("total_distinct_tokens"),
        F.round(F.avg("dup_token_frac"), 4).alias("avg_dup_token_frac"),
        F.round(F.avg("dup_ngram_frac"), 4).alias("avg_dup_ngram_frac"),
    )


def q_line_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 boilerplate-line removal over synthetic 12-token lines:
    per-source kept/dropped line totals and kept chars."""
    docs = _with_synthetic_lines(_docs(spark, sf_dir))
    cleaned = remove_boilerplate_lines(
        docs, min_df=2, text_col="text_lines"
    )
    joined = cleaned.join(docs.select("doc_id", "source"), "doc_id")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_lines_kept").cast("long").alias("lines_kept"),
        F.sum("n_lines_dropped").cast("long").alias("lines_dropped"),
        F.sum(F.length("text_clean")).cast("long").alias("clean_chars"),
    )


def q_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: every 20th doc is the 'benchmark'; the
    rest report their distinct-5-gram overlap with it."""
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    eval_docs = docs.filter(F.col("doc_id") % 20 != 0)
    c = ngram_contamination(eval_docs, bench, n=5)
    return c.join(docs.select("doc_id", "source"), "doc_id").select(
        "doc_id", "source", "n_ngrams", "n_contaminated", "contamination_rate"
    )


# ---------------------------------------------------------------------------
# Gopher-style rule filter
# ---------------------------------------------------------------------------

#: stopword-presence list for the Gopher "contains >=2 stop words" rule
#: (Rae et al. 2021 §A1.1 use 8 common English function words)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: rule bit positions in the fail mask (0 == document kept)
GOPHER_RULE_BITS = {
    "word_count": 1,
    "mean_word_len": 2,
    "symbol_ratio": 4,
    "alpha_frac": 8,
    "stopwords": 16,
}


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    symbol_per_10_words: int = 1,
    alpha_frac_tenths: int = 8,
    min_stopword_hits: int = 2,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021 §A1.1) as a
    single-scan, all-JVM filter: word-count bounds, mean-word-length
    bounds, symbol-to-word ratio (# and ellipsis), alphabetic-word
    fraction, stopword presence.

    Every threshold comparison is EXACT INTEGER arithmetic
    (``total_chars >= 3·n_words`` instead of ``mean >= 3.0``,
    ``symbol_hits·10 < n_words`` instead of ``ratio < 0.1``), so rule
    boundaries can never flip under float noise and the DuckDB oracle
    agrees bit-for-bit.  Output per doc: the counts, a rule-failure
    bitmask (:data:`GOPHER_RULE_BITS`), and ``keep = mask == 0``.
    Row-local built-ins only — no UDF, no shuffle; at 100 TB this is a
    codegen'd map over the corpus scan.
    """
    toks = tokens(F.col(text_col))
    n_words = F.size(toks)
    total_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    symbol_hits = _occurrences(padded, "#") + _occurrences(padded, "...")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*GOPHER_STOPWORDS))
    )
    mask = (
        F.when(
            (n_words < min_words) | (n_words > max_words),
            F.lit(GOPHER_RULE_BITS["word_count"]),
        ).otherwise(F.lit(0))
        + F.when(
            (total_chars < min_mean_word_len * n_words)
            | (total_chars > max_mean_word_len * n_words),
            F.lit(GOPHER_RULE_BITS["mean_word_len"]),
        ).otherwise(F.lit(0))
        + F.when(
            symbol_hits * 10 >= n_words * symbol_per_10_words,
            F.lit(GOPHER_RULE_BITS["symbol_ratio"]),
        ).otherwise(F.lit(0))
        + F.when(
            alpha_words * 10 < n_words * alpha_frac_tenths,
            F.lit(GOPHER_RULE_BITS["alpha_frac"]),
        ).otherwise(F.lit(0))
        + F.when(
            stop_hits < min_stopword_hits,
            F.lit(GOPHER_RULE_BITS["stopwords"]),
        ).otherwise(F.lit(0))
    )
    return docs.select(
        "doc_id",
        *passthrough,
        n_words.cast("bigint").alias("n_words"),
        total_chars.alias("total_word_chars"),
        alpha_words.cast("bigint").alias("n_alpha_words"),
        symbol_hits.cast("bigint").alias("symbol_hits"),
        stop_hits.cast("bigint").alias("stopword_hits"),
        mask.cast("bigint").alias("fail_mask"),
        (mask == 0).alias("keep"),
    )


def q_gopher_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gopher-rule audit: kept share and per-rule failure
    counts — the go/no-go dashboard before a pretraining mixture is
    frozen."""
    docs = _docs(spark, sf_dir)
    # source rides THROUGH the rule map (passthrough) — one scan, one
    # exchange; a join back to documents would scan the table twice
    r = gopher_rules(docs, passthrough=("source",))
    agg = [
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("keep").cast("long")).cast("bigint").alias("n_kept"),
    ]
    for rule, bit in sorted(GOPHER_RULE_BITS.items(), key=lambda kv: kv[1]):
        agg.append(
            F.sum(
                ((F.col("fail_mask").bitwiseAND(F.lit(bit))) > 0).cast("long")
            )
            .cast("bigint")
            .alias(f"fail_{rule}")
        )
    return r.groupBy("source").agg(*agg)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "contamination_report": q_contamination_report,
        "text_repetition": q_text_repetition,
        "pii_scrub_report": q_pii_scrub_report,
        "line_dedup_report": q_line_dedup_report,
        "gopher_quality_report": q_gopher_quality_report,
    }


_TOK_CTE = """
    tok AS (
      SELECT doc_id, source,
             string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM documents)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "contamination_report": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok,
                     generate_subscripts(string_split_regex(trim(lower(text)), '\\s+'), 1) AS i
              FROM documents),
            sh0 AS (
              SELECT doc_id,
                     concat_ws(' ', tok,
                               lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY i),
                               lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY i),
                               lead(tok, 3) OVER (PARTITION BY doc_id ORDER BY i),
                               lead(tok, 4) OVER (PARTITION BY doc_id ORDER BY i)) AS shingle,
                     lead(tok, 4) OVER (PARTITION BY doc_id ORDER BY i) AS t5
              FROM tok),
            sh AS (SELECT DISTINCT doc_id, shingle FROM sh0 WHERE t5 IS NOT NULL),
            bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0),
            per AS (
              SELECT e.doc_id, count(*) AS n_ngrams,
                     count(b.shingle) AS contaminated
              FROM sh e LEFT JOIN bench b ON e.shingle = b.shingle
              WHERE e.doc_id % 20 <> 0
              GROUP BY 1)
            SELECT d.doc_id, d.source,
                   CAST(coalesce(per.n_ngrams, 0) AS BIGINT) AS n_ngrams,
                   CAST(coalesce(per.contaminated, 0) AS BIGINT) AS n_contaminated,
                   round(CAST(coalesce(per.contaminated, 0) AS DOUBLE)
                         / greatest(coalesce(per.n_ngrams, 0), 1), 4)
                     AS contamination_rate
            FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
            WHERE d.doc_id % 20 <> 0
        """,
        "text_repetition": f"""
            WITH {_TOK_CTE},
            ng AS (
              SELECT doc_id,
                     CASE WHEN len(toks) >= 3 THEN
                       list_transform(generate_series(1, len(toks) - 2),
                         i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
                     ELSE [] END AS ngrams,
                     toks
              FROM tok),
            per AS (
              SELECT t.doc_id, t.source,
                     len(n.toks) AS n_tokens,
                     len(list_distinct(n.toks)) AS n_distinct,
                     CASE WHEN len(n.toks) > 0 THEN
                       round(CAST(len(n.toks) - len(list_distinct(n.toks)) AS DOUBLE)
                             / len(n.toks), 4) ELSE 0.0 END AS dup_tok,
                     CASE WHEN len(n.ngrams) > 0 THEN
                       round(CAST(len(n.ngrams) - len(list_distinct(n.ngrams)) AS DOUBLE)
                             / len(n.ngrams), 4) ELSE 0.0 END AS dup_ng
              FROM tok t JOIN ng n ON t.doc_id = n.doc_id)
            SELECT source, count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                   CAST(sum(n_distinct) AS BIGINT) AS total_distinct_tokens,
                   round(CAST(avg(dup_tok) AS DOUBLE), 4) AS avg_dup_token_frac,
                   round(CAST(avg(dup_ng) AS DOUBLE), 4) AS avg_dup_ngram_frac
            FROM per GROUP BY 1
        """,
        "pii_scrub_report": """
            WITH pii AS (
              SELECT source,
                     concat(text,
                       CASE WHEN doc_id % 7 = 0
                            THEN concat(' contact user', CAST(doc_id AS VARCHAR), '@example.com')
                            ELSE '' END,
                       CASE WHEN doc_id % 11 = 0
                            THEN concat(' call 555-', lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'), '-0199')
                            ELSE '' END,
                       CASE WHEN doc_id % 13 = 0
                            THEN concat(' from 10.0.', CAST(doc_id % 256 AS VARCHAR), '.7')
                            ELSE '' END) AS t
              FROM documents),
            scrub AS (
              SELECT source, t,
                     len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
                     len(regexp_extract_all(t, '\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) AS n_phone,
                     len(regexp_extract_all(t, '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS n_ip,
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                         '\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g'),
                       '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}', '<IP>', 'g') AS clean
              FROM pii)
            SELECT source, count(*) AS n_docs,
                   CAST(sum(n_email) AS BIGINT) AS emails_redacted,
                   CAST(sum(n_phone) AS BIGINT) AS phones_redacted,
                   CAST(sum(n_ip) AS BIGINT) AS ips_redacted,
                   CAST(sum(length(t) - length(clean)) AS BIGINT) AS chars_removed
            FROM scrub GROUP BY 1
        """,
        "line_dedup_report": f"""
            WITH {_TOK_CTE},
            lines0 AS (
              SELECT doc_id, source,
                     unnest(list_transform(
                       generate_series(0, CAST(ceil(len(toks) / 12.0) AS INT) - 1),
                       i -> array_to_string(list_slice(toks, i * 12 + 1, i * 12 + 12), ' '))) AS line,
                     generate_subscripts(generate_series(0, CAST(ceil(len(toks) / 12.0) AS INT) - 1), 1) AS line_no
              FROM tok),
            lines AS (SELECT * FROM lines0 WHERE trim(line) <> ''),
            hot AS (
              SELECT trim(lower(line)) AS norm
              FROM (SELECT DISTINCT doc_id, trim(lower(line)) AS line FROM lines)
              GROUP BY 1 HAVING count(*) >= 2),
            flagged AS (
              SELECT l.doc_id, l.source, l.line, l.line_no,
                     (h.norm IS NOT NULL) AS is_hot
              FROM lines l LEFT JOIN hot h ON trim(lower(l.line)) = h.norm),
            per AS (
              SELECT doc_id, any_value(source) AS source,
                     string_agg(CASE WHEN NOT is_hot THEN line END, chr(10)
                                ORDER BY line_no) AS text_clean,
                     count(*) FILTER (WHERE NOT is_hot) AS kept,
                     count(*) FILTER (WHERE is_hot) AS dropped
              FROM flagged GROUP BY doc_id)
            SELECT source, count(*) AS n_docs,
                   CAST(sum(kept) AS BIGINT) AS lines_kept,
                   CAST(sum(dropped) AS BIGINT) AS lines_dropped,
                   CAST(sum(length(coalesce(text_clean, ''))) AS BIGINT) AS clean_chars
            FROM per GROUP BY 1
        """,
        # every rule boundary is exact integer arithmetic (see
        # gopher_rules docstring), so the mask agrees bit-for-bit
        "gopher_quality_report": """
            WITH tok AS (
              SELECT doc_id, source, lower(text) AS lotext,
                     string_split_regex(trim(lower(text)), '\\s+') AS toks
              FROM documents),
            per AS (
              SELECT doc_id, source,
                     CAST(len(toks) AS BIGINT) AS n_words,
                     CAST(list_sum(list_transform(toks, t -> length(t)))
                          AS BIGINT) AS total_chars,
                     CAST(len(list_filter(toks,
                          t -> regexp_matches(t, '[a-z]'))) AS BIGINT)
                       AS alpha_words,
                     CAST((length(' ' || lotext || ' ')
                           - length(replace(' ' || lotext || ' ', '#', '')))
                          AS BIGINT)
                     + CAST((length(' ' || lotext || ' ')
                             - length(replace(' ' || lotext || ' ', '...', '')))
                            / 3 AS BIGINT) AS symbol_hits,
                     CAST(len(list_filter(toks, t -> list_contains(
                          ['the','be','to','of','and','that','have','with'],
                          t))) AS BIGINT) AS stop_hits
              FROM tok),
            masked AS (
              SELECT source,
                     (CASE WHEN n_words < 50 OR n_words > 100000
                           THEN 1 ELSE 0 END)
                     + (CASE WHEN total_chars < 3 * n_words
                             OR total_chars > 10 * n_words
                             THEN 2 ELSE 0 END)
                     + (CASE WHEN symbol_hits * 10 >= n_words
                             THEN 4 ELSE 0 END)
                     + (CASE WHEN alpha_words * 10 < n_words * 8
                             THEN 8 ELSE 0 END)
                     + (CASE WHEN stop_hits < 2 THEN 16 ELSE 0 END)
                       AS fail_mask
              FROM per)
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(*) FILTER (WHERE fail_mask = 0) AS BIGINT)
                     AS n_kept,
                   CAST(count(*) FILTER (WHERE fail_mask & 1 > 0) AS BIGINT)
                     AS fail_word_count,
                   CAST(count(*) FILTER (WHERE fail_mask & 2 > 0) AS BIGINT)
                     AS fail_mean_word_len,
                   CAST(count(*) FILTER (WHERE fail_mask & 4 > 0) AS BIGINT)
                     AS fail_symbol_ratio,
                   CAST(count(*) FILTER (WHERE fail_mask & 8 > 0) AS BIGINT)
                     AS fail_alpha_frac,
                   CAST(count(*) FILTER (WHERE fail_mask & 16 > 0) AS BIGINT)
                     AS fail_stopwords
            FROM masked GROUP BY 1
        """,
    }
