"""Streaming jobs over the event schema (SURVEY.md §2.9).

Each job is a pure ``streaming DataFrame -> streaming DataFrame``
transform so the same logic binds to any source (file, Kafka, rate) and
any sink. Tests drive them with a file source + memory sink via
:func:`run_to_memory_sink` (synchronous ``processAllAvailable``).

Watermark semantics: the reference tolerates 7 days of late data via its
`since` lookback (`wistia-Databricks notebool-02.py:149-150, 202`); the
streaming tier expresses the same tolerance as an event-time watermark,
which ALSO bounds state size — at 100 TB/day of events, unbounded
watermarks mean unbounded state stores.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException


def windowed_engagement(
    events: DataFrame,
    window_duration: str = "1 day",
    watermark: str = "7 days",
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    value_col: str = "value",
    play_filter: tuple[str, str] | None = ("event_type", "view"),
) -> DataFrame:
    """Streaming analog of the fact build (`notebool-03.py:225-234`):
    tumbling event-time window x keys, count/sum/avg aggregates.

    Late data beyond ``watermark`` is dropped AND the window state is
    garbage-collected past it. Output mode append: a window emits once,
    when the watermark passes its end — the streaming equivalent of the
    reference's "daily run covers yesterday".
    """
    df = events
    if play_filter is not None:
        col, val = play_filter
        df = df.filter(F.col(col) == val)
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("w"), *key_cols)
        .agg(
            F.count(F.lit(1)).alias("play_count"),
            F.round(F.sum(F.coalesce(F.col(value_col), F.lit(0.0))), 2).alias(
                "total_watch_time_seconds"
            ),
            # DECIMAL(18,6) snap before rounding (engine convention for
            # avg of fixed-decimal inputs — see CLAUDE.md)
            F.round(
                F.avg(F.coalesce(F.col(value_col), F.lit(0.0))).cast("decimal(18,6)"),
                2,
            )
            .cast("double")
            .alias("avg_percent_watched"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.to_date("w.start").alias("date"),
            *key_cols,
            "play_count",
            "total_watch_time_seconds",
            "avg_percent_watched",
        )
    )


def sliding_window_traffic(
    events: DataFrame,
    window_duration: str = "2 days",
    slide: str = "1 day",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding event-time windows (the third window shape, next to
    tumbling and session): each event lands in ``duration/slide``
    overlapping windows, giving smoothed traffic aggregates per type.
    Append mode emits a window once its end passes the watermark —
    same closed-window contract the tumbling job proves, so the result
    is deterministic and SQL-mirrorable (each event unnests into its
    window starts)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, window_duration, slide).alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 2).alias(
                "total_value"
            ),
        )
        .select(
            F.to_date("w.start").alias("window_start"),
            F.to_date("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    value_col: str = "value",
) -> DataFrame:
    """Streaming sessionization via ``session_window`` — the dynamic-gap
    analog of the batch ``temporal.sessionize`` operator (§2.9 surface):
    per key, events closer than ``gap`` merge into one session
    ``[first_ts, last_ts + gap)``; a session is emitted exactly once,
    when the watermark passes its end.

    State per key is one open session (merged in place by the session
    state store), so memory is bounded by |active keys|, not event
    volume — with the watermark garbage-collecting closed sessions this
    holds at any scale. Session bounds are reported as epoch MICROS
    (integer) per the engine's timestamp-parity convention.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), *key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.coalesce(F.col(value_col), F.lit(0.0))), 2).alias(
                "total_value"
            ),
        )
        .select(
            *key_cols,
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
            "total_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: Sequence[str],
    watermark: str = "7 days",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming keep-first dedup (`notebool-03.py:308-317` analog):
    ``dropDuplicatesWithinWatermark`` keeps the first-arriving row per
    key and expires dedup state past the watermark — bounded memory,
    unlike a batch global window."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def dedup_stream_by_content(
    docs: DataFrame,
    text_col: str = "text",
    watermark: str = "7 days",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming EXACT CONTENT dedup: fingerprint each document (md5 of
    normalized text — the same key the batch dedup ladder uses) and keep
    the first arrival per fingerprint within the watermark horizon.

    The streaming face of ``dedup.incremental_exact_dedup``: state is
    one fingerprint per kept doc, expired past the watermark — bounded
    memory on an unbounded corpus stream. Re-ingested/replayed documents
    inside the horizon are dropped without any store lookup.
    """
    from ..operators.text import fingerprint

    return (
        docs.withColumn("fingerprint", fingerprint(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def foreach_batch_dedup_ingest(
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Callable[[DataFrame, int], None]:
    """Continuous corpus ingestion with exact content dedup: each
    micro-batch is deduped against EVERYTHING already ingested
    (``dedup.incremental_exact_dedup``) and written to its own
    ``epoch=N`` partition of the output corpus.

    Exactly-once without a side store: the fingerprint store IS the
    output corpus (its ``fingerprint`` column — column-pruned read), and
    each epoch recomputes its kept set against the corpus EXCLUDING its
    own partition, then dynamic-partition-overwrites only that
    partition. A replayed epoch therefore reproduces and overwrites its
    exact prior output — idempotent even when the crash landed between
    the data write and the checkpoint commit (asserted in tests).
    """
    from pyspark.errors import AnalysisException as _AE

    from ..operators.dedup import incremental_exact_dedup

    def apply(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        try:
            store = (
                spark.read.parquet(out_path)
                .filter(F.col("epoch") != epoch_id)
                .select("fingerprint")
            )
        except _AE:
            store = spark.createDataFrame([], "fingerprint string")
        kept = incremental_exact_dedup(batch, store, text_col, id_col)
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                kept.withColumn("epoch", F.lit(epoch_id))
                .write.mode("overwrite")
                .partitionBy("epoch")
                .parquet(out_path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return apply


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static join (J1 on a stream): each micro-batch joins
    against the static dimension — broadcast, so the stream never
    shuffles for the join. The dim is re-resolved per batch, so a
    re-loaded dimension table is picked up without restarting the query."""
    return events.join(F.broadcast(dim), on=on, how=how)


def stream_stream_window_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    strict: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join — the streaming twin of
    ``temporal.preceding_window_join`` (same pairing semantics:
    right rows in ``[left.ts - window, left.ts)`` per equi-key, upper
    bound closed when ``strict=False``).

    Both sides carry watermarks and the join condition bounds event-time
    distance, so each side's buffered state expires once the other
    side's watermark passes — REQUIRED: an unbounded stream-stream join
    buffers forever. Equality with the batch operator on a replayed
    history is asserted in tests.

    ``how`` extends to the outer modes (``leftOuter`` / ``rightOuter``
    / ``fullOuter``): an outer row emits with nulls only once the
    OTHER side's watermark has passed its whole match window — i.e. the
    engine can prove no future match exists — so rows inside the final
    watermark horizon at end-of-stream are withheld, exactly the
    late-data contract the windowed aggregations follow.  Matched pairs
    are emitted identically to the inner join (pytested).
    """
    if not on:
        raise ValueError("stream-stream join requires at least one equi-key")
    allowed = {"inner", "leftOuter", "rightOuter", "fullOuter"}
    if how not in allowed:
        raise ValueError(f"how must be one of {sorted(allowed)}")
    l = left.withWatermark(left_ts, watermark).alias("__l")
    r = right.withWatermark(right_ts, watermark).alias("__r")
    l_ts, r_ts = F.col(f"__l.{left_ts}"), F.col(f"__r.{right_ts}")
    upper = (r_ts < l_ts) if strict else (r_ts <= l_ts)
    cond = (r_ts >= l_ts - F.expr(f"INTERVAL {window}")) & upper
    for k in on:
        cond = cond & (F.col(f"__l.{k}") == F.col(f"__r.{k}"))
    return l.join(r, cond, how)


def foreach_batch_parquet_upsert(
    target_path: str,
    key_cols: Sequence[str],
    partition_col: str,
    order_by: Sequence[str] | None = None,
) -> Callable[[DataFrame, int], None]:
    """ForeachBatch MERGE into a partitioned parquet target — the shipped
    distributed upsert body (the reference's keyed gold load,
    `wistia-Azure-Data-Factory-ETL-Pipeline.json:117-120`, minus the
    external copy tool). Per micro-batch:

    1. keep ONE deterministic row per key within the batch
       (``dedup_keep_first`` under ``order_by``);
    2. read only the target partitions the batch touches;
    3. anti-join out target rows whose key reappears in the batch;
    4. rewrite exactly those partitions via dynamic partition overwrite.

    No data row moves through the driver — only the small set of touched
    ``partition_col`` values is collected; work per batch is proportional
    to the touched partitions, never the table. Replaying a failed epoch
    is idempotent: per-key overwrite converges to the same state.

    Constraint: ``partition_col`` must be contained in (or functionally
    determined by) ``key_cols`` — a key whose partition value changed
    across batches would strand its old row in the previous partition.
    """
    if partition_col not in key_cols:
        raise ValueError(
            f"partition_col {partition_col!r} must be one of key_cols "
            f"{list(key_cols)} (a migrating key would strand stale rows)"
        )

    from ..operators.quality import dedup_keep_first

    def apply(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        latest = dedup_keep_first(batch, key_cols, order_by=order_by)
        parts = [r[0] for r in latest.select(partition_col).distinct().collect()]
        try:
            existing = spark.read.parquet(target_path).filter(
                F.col(partition_col).isin(parts)
            )
        except AnalysisException as e:
            if "PATH_NOT_FOUND" not in str(e):
                raise
            existing = None
        out = latest if existing is None else latest.unionByName(
            existing.join(
                F.broadcast(latest.select(*key_cols)), on=list(key_cols), how="left_anti"
            )
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            out.write.mode("overwrite").partitionBy(partition_col).parquet(target_path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return apply


def foreach_batch_upsert(
    target: dict[tuple, tuple],
    key_cols: Sequence[str],
) -> Callable[[DataFrame, int], None]:
    """TEST DOUBLE ONLY: dict-backed keyed upsert for asserting sink
    contents in pytest. It collects every batch row to the driver, so it
    must never back a production stream — the shipped merge body is
    :func:`foreach_batch_parquet_upsert` (fully distributed, partition-
    pruned, idempotent on epoch replay).
    """

    def apply(batch: DataFrame, epoch_id: int) -> None:
        cols = batch.columns
        key_idx = [cols.index(k) for k in key_cols]
        for row in batch.collect():  # micro-batch: bounded rows by design
            t = tuple(row)
            target[tuple(t[i] for i in key_idx)] = t

    return apply


def run_to_memory_sink(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "append",
    state_partitions: int | None = 8,
) -> list[dict]:
    """Drive a streaming frame to completion against the memory sink
    (test/demo helper): processAllAvailable() then stop. Results land in
    ``SELECT * FROM <query_name>``; returns the query's recentProgress
    dicts (captured before stop) so callers can assert on state-store
    metrics — e.g. that the configured provider actually ran.

    ``state_partitions`` bounds ``spark.sql.shuffle.partitions`` for
    the streaming query only (restored after stop): every stateful
    task pays a fixed state-store open/commit constant per microbatch,
    so at the bounded volumes this helper drives, 32 partitions means
    32 near-empty state stores PER stateful operator — measured 2.6x
    total wall on the stream-stream join entry (10.6 s -> 4.0 s at 8).
    Production jobs should instead size the setting to state-key
    cardinality; pass ``None`` to leave the session setting untouched.
    The setting is captured when the query STARTS and persists through
    its checkpoint lineage, which is why it is applied around
    ``start()`` rather than per-batch."""
    spark = stream_df.sparkSession
    prev = None
    if state_partitions is not None:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
            progress = [p for p in q.recentProgress if p is not None]
        finally:
            q.stop()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return progress


def run_foreach_batch(
    stream_df: DataFrame, fn: Callable[[DataFrame, int], None]
) -> None:
    """Drive a streaming frame through a foreachBatch sink to completion."""
    q = stream_df.writeStream.outputMode("append").foreachBatch(fn).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def continuous_daily_rollup(
    events: DataFrame,
    target_path: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    checkpoint: str | None = None,
) -> None:
    """Hypertable-style continuous aggregate: a date-partitioned parquet
    rollup table incrementally maintained from the stream.

    Per micro-batch: aggregate the batch to (date, keys) partials, merge
    with the existing rollup rows FOR THE AFFECTED DATES ONLY, and
    rewrite just those date partitions (dynamic partition overwrite).
    Work per batch is proportional to the batch's date span — never a
    full-table rewrite; untouched historical partitions are never read.

    Counts and sums merge associatively, so the rollup equals the batch
    recompute (asserted in tests). Average-style measures must be stored
    as (sum, count) partials, which this does.

    Exactly-once across crashes: additive merges are NOT naturally
    idempotent — if an epoch's partition overwrite lands but the
    checkpoint commit doesn't, Structured Streaming replays the epoch
    and a naive merge would add its partials twice. Each stored row
    therefore carries ``last_epoch`` (the epoch that last merged into
    it); a replayed epoch sees ``max(last_epoch) >= epoch_id`` for an
    already-merged date and skips that date's partials. The guard
    assumes one checkpointed query lineage per target path (epoch ids
    restart at 0 under a NEW checkpoint — point a fresh query at a
    fresh rollup, or backfill batch-side).
    """
    writer = events.writeStream.outputMode("append").foreachBatch(
        rollup_merge_fn(target_path, ts_col, key_cols, value_col)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def backfill_daily_rollup(
    events: DataFrame,
    target_path: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
) -> None:
    """Batch bootstrap for :func:`continuous_daily_rollup`: compute the
    same (date, keys) rollup schema from historical events in ONE batch
    job and write it with ``last_epoch = -1`` — below any checkpoint's
    epoch ids, so a NEW streaming query merges on top without tripping
    the replay guard. This is the documented handoff for "epoch ids
    restart under a new checkpoint": backfill history batch-side, then
    point the fresh stream at events AFTER the backfill cutoff (the
    caller partitions the timeline; overlapping events would be counted
    twice, same as any additive rollup).
    """
    rollup = (
        events.withColumn("date", F.to_date(ts_col))
        .groupBy("date", *key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce(F.col(value_col), F.lit(0.0))).alias("sum_value"),
        )
        .withColumn("last_epoch", F.lit(-1).cast("long"))
    )
    rollup.write.mode("overwrite").partitionBy("date").parquet(target_path)


def rollup_merge_fn(
    target_path: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch body behind :func:`continuous_daily_rollup`,
    exposed so tests can replay an epoch directly (crash-between-write-
    and-commit simulation) against static micro-batch frames."""

    def merge(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        partial = (
            batch.withColumn("date", F.to_date(ts_col))
            .groupBy("date", *key_cols)
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.coalesce(F.col(value_col), F.lit(0.0))).alias("sum_value"),
            )
            .withColumn("last_epoch", F.lit(epoch_id).cast("long"))
        )
        if partial.isEmpty():
            return
        dates = [r.date for r in partial.select("date").distinct().collect()]
        try:
            existing = spark.read.parquet(target_path).filter(F.col("date").isin(dates))
        except AnalysisException as e:
            # ONLY path-not-found means "first batch"; any other read
            # failure must abort the batch (merging against a frame we
            # failed to read would silently drop history)
            if "PATH_NOT_FOUND" not in str(e):
                raise
            existing = None
        if existing is not None:
            if "last_epoch" not in existing.columns:  # pre-guard table
                existing = existing.withColumn("last_epoch", F.lit(-1).cast("long"))
            # dates already merged by a completed attempt of THIS epoch
            # (crash fell between partition write and checkpoint commit)
            applied = [
                r.date
                for r in existing.groupBy("date")
                .agg(F.max("last_epoch").alias("e"))
                .filter(F.col("e") >= epoch_id)
                .collect()
            ]
            if applied:
                partial = partial.filter(~F.col("date").isin(applied))
                existing = existing.filter(~F.col("date").isin(applied))
                if partial.isEmpty():
                    return
        merged = partial if existing is None else (
            partial.unionByName(existing)
            .groupBy("date", *key_cols)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
                F.max("last_epoch").alias("last_epoch"),
            )
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                merged.write.mode("overwrite")
                .partitionBy("date")
                .parquet(target_path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return merge


# ---------------------------------------------------------------------------
# streaming face of the exact mergeable state (operators/mergeable.py)
# ---------------------------------------------------------------------------


def state_contribution_fn(
    state_path: str,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> Callable[[DataFrame, int], None]:
    """ForeachBatch body maintaining the exact mergeable KPI state
    (``operators/mergeable.daily_state`` rows: additive counts/cents +
    OR-mergeable exact user bitmaps) as EPOCH-PARTITIONED contributions.

    Unlike ``continuous_daily_rollup``'s last_epoch guard, idempotence
    here is structural: each epoch writes ONLY its own contribution
    partition (dynamic overwrite on ``epoch``), so a replayed epoch
    overwrites itself instead of double-adding — no read-modify-write
    of prior state at all, which also makes concurrent backfill writers
    safe as long as they use disjoint epoch ids. Readers merge
    contributions at query time (``read_state_report``); a periodic
    compaction can fold old epochs into one without changing results
    (merge is associative — property-tested batch-side).
    """
    from ..operators.mergeable import daily_state

    def apply(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        contrib = daily_state(
            batch, ts_col=ts_col, user_col=user_col, value_col=value_col
        ).withColumn("epoch", F.lit(epoch_id))
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                contrib.write.mode("overwrite")
                .partitionBy("epoch")
                .parquet(state_path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return apply


def streaming_state_refresh(
    events: DataFrame,
    state_path: str,
    checkpoint: str | None = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> None:
    """Run a stream to completion through ``state_contribution_fn`` —
    the streaming twin of the batch ``incremental_kpi_refresh`` path."""
    writer = events.writeStream.outputMode("append").foreachBatch(
        state_contribution_fn(state_path, ts_col, user_col, value_col)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def read_state_report(spark, state_path: str) -> DataFrame:
    """Merge all epoch contributions and collapse to the daily KPI
    report — reads the (tiny) state table only, never raw history."""
    from ..operators.mergeable import merge_states, state_report

    raw = spark.read.parquet(state_path).drop("epoch")
    return state_report(merge_states(raw))
