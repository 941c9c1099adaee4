"""Spark 4 Python DataSource face of the REST ingester (S4).

``spark.read.format("rest_api")`` — the same pagination / retry /
backoff / ``since`` semantics as :class:`.rest.RestIngester`
(re-expressing `wistia-Databricks notebool-02.py:105-168`), but as a
first-class DataSource V2 plugin:

- **Executor-side partitions.**  One :class:`InputPartition` per
  resource path — the planner schedules fetches across the cluster
  exactly like :func:`.rest.fetch_distributed`, but through the
  standard reader path (so it composes with ``.load().filter(...)``,
  caching, AQE, and every downstream operator with no glue code).
- **Filter pushdown into the API.**  ``pushFilters`` converts a
  ``GreaterThan``/``GreaterThanOrEqual`` predicate on the configured
  ``since_col`` into the API's ``since`` request parameter — the REST
  equivalent of parquet min/max pruning: rows are skipped at the
  SOURCE, not post-fetch.  All other filters are returned unhandled
  and evaluated by Spark as usual.
- **Options are plain strings** (DataSource contract), so transports
  are named, not injected: ``transport=urllib`` (default, stdlib).
  Credentials resolve on the EXECUTOR through the same
  :func:`.rest.resolve_config` chain (env var → Spark conf → error).

Requires ``spark.sql.python.filterPushdown.enabled=true`` (on by
default in :func:`..session.get_spark` / ``configure_runtime``; a
reader implementing ``pushFilters`` refuses to initialize without it).

Register once per session::

    spark.dataSource.register(RestDataSource)
    df = (spark.read.format("rest_api")
          .schema("id long, name string, created string")
          .option("base_url", "https://api.example.com/v1")
          .option("paths", "medias/m1/stats,medias/m2/stats")
          .load()
          .filter(F.col("created") > "2024-01-01"))   # pushed as since=
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator, Sequence

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class RestDataSource(DataSource):
    """format("rest_api"): paginated REST endpoints as a DataFrame."""

    @classmethod
    def name(cls) -> str:
        return "rest_api"

    def schema(self):
        raise ValueError(
            "rest_api requires an explicit .schema(...) — REST payloads "
            "carry no reliable type metadata and inference would need an "
            "extra full fetch (same policy as read_csv)"
        )

    def reader(self, schema: StructType) -> "RestReader":
        return RestReader(schema, dict(self.options))


class RestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.base_url = options.get("base_url")
        if not self.base_url:
            raise ValueError("rest_api: option 'base_url' is required")
        self.paths: Sequence[str] = [
            p.strip() for p in options.get("paths", "").split(",") if p.strip()
        ]
        if not self.paths:
            raise ValueError(
                "rest_api: option 'paths' (comma-separated resource paths) "
                "is required"
            )
        self.per_page = int(options.get("per_page", "100"))
        self.max_pages = int(options.get("max_pages", "100"))
        self.since = options.get("since")  # explicit option wins
        self.since_col = options.get("since_col")
        self.max_retries = int(options.get("max_retries", "3"))

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        """Push a lower-bound predicate on ``since_col`` into the API's
        ``since`` parameter; everything else stays with Spark.  With
        multiple pushable bounds the tightest (max) wins — the filters
        list is an AND."""
        unhandled = []
        for f in filters:
            if (
                self.since_col is not None
                and isinstance(f, (GreaterThan, GreaterThanOrEqual))
                and f.attribute == (self.since_col,)
            ):
                bound = str(f.value)
                if self.since is None or bound > self.since:
                    self.since = bound
                # the API's since is inclusive-ish (>=); a strict > must
                # still be re-checked by Spark, so only >= is fully
                # absorbed
                if isinstance(f, GreaterThan):
                    unhandled.append(f)
            else:
                unhandled.append(f)
        return unhandled

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(p) for p in self.paths]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        # constructed ON the executor — no sockets cross the closure
        from .rest import RestIngester, _project, urllib_transport

        ing = RestIngester(
            base_url=self.base_url,
            transport=urllib_transport,
            per_page=self.per_page,
            max_pages=self.max_pages,
            max_retries=self.max_retries,
            page_sleep_s=0.0,
        )
        for rec in ing.fetch_pages(partition.value, since=self.since):
            yield _project(rec, self.schema)


class RestStreamDataSource(DataSource):
    """format("rest_api_stream"): the S5 incremental-watermark pattern
    as a real Structured Streaming SOURCE.  Each micro-batch polls the
    endpoint with ``since=<last offset>`` and advances the offset to the
    max ``since_col`` value seen — the REST-cursor twin of the batch
    :class:`.watermark.WatermarkStore` flow, but checkpoint-managed by
    Spark (offsets live in the stream checkpoint, replays re-fetch
    between committed offsets).

    Contract: ``since_col`` must be STRICTLY monotonic per record (a
    cursor/id/created-at with unique values — the standard REST cursor
    guarantee).  Records equal to the current offset are consumed;
    late-arriving ties behind the cursor would be missed, exactly as
    with any cursor-paged API.

    Driver-side reads (SimpleDataSourceStreamReader): sized for control-
    plane polling rates; use the batch ``rest_api`` format +
    ``fetch_distributed`` for bulk backfill.
    """

    @classmethod
    def name(cls) -> str:
        return "rest_api_stream"

    def schema(self):
        raise ValueError("rest_api_stream requires an explicit .schema(...)")

    def simpleStreamReader(self, schema: StructType):
        return RestSimpleStreamReader(schema, dict(self.options))


class RestSimpleStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.base_url = options.get("base_url")
        if not self.base_url:
            raise ValueError("rest_api_stream: option 'base_url' is required")
        self.paths = [
            p.strip() for p in options.get("paths", "").split(",") if p.strip()
        ]
        if not self.paths:
            raise ValueError("rest_api_stream: option 'paths' is required")
        self.since_col = options.get("since_col")
        if not self.since_col:
            raise ValueError(
                "rest_api_stream: option 'since_col' (the monotonic cursor "
                "field) is required"
            )
        self.start_since = options.get("since", "")
        self.per_page = int(options.get("per_page", "100"))
        self.max_pages = int(options.get("max_pages", "100"))
        self.max_retries = int(options.get("max_retries", "3"))

    def initialOffset(self) -> dict:
        return {"since": self.start_since}

    def _ingester(self):
        from .rest import RestIngester, urllib_transport

        return RestIngester(
            base_url=self.base_url,
            transport=urllib_transport,
            per_page=self.per_page,
            max_pages=self.max_pages,
            max_retries=self.max_retries,
            page_sleep_s=0.0,
        )

    def _fetch(self, since: str, upper: str | None = None):
        """All records strictly after ``since`` (optionally bounded by
        ``upper`` inclusive, for offset-range replay)."""
        from .rest import _project

        ing = self._ingester()
        rows, max_seen = [], since
        for path in self.paths:
            for rec in ing.fetch_pages(path, since=since or None):
                cur = str(rec.get(self.since_col))
                if since and cur <= since:
                    continue  # API since= is inclusive; offset is consumed
                if upper is not None and cur > upper:
                    continue
                if cur > max_seen:
                    max_seen = cur
                rows.append(_project(rec, self.schema))
        return rows, max_seen

    def read(self, start: dict):
        rows, max_seen = self._fetch(start.get("since", ""))
        return iter(rows), {"since": max_seen}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows, _ = self._fetch(start.get("since", ""), upper=end.get("since"))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass


@dataclass
class RestCommitMessage(WriterCommitMessage):
    n_rows: int = 0
    n_batches: int = 0


class RestWriteDataSource(DataSource):
    """format("rest_api_sink"): POST rows back to an endpoint — the
    write face of the connector (webhook/export flows; the reference's
    outbound boundary is JDBC, `sinks.jdbc_truncate_load`, but modern
    estates also push to HTTP collectors).

    Each executor task batches its partition's rows into JSON arrays of
    ``batch_size`` and POSTs them with the same retry/backoff stack as
    the reader; per-task row/batch counts travel back as commit
    messages so ``commit`` can log the total only after EVERY task
    succeeded (Spark re-runs failed tasks — the endpoint must tolerate
    at-least-once delivery, stated in the option contract).
    """

    @classmethod
    def name(cls) -> str:
        return "rest_api_sink"

    def writer(self, schema: StructType, overwrite: bool):
        return RestWriter(schema, dict(self.options))

    def streamWriter(self, schema: StructType, overwrite: bool):
        # same at-least-once POST body per micro-batch epoch
        return RestStreamWriter(schema, dict(self.options))


class _RestPostBase:
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.url = options.get("url")
        if not self.url:
            raise ValueError("rest_api_sink: option 'url' is required")
        self.batch_size = int(options.get("batch_size", "100"))
        self.max_retries = int(options.get("max_retries", "3"))

    def _post_rows(self, iterator) -> RestCommitMessage:
        import json as jsonlib
        import urllib.request

        names = [f.name for f in self.schema.fields]
        n_rows = n_batches = 0
        buf = []

        def flush():
            nonlocal n_batches
            if not buf:
                return
            body = jsonlib.dumps(buf).encode()
            req = urllib.request.Request(
                self.url,
                data=body,
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            last_err = None
            for _ in range(self.max_retries):
                try:
                    with urllib.request.urlopen(req) as resp:
                        if 200 <= resp.status < 300:
                            n_batches += 1
                            buf.clear()
                            return
                        last_err = OSError(f"HTTP {resp.status}")
                except Exception as e:  # noqa: BLE001 — retried, then re-raised
                    last_err = e
            raise RuntimeError(
                f"rest_api_sink: POST failed after {self.max_retries} "
                f"attempts: {last_err}"
            )

        for row in iterator:
            buf.append({k: row[k] for k in names})
            n_rows += 1
            if len(buf) >= self.batch_size:
                flush()
        flush()
        return RestCommitMessage(n_rows=n_rows, n_batches=n_batches)


class RestWriter(_RestPostBase, DataSourceWriter):
    def write(self, iterator) -> RestCommitMessage:
        return self._post_rows(iterator)

    def commit(self, messages) -> None:
        total = sum(m.n_rows for m in messages if m is not None)
        # nothing external to finalize (at-least-once POSTs already
        # landed); the aggregate is informational
        self.last_commit_rows = total

    def abort(self, messages) -> None:
        pass


class RestStreamWriter(_RestPostBase, DataSourceStreamWriter):
    def write(self, iterator) -> RestCommitMessage:
        return self._post_rows(iterator)

    def commit(self, messages, batchId) -> None:
        pass

    def abort(self, messages, batchId) -> None:
        pass
