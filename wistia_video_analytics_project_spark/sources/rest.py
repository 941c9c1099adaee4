"""REST API ingestion source (S4, SURVEY.md §2.1).

Re-expresses the reference's Wistia-API ingester (`wistia-Databricks
notebool-02.py:105-168`): page/per_page pagination, 429 exponential
backoff, 404 skip, `since` incremental parameter, bounded page count.

Differences by design:

- **Injectable transport.** ``transport(url, params) -> (status, payload)``
  — production wires ``urllib``; tests inject fakes. No hard dependency
  on any HTTP client package.
- **Two execution tiers.** The reference fetches everything on the
  driver. :meth:`RestIngester.fetch_rows` keeps that (correct for small
  id sets); :func:`fetch_distributed` fans the (media_id, page) task list
  out across executors with ``mapInPandas`` so ingestion scales with the
  cluster, not the driver.
- Rate-limit sleeps are parameters (0 in tests), not hardcoded.
"""

from __future__ import annotations

import json
import os
import time
import urllib.parse
import urllib.request
from collections.abc import Callable, Iterator, Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

Transport = Callable[[str, dict], tuple[int, object]]


def _env_name(key: str) -> str:
    return key.upper().replace(".", "_").replace("-", "_")


def resolve_config(
    key: str,
    *,
    explicit: str | None = None,
    spark: SparkSession | None = None,
    env: Mapping[str, str] | None = None,
) -> str:
    """Credential/config resolution chain, re-expressing the reference's
    secret-scope → Spark-conf → hard-error lookup (`wistia-Databricks
    notebool-02.py:54-82`) with open equivalents:

    1. ``explicit`` argument — the caller already holds the value;
    2. environment variable (``key`` upper-cased, ``.``/``-`` → ``_``) —
       the open stand-in for a managed secret scope;
    3. Spark conf ``key`` verbatim (cluster-level config);
    4. otherwise a hard error naming every location probed — config
       problems must fail the job loudly, not surface later as 401s.
    """
    if explicit is not None:
        return explicit
    env_map = os.environ if env is None else env
    env_key = _env_name(key)
    val = env_map.get(env_key)
    if val is not None:
        return val
    if spark is not None:
        conf_val = spark.conf.get(key, None)
        if conf_val is not None:
            return conf_val
    probed = [f"argument explicit=", f"env ${env_key}"]
    probed.append(f"spark.conf[{key!r}]" if spark is not None else "(no spark session)")
    raise KeyError(
        f"config {key!r} not found; probed: {', '.join(probed)}. "
        f"Set the env var or Spark conf, or pass the value explicitly."
    )


def urllib_transport(url: str, params: dict) -> tuple[int, object]:
    """Default transport: stdlib urllib, JSON response."""
    q = urllib.parse.urlencode(params)
    req = urllib.request.Request(f"{url}?{q}" if q else url)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read().decode())
    except urllib.error.HTTPError as e:  # status-carrying failure
        return e.code, None


@dataclass
class RestIngester:
    """Paginated, retrying REST reader.

    Mirrors `notebool-02.py` semantics: ``per_page`` rows per request
    (max_pages cap `notebool-02.py:148,165-167`), retry with exponential
    backoff on 429 (`:105-126`), skip on 404 (`:134-136`).
    """

    base_url: str
    transport: Transport = field(default=urllib_transport)
    per_page: int = 100
    max_pages: int = 100
    max_retries: int = 3
    backoff_base_s: float = 5.0
    page_sleep_s: float = 0.0
    sleeper: Callable[[float], None] = field(default=time.sleep)
    #: merged under every request's params — the auth slot
    #: (`notebool-02.py` passes api_password on each call)
    default_params: dict = field(default_factory=dict)

    @classmethod
    def from_conf(
        cls,
        spark: SparkSession | None = None,
        *,
        url_key: str = "wistia.api.url",
        token_key: str = "wistia.api.token",
        token_param: str = "api_password",
        base_url: str | None = None,
        token: str | None = None,
        env: Mapping[str, str] | None = None,
        **kwargs,
    ) -> "RestIngester":
        """Build an ingester with base URL and API token resolved through
        :func:`resolve_config` (explicit → env → Spark conf → error),
        mirroring the reference's secret-scope bootstrap
        (`notebool-02.py:54-82`). The token rides ``default_params`` as
        ``token_param`` on every request (`notebool-02.py:97-103`)."""
        return cls(
            base_url=resolve_config(
                url_key, explicit=base_url, spark=spark, env=env
            ),
            default_params={
                token_param: resolve_config(
                    token_key, explicit=token, spark=spark, env=env
                )
            },
            **kwargs,
        )

    def _get_with_retry(self, url: str, params: dict) -> object | None:
        """GET with 429 backoff (2^attempt * backoff_base_s,
        `notebool-02.py:113-114`) and 404 -> None. ``default_params``
        (auth) merge under the per-call params here, the single choke
        point every request passes through."""
        params = {**self.default_params, **params}
        for attempt in range(self.max_retries + 1):
            status, payload = self.transport(url, params)
            if status == 200:
                return payload
            if status == 404:
                return None
            if status == 429 and attempt < self.max_retries:
                self.sleeper((2**attempt) * self.backoff_base_s)
                continue
            raise IOError(f"GET {url} failed with status {status}")
        raise IOError(f"GET {url} exhausted {self.max_retries} retries (429)")

    def fetch_one(self, path: str, params: dict | None = None) -> object | None:
        """Single-resource GET (media stats, `notebool-02.py:128-139`)."""
        return self._get_with_retry(f"{self.base_url}/{path}", params or {})

    def fetch_pages(
        self, path: str, params: dict | None = None, since: str | None = None
    ) -> Iterator[object]:
        """Paginated GET yielding records until a short/empty page or the
        page cap (`notebool-02.py:141-168`). ``since`` is the incremental
        watermark parameter (`:149-150`)."""
        base = dict(params or {})
        if since is not None:
            base["since"] = since
        for page in range(1, self.max_pages + 1):
            payload = self._get_with_retry(
                f"{self.base_url}/{path}",
                {**base, "page": page, "per_page": self.per_page},
            )
            if not payload:
                return
            records = payload if isinstance(payload, list) else [payload]
            yield from records
            if len(records) < self.per_page:
                return
            if self.page_sleep_s:
                self.sleeper(self.page_sleep_s)

    def fetch_rows(
        self,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        params: dict | None = None,
        since: str | None = None,
    ) -> DataFrame:
        """Driver-side fetch -> DataFrame (the reference tier,
        `notebool-02.py:170-181`). Use for small id sets; see
        :func:`fetch_distributed` for fan-out."""
        rows = [_project(r, schema) for r in self.fetch_pages(path, params, since)]
        return spark.createDataFrame(rows, schema)


def _project(record: object, schema: T.StructType) -> tuple:
    if not isinstance(record, dict):
        raise ValueError(f"expected JSON object, got {type(record).__name__}")
    return tuple(record.get(f.name) for f in schema.fields)


def fetch_distributed(
    spark: SparkSession,
    make_ingester: Callable[[], RestIngester],
    paths: Sequence[str],
    schema: T.StructType,
    since: str | None = None,
    tasks_per_partition: int = 1,
) -> DataFrame:
    """Executor-side fan-out: one task per resource path.

    The task list (tiny) becomes a DataFrame, repartitioned so each
    executor slot pulls a disjoint set of resources; ``mapInPandas``
    executes the paginated fetch per task and yields Arrow batches.
    ``make_ingester`` is a zero-arg factory so transports/credentials are
    constructed ON the executor (closures must not capture sockets).

    This is the 1000-executor shape of S4: ingestion throughput scales
    with cluster size while retry/backoff stays per-task.
    """
    import pandas as pd

    field_names = [f.name for f in schema.fields]
    n_parts = max(1, len(paths) // max(tasks_per_partition, 1))
    tasks = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).repartition(n_parts)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ing = make_ingester()
        for pdf in batches:
            out: list[tuple] = []
            for path in pdf["path"]:
                for rec in ing.fetch_pages(path, since=since):
                    out.append(_project(rec, schema))
            if out:
                yield pd.DataFrame(out, columns=field_names)

    return tasks.mapInPandas(run, schema=schema)
