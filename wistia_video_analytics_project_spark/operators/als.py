"""Alternating least squares matrix factorization (recommender tier).

Factorizes the (customer x part) purchase matrix into rank-k factor
matrices by alternating regularized least-squares solves — the classic
collaborative-filtering trainer (Koren/Hu-Koren-Volinsky shape,
explicit-weight variant), built Spark-first:

- **Factors live as DataFrames, never driver state.**  Each half-step
  joins the ratings to the OPPOSITE side's factor frame (an ordinary
  parallel equi-join — no broadcast requirement, so neither side needs
  to fit in memory at 100 TB), accumulates each entity's k x k normal
  equations ENTIRELY JVM-side (per-rating outer-product arrays folded
  with ``aggregate``/``zip_with`` in sorted partner order), and solves
  all entities in one batched LAPACK call per Arrow batch
  (``mapInPandas`` + stacked ``np.linalg.solve``).  Python is invoked
  once per BATCH of entities, never per entity: the first cut used
  ``groupBy().applyInPandas`` and spent ~2 ms of dispatch per group —
  65x the numeric work — exactly the per-group overhead wall the
  catalog side (thousands of items) hits first.
- **Deterministic end to end**: factor init is a hash of (id, dim)
  (no RNG), and each entity's accumulation folds its contributions in
  sorted partner-id order, so float summation order — the only
  nondeterminism the shuffle would otherwise introduce — is fixed.
  The pytest pins the whole trainer against a pure-numpy reference.
- **Skew-safe by default**: the sorted fold buffers one entity's whole
  contribution list (degree x (k²+k) doubles) in a single aggregation
  state, which a power-law hot item can blow up.  ``als_train``
  therefore probes the max entity degree once up front and, above
  ``skew_degree_threshold``, switches to k²+k plain ``sum`` aggregates
  — map-side combine shrinks the shuffle from ratings·k² to
  entities·k² doubles and bounds every aggregation state at k²+k —
  at the cost of last-ulp shuffle-order nondeterminism (the skewed
  pytest pins the two paths against each other at 1e-6).
- **Serving scales through the ANN tier, not a cartesian**: the exact
  ``recommend_topk`` scores user x catalog (fine for bounded
  catalogs, and the oracle path); above ``ann_threshold`` items the
  ``method="auto"`` default routes to :func:`recommend_topk_ann`,
  which IVF-partitions the item factors (max-inner-product reduced to
  cosine by the Neyshabur-Srebro norm-augmentation) so each user
  scores only ``nprobe / n_centroids`` of the catalog.
- **Loss is one distributed pass** (join + squared-error aggregate),
  reported per iteration; ALS guarantees it non-increasing, which the
  test asserts.

No counterpart in the reference repo; extends the graph/similarity
tier (co-purchase PageRank, hard negatives) with the standard
factorization-based recommender those feed into.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "init_factors",
    "als_train",
    "als_loss",
    "recommend_topk",
    "recommend_topk_ann",
]


def _hash_unit(seed_col: str, k: int) -> list:
    """k deterministic pseudo-random components in [-0.5, 0.5) from
    xxhash64(id, dim) — reproducible across partitionings/engines."""
    return [
        (
            (F.xxhash64(F.col(seed_col), F.lit(j)) % 1000000).cast("double")
            / 1000000.0
            / 2.0
        ).alias(f"f{j}")
        for j in range(k)
    ]


def init_factors(ids: DataFrame, id_col: str, k: int) -> DataFrame:
    """(id, factors array<double>) with hash-deterministic init."""
    return ids.select(
        F.col(id_col),
        F.array(*_hash_unit(id_col, k)).alias("factors"),
    )


def _solve_side(
    ratings: DataFrame,
    fixed: DataFrame,
    solve_for: str,
    fixed_id: str,
    k: int,
    reg: float,
    accumulation: str = "sorted",
) -> DataFrame:
    """One ALS half-step: solve ``solve_for``'s factors given the
    ``fixed`` side.  ratings = (user, item, rating); fixed =
    (fixed_id, factors).

    Three stages, Python touched once per Arrow batch:

    1. per-rating contribution (pure JVM): the flattened k² outer
       product ``y·yᵀ`` concatenated with the k-vector ``r·y``;
    2. per-entity reduce (pure JVM), two interchangeable strategies:

       - ``accumulation="sorted"`` (bit-deterministic): ``collect_list``
         the contributions, ``sort_array`` by partner id, fold with
         ``aggregate``+``zip_with``.  An entity's buffer is its rating
         count x (k²+k) doubles — fine at moderate degree, a hazard for
         a power-law hot entity (one aggregation state holds the whole
         list);
       - ``accumulation="sum"`` (skew-safe): k²+k plain ``sum``
         aggregates over the contribution elements.  Map-side combine
         applies, so the shuffle carries entities·(k²+k) doubles
         instead of ratings·(k²+k) and every aggregation state is a
         fixed k²+k floats no matter the degree.  Summation order
         follows shuffle arrival — last-ulp nondeterminism only.

    3. batched solve: ``mapInPandas`` stacks each batch into
       ``(n, k, k)`` / ``(n, k)`` arrays and calls ``np.linalg.solve``
       ONCE (LAPACK batch), so per-entity Python dispatch is gone.
    """
    joined = ratings.join(fixed.withColumnRenamed("factors", "__yf"), fixed_id)
    contrib = joined.select(
        solve_for,
        F.col(fixed_id).alias("__p"),
        F.concat(
            F.flatten(
                F.transform(
                    "__yf",
                    lambda a: F.transform("__yf", lambda b: a * b),
                )
            ),
            F.transform("__yf", lambda a: a * F.col("rating")),
        ).alias("__c"),
    )
    if accumulation == "sum":
        n_terms = k * k + k
        acc = (
            contrib.groupBy(solve_for)
            .agg(
                *[
                    F.sum(F.col("__c")[i]).alias(f"__s{i}")
                    for i in range(n_terms)
                ]
            )
            .select(
                solve_for,
                F.array(*[f"__s{i}" for i in range(n_terms)]).alias("__ab"),
            )
        )
    else:
        zero = F.array(*[F.lit(0.0) for _ in range(k * k + k)])
        acc = (
            contrib.groupBy(solve_for)
            .agg(
                F.sort_array(
                    F.collect_list(F.struct(F.col("__p"), F.col("__c")))
                ).alias("__l")
            )
            .select(
                solve_for,
                F.aggregate(
                    "__l",
                    zero,
                    lambda a, s: F.zip_with(a, s["__c"], lambda x, y: x + y),
                ).alias("__ab"),
            )
        )
    kk, regf = int(k), float(reg)

    def solve_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        eye = regf * np.eye(kk)
        for pdf in batches:
            if not len(pdf):
                continue
            ab = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["__ab"]]
            )
            a = ab[:, : kk * kk].reshape(-1, kk, kk) + eye
            b = ab[:, kk * kk :]
            x = np.linalg.solve(a, b)
            yield pd.DataFrame(
                {solve_for: pdf[solve_for], "factors": [r.tolist() for r in x]}
            )

    return acc.mapInPandas(
        solve_batches, f"{solve_for} long, factors array<double>"
    )


def als_loss(
    ratings: DataFrame,
    user_f: DataFrame,
    item_f: DataFrame,
    reg: float,
    user_col: str = "user",
    item_col: str = "item",
) -> float:
    """Regularized squared-error objective, one distributed pass."""
    pred = (
        ratings.join(
            user_f.select(
                F.col(user_col), F.col("factors").alias("__xu")
            ),
            user_col,
        )
        .join(
            item_f.select(
                F.col(item_col), F.col("factors").alias("__yi")
            ),
            item_col,
        )
        .select(
            (
                F.col("rating")
                - F.aggregate(
                    F.zip_with(
                        "__xu", "__yi", lambda a, b: a * b
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
            ).alias("err")
        )
    )
    sse = pred.agg(F.sum(F.col("err") * F.col("err"))).collect()[0][0]
    reg_term = 0.0
    for f in (user_f, item_f):
        s = f.select(
            F.aggregate(
                "factors", F.lit(0.0), lambda acc, v: acc + v * v
            ).alias("n2")
        ).agg(F.sum("n2")).collect()[0][0]
        reg_term += float(s or 0.0)
    return float(sse or 0.0) + float(reg) * reg_term


def als_train(
    ratings: DataFrame,
    k: int = 8,
    iterations: int = 3,
    reg: float = 0.1,
    user_col: str = "user",
    item_col: str = "item",
    track_loss: bool = True,
    accumulation: str = "auto",
    skew_degree_threshold: int = 10000,
) -> tuple[DataFrame, DataFrame, list[float]]:
    """Train rank-``k`` factors over (user, item, rating).

    Returns (user_factors, item_factors, per-iteration losses —
    measured AFTER each full user+item sweep).  Each half-step
    localCheckpoints its factor frame (CLAUDE.md: iterative loops must
    not chain cached lineage).

    ``accumulation="auto"`` probes the max entity degree once (a single
    cheap aggregate over the ratings) and picks the bit-deterministic
    sorted fold below ``skew_degree_threshold``, the skew-safe plain-sum
    path above it (see :func:`_solve_side`) — so one power-law hot item
    cannot blow up a ``collect_list`` buffer.  Pass ``"sorted"`` /
    ``"sum"`` to force a strategy."""
    r = ratings.select(
        F.col(user_col).alias("user"),
        F.col(item_col).alias("item"),
        F.col("rating").cast("double"),
    ).localCheckpoint(eager=False)
    if accumulation == "auto":
        # ONE probe job (r13): both max degrees ride a single action —
        # a cross join of two 1-row aggregates — instead of two
        # collects (and it doubles as the materializing action for the
        # lazy ratings checkpoint above)
        du = r.groupBy("user").count().agg(F.max("count").alias("du"))
        di = r.groupBy("item").count().agg(F.max("count").alias("di"))
        row = du.crossJoin(di).collect()[0]
        max_deg = max(int(row["du"] or 0), int(row["di"] or 0))
        accumulation = (
            "sum" if max_deg > int(skew_degree_threshold) else "sorted"
        )
    # lazy checkpoints (r13): each factor frame is consumed exactly
    # once by the next half-step's join, which materializes it inside
    # that half-step's job — one scheduled job per half-step instead
    # of two; the logical plan still truncates at every checkpoint.
    # With track_loss the per-iteration loss collect materializes the
    # chain anyway; WITHOUT it no action runs inside the loop, so the
    # lazy checkpoints would chain unmaterialized RDD dependencies
    # ``2*iterations`` deep until the caller's first action — bounded
    # here by an eager checkpoint every ``_EAGER_EVERY`` iterations
    # (round-13 ADVICE; no extra job at the small iteration counts the
    # registry bindings use)
    _EAGER_EVERY = 4
    item_f = init_factors(
        r.select("item").distinct(), "item", k
    ).localCheckpoint(eager=False)
    user_f = init_factors(r.select("user").distinct(), "user", k)
    losses: list[float] = []
    for it in range(int(iterations)):
        user_f = _solve_side(r, item_f, "user", "item", k, reg, accumulation)
        user_f = user_f.localCheckpoint(eager=False)
        item_f = _solve_side(r, user_f, "item", "user", k, reg, accumulation)
        eager = (not track_loss) and (it + 1) % _EAGER_EVERY == 0
        item_f = item_f.localCheckpoint(eager=eager)
        if track_loss:
            losses.append(als_loss(r, user_f, item_f, reg))
    return user_f, item_f, losses


def _rank_topn(
    scores: DataFrame, n: int, user_col: str, item_col: str
) -> DataFrame:
    """Shared ranking tail: rounded-6 score desc, item-id tiebreak —
    output order is engine-stable for both serving paths."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col("score").desc(), F.col(item_col).asc()
    )
    return (
        scores.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= n)
        .orderBy(user_col, "rnk")
    )


def recommend_topk(
    user_f: DataFrame,
    item_f: DataFrame,
    seen: DataFrame,
    n: int = 5,
    user_col: str = "user",
    item_col: str = "item",
    method: str = "auto",
    ann_threshold: int = 10000,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """Top-``n`` unseen items per user by factor dot product.

    ``method="exact"`` scores every (user, item) pair: a broadcast
    nested-loop of the two factor frames (catalog-bounded — the small-
    catalog / oracle path) minus an anti-join on ``seen``.
    ``method="ann"`` serves through :func:`recommend_topk_ann` (IVF
    over item factors — the 100 TB path).  ``method="auto"`` (default)
    counts the catalog once and picks ANN above ``ann_threshold``
    items, so the operator never silently runs a user x catalog
    cartesian at scale."""
    if method == "auto":
        method = "ann" if item_f.count() > int(ann_threshold) else "exact"
    if method == "ann":
        return recommend_topk_ann(
            user_f,
            item_f,
            seen,
            n,
            user_col=user_col,
            item_col=item_col,
            n_centroids=n_centroids,
            nprobe=nprobe,
        )
    scores = (
        user_f.select(F.col(user_col), F.col("factors").alias("__xu"))
        .crossJoin(
            F.broadcast(
                item_f.select(
                    F.col(item_col), F.col("factors").alias("__yi")
                )
            )
        )
        .select(
            user_col,
            item_col,
            F.round(
                F.aggregate(
                    F.zip_with("__xu", "__yi", lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                6,
            ).alias("score"),
        )
        .join(seen.select(user_col, item_col), [user_col, item_col], "left_anti")
    )
    return _rank_topn(scores, n, user_col, item_col)


def recommend_topk_ann(
    user_f: DataFrame,
    item_f: DataFrame,
    seen: DataFrame,
    n: int = 5,
    user_col: str = "user",
    item_col: str = "item",
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """ANN-served top-``n``: IVF over the item factors instead of a
    user x catalog cartesian.

    Max-inner-product search reduces to cosine NN by norm augmentation
    (Neyshabur & Srebro, "On Symmetric and Asymmetric LSHs for Inner
    Product Search"): append ``sqrt(M² − |y|²)`` to every item factor
    (``M`` = max item-factor norm, one bounded aggregate) and ``0.0``
    to every user factor — the augmented item norms are all ``M``, so
    cosine against an augmented user vector orders identically to the
    raw inner product.  The augmented item vectors are cell-partitioned
    with the similarity tier's deterministic coarse quantizer
    (:func:`~.similarity.ivf_centroids`); each user probes its
    ``nprobe`` nearest cells and scores only those cells' items with
    the EXACT dot product (same rounding + tiebreak as the exact path).

    Per-user work is ~``nprobe / n_centroids`` of the catalog and the
    plan is equi-joins on ``cell`` — no cartesian (pinned in
    tests/test_plans.py).  Recall loss comes only from cell probing:
    ``nprobe == n_centroids`` reproduces the exact path bit-for-bit
    (asserted in tests/test_als.py)."""
    import math

    from .similarity import ivf_assign

    norm2 = F.aggregate("factors", F.lit(0.0), lambda a, v: a + v * v)
    # ONE collect builds the quantizer (r14): the n_centroids seed rows
    # (smallest xxhash64(id) — ivf_centroids' deterministic sample) ride
    # the same job as the broadcast global max-norm aggregate, and the
    # norm augmentation of the seeds happens on the driver with the
    # SAME float ops (IEEE sqrt of the same doubles) the previous
    # two-job shape computed JVM-side.
    seed_rows = (
        item_f.select(F.col(item_col).alias("__id"), "factors",
                      norm2.alias("__n2"))
        .orderBy(F.xxhash64(F.col("__id")), F.col("__id"))
        .limit(n_centroids)
        .crossJoin(F.broadcast(item_f.agg(F.max(norm2).alias("__m2"))))
        .collect()
    )
    m2 = float(seed_rows[0]["__m2"] or 0.0) if seed_rows else 0.0
    cents = [
        (
            i,
            [float(x) for x in r["factors"]]
            + [math.sqrt(max(m2 - float(r["__n2"]), 0.0))],
        )
        for i, r in enumerate(seed_rows)
    ]
    aug_item = item_f.select(
        F.col(item_col),
        F.col("factors"),
        F.concat(
            "factors",
            F.array(F.sqrt(F.greatest(F.lit(m2) - norm2, F.lit(0.0)))),
        ).alias("__aug"),
    )
    aug_user = user_f.select(
        F.col(user_col),
        F.col("factors"),
        F.concat("factors", F.array(F.lit(0.0))).alias("__aug"),
    )
    # items carry ONE cell each, users nprobe cells -> the cell equi-join
    # yields each (user, item) candidate at most once.  The raw factor
    # arrays ride THROUGH the assignment map (``carry``) instead of
    # being joined back on the id afterwards — two fewer shuffling
    # joins on the serving path (r14, guide §2.4).
    items_c = ivf_assign(
        aug_item.withColumnRenamed("factors", "__yi"),
        cents, nprobe=1, id_col=item_col, vec_col="__aug", carry=["__yi"],
    )
    users_c = ivf_assign(
        aug_user.withColumnRenamed("factors", "__xu"),
        cents, nprobe=nprobe, id_col=user_col, vec_col="__aug",
        carry=["__xu"],
    )
    scores = (
        users_c.join(items_c, "cell")
        .select(
            user_col,
            item_col,
            F.round(
                F.aggregate(
                    F.zip_with("__xu", "__yi", lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                6,
            ).alias("score"),
        )
        .join(seen.select(user_col, item_col), [user_col, item_col], "left_anti")
    )
    return _rank_topn(scores, n, user_col, item_col)


def _bounded_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared bounded (customer, part, ln(1+qty)) slice for the two
    recommender bindings — 1000 customers x 5000 parts keeps registry
    cost SF-constant; the operators themselves carry no such bound."""
    from ..session import configure_runtime
    from ..sources import load_table

    configure_runtime(spark)
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_partkey") <= 5000)
        .join(
            orders.select("o_orderkey", "o_custkey").filter(
                F.col("o_custkey") <= 1000
            ),
            lineitem["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("o_custkey").alias("user"),
            F.col("l_partkey").alias("item"),
        )
        .agg(F.log1p(F.sum("l_quantity")).alias("rating"))
    )


def q_als_ann_recommender(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE serving path of `als_part_recommender`: identical
    bounded training, but top-3 recommendations served through the IVF
    index over norm-augmented item factors (nprobe 8 of 16 cells)
    instead of the user x catalog broadcast loop.  Rows-only: ALS has
    no SQL equivalent and the cell probe is approximate — exactness at
    nprobe == n_centroids plus clustered-factor recall are pinned in
    tests/test_als.py, and the no-cartesian plan shape in
    tests/test_plans.py."""
    from .. import cache

    # consumed twice — the training select and the serve-time ``seen``
    # anti-join; uncached, serving re-ran the full lineitem/orders
    # join+aggregate subtree (r14)
    ratings = cache.track(_bounded_ratings(spark, sf_dir).cache())
    user_f, item_f, _ = als_train(
        # accumulation pinned: the id slice bounds every degree by
        # construction (<=5000 items/user, <=1000 users/item), so the
        # auto-probe job is provably redundant here (r13)
        ratings, k=8, iterations=2, reg=0.1, track_loss=False,
        accumulation="sorted",
    )
    return recommend_topk_ann(
        user_f, item_f, ratings, n=3, n_centroids=16, nprobe=8
    ).filter(F.col("user") < 100)


def q_als_part_recommender(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-8 ALS over the (customer, part, ln(1+qty)) purchase matrix
    (binding trains on a BOUNDED id slice — 1000 customers x 5000
    parts — so the registry entry's cost is constant across SFs; the
    operator itself has no such bound), 2 sweeps, then top-3
    unseen-part recommendations for the customers with custkey < 100.
    Rows-only: alternating solves have no SQL equivalent
    (numpy-reference parity + loss monotonicity pinned in
    tests/test_als.py)."""
    from .. import cache

    # same two-consumer caching as the ANN binding (r14)
    ratings = cache.track(_bounded_ratings(spark, sf_dir).cache())
    user_f, item_f, _ = als_train(
        # accumulation pinned — same degree-bound argument as the ANN
        # binding above (r13)
        ratings, k=8, iterations=2, reg=0.1, track_loss=False,
        accumulation="sorted",
    )
    return recommend_topk(
        user_f, item_f, ratings, n=3, method="exact"
    ).filter(F.col("user") < 100)
