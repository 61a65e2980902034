"""Distributed k-means (Lloyd's) over embedding columns — the trainer the
IVF family (`operators/similarity.py:256` ivf_index / ivf_assign) was
missing: round 4/5 shipped index build, on-disk partition-pruned probes and
SemDeDup blocking against a *supplied* quantizer; this module learns that
quantizer from the corpus itself, distributed.

No reference counterpart (the reference engine,
catalyst-cooperative/ferc-xbrl-extractor, has no vector operators at all);
the gap-operator brief (SURVEY.md §2.12) calls for similarity-search
training-data tooling at 100 TB scale.

Design — exact integer Lloyd's:

* **Why integers.** A float k-means is nondeterministic across engines and
  across partitionings: centroid means are float sums (non-associative
  under a parallel aggregate) and argmin over float distances flips on
  near-ties, so a DuckDB oracle could never hash-match. Here every vector
  is quantized ONCE to integer milli-units (``round(v·1000)`` — exact:
  a float32 value times 1000 fits a double with no rounding, and
  ``x.5``-tie cases are unreachable because (2k+1)/2000 has no finite
  binary expansion), and from then on the whole algorithm is 64-bit
  integer arithmetic: squared distances are integer sums (associative —
  any partitioning gives the same bits), centroid updates are exact
  integer sums followed by one floor-division, and argmin ties break on
  the lowest cluster id. Two engines replaying this loop agree bit for
  bit, which is what lets the driver's DuckDB oracle verify a 2-iteration
  training run end to end.

* **Scale shape.** Per iteration: ONE map-side-combinable aggregate
  (k×d integer sums + a count, grouped by cluster — k·(d+1) cells cross
  the exchange, not vectors) and ONE driver collect of k rows. The
  assignment itself is a literal-matrix projection (zero shuffle, zero
  broadcast variable) using the same higher-order ``transform`` shape as
  ``ivf_assign`` — an unrolled k×d literal sum blows janino's 64KB
  codegen method limit at k·d ≈ 512 and drops the stage to interpreted
  execution (measured in round 4; see similarity.py:338 notes), so the
  matrix rides the plan as a constant-folded array-of-arrays instead.
  Driver state is O(k·d) integers per iteration — independent of corpus
  size, the same contract as MLlib's KMeans aggregator.

* **Init.** Deterministic hash-ordered seeding: the k vectors with the
  smallest ``md5(id)`` — a uniform random-without-replacement draw that
  both engines reproduce exactly (the repo-wide seeded-sampling idiom,
  operators/sampling.py).

Empty clusters keep their previous centroid (standard Lloyd's fallback,
deterministic).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F


def quantize_vec(vec_col: str | Column, scale: int = 1000) -> Column:
    """``array<long>`` milli-unit quantization of a float vector column.
    Exact and engine-agnostic: float→double widening is lossless, the
    ×scale product of a float32 is exact in a double, and HALF_UP rounding
    cannot hit a representable .5 tie for scale=10^k (no finite binary
    expansion), so Spark and DuckDB produce identical integers."""
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        col, lambda x: F.round(x.cast("double") * F.lit(scale)).cast("long")
    )


def kmeans_assign(
    ivec_col: str | Column, centroids: list[list[int]]
) -> Column:
    """Cluster id (int) for an integer-quantized vector against integer
    centroids: ``argmin_c Σ_i (v_i − c_i)²``, ties to the lowest cluster
    id (``array_position`` returns the FIRST minimum).

    The centroid matrix is a constant-folded literal array-of-arrays and
    the distance is a higher-order fold — one codegen'd map-side
    expression, no shuffle, no broadcast, valid at any corpus size (the
    driver ships k·d literals once inside the plan)."""
    col = F.col(ivec_col) if isinstance(ivec_col, str) else ivec_col
    cmat = F.array(
        *[F.array(*[F.lit(int(x)) for x in cent]) for cent in centroids]
    )
    dists = F.transform(
        cmat,
        lambda c: F.aggregate(
            F.zip_with(col, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _seed_centroids(base: DataFrame, k: int) -> list[list[int]]:
    """k hash-ordered seed vectors from the quantized base (__id, __iv)."""
    rows = (
        base.select("__iv", "__id")
        .orderBy(F.md5(F.col("__id").cast("string")), F.col("__id"))
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(
            f"kmeans_train: k={k} exceeds corpus size {len(rows)}"
        )
    return [[int(x) for x in r["__iv"]] for r in rows]


def kmeans_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
    scale: int = 1000,
) -> list[list[int]]:
    """Train integer-exact k-means; returns k integer-milli-unit centroids
    (feed ``centroids_float`` → ``unit_centroids_from_rows`` →
    ``ivf_index`` to complete the train→index→probe IVF lifecycle).

    ``iters`` Lloyd updates after hash-ordered seeding. Each update is one
    aggregate job: ``groupBy(cluster).agg(Σ v_i per dim, count)`` —
    map-side combined, k·(d+1) cells shuffled, k rows collected. Empty
    clusters carry their previous centroid.

    Driver-action shape (r11): the quantized base is materialized ONCE
    (``localCheckpoint``) and every training action — the seed collect
    plus one collect per iteration — reads the blocks. These are
    SEPARATE driver actions, the class runtime exchange reuse can never
    heal: the uncut form re-scanned and re-quantized the corpus
    ``iters``+1 times (MLlib's KMeans carries the same cache-your-input
    contract). The vector dimension rides the seed rows — the former
    standalone ``first()`` dimension probe was a whole extra corpus
    action."""
    base = df.select(
        F.col(id_col).alias("__id"), quantize_vec(vec_col, scale).alias("__iv")
    ).localCheckpoint()
    cents = _seed_centroids(base, k)
    dim = len(cents[0])
    for _ in range(iters):
        assigned = base.select(
            kmeans_assign("__iv", cents).alias("__cl"), "__iv"
        )
        sums = (
            assigned.groupBy("__cl")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                *[
                    F.sum(F.element_at("__iv", i + 1)).alias(f"__s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        new = list(cents)
        for r in sums:
            cl, n = r["__cl"], r["__n"]
            # floor(double-div) matches the oracle's FLOOR(s::DOUBLE/n)
            # bit for bit: |s| < 2^53 so the division is exact enough that
            # both engines floor the same double.
            new[cl] = [
                int(math.floor(float(r[f"__s{i}"]) / n)) for i in range(dim)
            ]
        cents = new
    return cents


def centroids_float(
    centroids: list[list[int]], scale: int = 1000
) -> list[list[float]]:
    """Integer milli-unit centroids back to float space (for ivf_index /
    unit_centroids_from_rows)."""
    return [[float(x) / scale for x in c] for c in centroids]


def kmeans_fit_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
    scale: int = 1000,
    out_col: str = "cluster",
) -> DataFrame:
    """Train + final assignment in one call: the corpus with ``out_col``
    added (the learned-quantizer analog of ``ivf_index``'s supplied-
    quantizer path)."""
    cents = kmeans_train(df, vec_col, id_col, k, iters, scale)
    return df.withColumn(
        out_col, kmeans_assign(quantize_vec(vec_col, scale), cents)
    )
