"""Deduplication operators (SURVEY.md §2.4 A2/A3, §2.12 G1).

``fuzzy_dedup`` is the reference's one custom UDAF
(/root/reference/src/ferc_xbrl_extractor/datapackage.py:548-575), here
re-expressed as a single Catalyst aggregation — no Python in the loop,
so it rides codegen and scales with the shuffle, not with Python
throughput. The aggregate reuses whatever clustering the plan already
has (see operators.fact_table's single-shuffle budget). Input should be
exact-deduped on ``keys + [value_col]`` first (A2 before A3, like the
reference).

Reference semantics (pinned by tests/unit/datapackage_test.py:139-192):
a key group with >1 distinct value resolves to the value that is *uniquely
most precise*: the single value not equal to its rounding at the smallest
probe precision p in 0..5. Groups that never isolate exactly one value
(string conflicts, precision ties, all-integers) raise a ValueError in the
reference; at cluster scale a task failure is the wrong tool, so the
default here is a quarantine channel — conflicted keys are routed to an
``errors`` DataFrame and strict mode turns them into a driver-side raise.

Two deliberate refinements over the reference (per round-1 advice):
- ``numeric_predicate`` restricts precision-resolution to groups whose
  declared column type is numeric — the reference applies float probing to
  any value that happens to parse, silently "resolving" string-typed
  conflicts it should raise on.
- callers should normalize values per declared type *before* dedup (the
  reference converts via CONVERT_DTYPES before drop_duplicates,
  datapackage.py:430-437) — ``operators.fact_table`` does this so '1.0'
  vs '1.00' are exact duplicates, not precision ties.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_digest(df: DataFrame, cols: list[str], salt: int) -> Column:
    """128-bit row digest as two independent 64-bit xxhash64 folds.

    Spark's hash functions SKIP null inputs (a null contributes nothing to
    the running seed), so ``xxhash64('a', NULL)`` == ``xxhash64(NULL,
    'a')`` — interleaving an ``isNull`` boolean after every column makes
    null *positions* part of the hashed sequence and restores injectivity
    up to genuine hash collisions. Two salted folds give 128 bits:
    collision odds for n rows are ~n^2/2^129 (~1e-15 at a trillion rows),
    documented as the exactness boundary of the digest path."""
    parts: list[Column] = [F.lit(salt)]
    for c in cols:
        parts.append(F.col(c))
        parts.append(F.col(c).isNull())
    return F.xxhash64(*parts)


def dedup_exact(
    df: DataFrame, keys: list[str] | None = None, digest: bool = False
) -> DataFrame:
    """A2/G1: exact duplicate elimination. With ``keys=None`` the whole row
    is the key (reference ``drop_duplicates()``, datapackage.py:437).

    ``digest=True`` (whole-row mode only) groups on a 128-bit row digest
    instead of the full column tuple: the aggregate hashmap probes compare
    two longs instead of N variable-length strings, and the row payload
    rides as an ``any_value`` struct (all rows in a digest group are
    identical, so any is exact). Measured ~2x on wide-string relations
    (r4: the 3.7M-row distinct was the largest same-work gap vs DuckDB);
    exact up to 2^-129-scale digest collisions — see ``_row_digest``."""
    if keys:
        return df.dropDuplicates(keys)
    if not digest:
        return df.dropDuplicates()
    cols = df.columns
    h1 = _row_digest(df, cols, 0x9E3779B9)
    h2 = _row_digest(df, cols, 0x85EBCA6B)
    agged = (
        df.withColumn("__h1", h1)
        .withColumn("__h2", h2)
        .groupBy("__h1", "__h2")
        .agg(F.any_value(F.struct(*[F.col(c) for c in cols])).alias("__row"))
    )
    return agged.select(*[F.col(f"__row.{c}").alias(c) for c in cols])


def write_digest_bucketed(
    df: DataFrame, table: str, num_buckets: int = 64
) -> None:
    """Layout investment for repeated exact dedup: persist the relation
    with its 128-bit row digest as two bucket columns (``__h1``, ``__h2``),
    bucketed + sorted on them.

    A distributed distinct must normally pay one keyed exchange — the r4/r5
    benches measured that exchange as the whole residual gap vs an
    in-process engine. Bucketing moves the exchange into this one-time
    write: every later :func:`dedup_exact_bucketed` groups on the bucket
    columns and the scan itself reports the hash distribution, so the
    dedup plan contains ZERO Exchange nodes (pinned in
    tests/test_plans.py). The same layout co-locates any other
    digest-keyed operation (anti-join against a tombstone set, incremental
    append dedup) — the standard bucketed-table trade at 100 TB: pay the
    shuffle once at ingest, never at query time."""
    cols = df.columns
    with_digest = df.withColumn(
        "__h1", _row_digest(df, cols, 0x9E3779B9)
    ).withColumn("__h2", _row_digest(df, cols, 0x85EBCA6B))
    (
        with_digest.write.mode("overwrite")
        .bucketBy(num_buckets, "__h1", "__h2")
        .sortBy("__h1", "__h2")
        .saveAsTable(table)
    )


def dedup_exact_bucketed(spark, table: str) -> DataFrame:
    """A2 over a :func:`write_digest_bucketed` layout: exchange-free exact
    distinct. Groups on the bucket columns (the scan already satisfies the
    clustering), payload rides as ``any_value`` — identical semantics to
    ``dedup_exact(digest=True)``, minus its shuffle."""
    t = spark.table(table)
    cols = [c for c in t.columns if c not in ("__h1", "__h2")]
    agged = t.groupBy("__h1", "__h2").agg(
        F.any_value(F.struct(*[F.col(c) for c in cols])).alias("__row")
    )
    return agged.select(*[F.col(f"__row.{c}").alias(c) for c in cols])


def dedup_exact_keep(
    df: DataFrame, keys: list[str], order_by: list, keep: str = "first"
) -> DataFrame:
    """G1 with deterministic survivor selection: keep the first/last row per
    key under an explicit ordering.

    Formulated as ONE hash aggregate — ``min_by(struct(<all columns>),
    struct(order_by))`` (``max_by`` for ``keep='last'``); struct comparison
    is lexicographic, so the struct of ordering columns reproduces the
    multi-column sort order without sorting. Versus the row_number-window
    form this drops the full per-partition sort AND gets map-side partial
    aggregation: each map task forwards one candidate row per key, so the
    shuffle carries |distinct keys| rows instead of |rows| — the difference
    between a bounded and unbounded shuffle at 100 TB.
    """
    pick = F.min_by if keep == "first" else F.max_by
    payload = F.struct(*[F.col(c) for c in df.columns if c not in keys])
    agged = df.groupBy(*keys).agg(
        pick(payload, F.struct(*order_by)).alias("__row")
    )
    # Project the survivor back to the input column order, taking the key
    # columns from the aggregate's own grouping attributes — NOT from the
    # struct. Struct-field extraction mints fresh attribute ids, which
    # erases the plan's output partitioning/ordering and forces any
    # downstream keyed operator to re-shuffle; grouping attributes keep it.
    return agged.select(
        *[
            F.col(c) if c in keys else F.col(f"__row.{c}").alias(c)
            for c in df.columns
        ]
    )


def _ndigits_sql(col_sql: str, max_precision: int = 6) -> str:
    """Decimal-digit count of a double as ONE flat SQL CASE, probed like the
    reference's loop: smallest p with round(v, p) == v, else
    max_precision + 1. Built as a SQL string (a single parse) rather than a
    chain of Column calls — the nested-when construction costs a Py4J round
    trip per probe and measurably inflates plan-build time on the driver."""
    probes = " ".join(
        f"WHEN round({col_sql}, {p}) = {col_sql} THEN {p}"
        for p in range(max_precision + 1)
    )
    return f"CASE {probes} ELSE {max_precision + 1} END"


def _ndigits(col, max_precision: int = 6):
    """Column-expression form of ``_ndigits_sql`` for callers holding a
    Column; used by tests."""
    expr = F.lit(max_precision + 1)
    for p in range(max_precision, -1, -1):
        expr = F.when(F.round(col, p) == col, F.lit(p)).otherwise(expr)
    return expr


@dataclass
class FuzzyDedupResult:
    resolved: DataFrame  # one row per key: original columns, winning value
    errors: DataFrame  # conflicted keys + collected values


def fuzzy_dedup(
    df: DataFrame,
    keys: list[str],
    value_col: str = "value",
    max_precision: int = 6,
    numeric_predicate: Column | None = None,
) -> FuzzyDedupResult:
    """A3: resolve near-duplicate numeric facts to the uniquely-most-precise
    value; non-resolvable groups go to ``errors``.

    Single-aggregate, narrow-buffer formulation: ONE pass per group
    computes everything from SIX aggregate buffers —

    - ``bit_or(shiftleft(1, nd))``: the set of precision buckets present,
      as one long. ``nd`` has the tiny domain 0..max_precision+1, so the
      group's highest precision, its runner-up, and "is there a second
      bucket" are all post-aggregation bit arithmetic on this mask.
    - ``max_by(value, struct(nd, value))`` vs
      ``min_by(value, struct(-nd, value))``: the largest and smallest
      value *within the highest-precision bucket* (both key structs sort
      that bucket first), so "exactly one distinct value at max precision"
      is an equality test — no per-bucket min/max pairs.
    - ``min(parses-as-number)``, ``min(allow)``: group gates.
    - ``max_by(struct(row), struct(nd, num, value))``: the winner row.

    The previous formulation carried 2×(max_precision+2) per-precision
    string min/max buffers (~20 aggregates); the wide SortAggregate rows
    regressed the composed fact pipeline ~50% at sf0.1. This keeps the
    same single keyed shuffle (reusing an existing clustering on any
    prefix of ``keys``) and the same one grouping-key sort, with a buffer
    row ~3× narrower.

    Distinctness is tested with min==max within the top bucket and a
    presence *bitmask* (never counts), so the aggregate is
    multiplicity-insensitive: exact duplicates of ``(keys, value)``
    collapse for free and a separate A2 pass is NOT required for
    correctness (construct_table drops a full-relation HashAggregate on
    the strength of this). On exact-deduped input the semantics are
    bit-identical to the reference's post-drop_duplicates resolve.

    ``numeric_predicate``: column expression true for rows whose *declared*
    type is numeric (e.g. ``F.col("name").isin(numeric_names)``); precision
    resolution only applies to those groups. Default: all groups.

    The ``errors`` channel is a separate consumer (semi-join of conflicted
    keys back onto the input, then ``collect_set``): conflicts are the
    cold path, and keeping collection out of the hot aggregate keeps the
    resolved plan free of ObjectHashAggregate.
    """
    allow_numeric = (
        numeric_predicate if numeric_predicate is not None else F.lit(True)
    )
    overflow = max_precision + 1  # nd for "rounds exactly nowhere" + strings
    # Compute the parsed double and its digit count ONCE in a projection —
    # ``_ndigits`` is a 7-deep CASE of round() probes, and referencing the
    # raw expression from every bucket aggregate would re-evaluate it per
    # aggregate per row (measured 1.4× slower on the fact pipeline).
    num_sql = f"try_cast(`{value_col}` as double)"
    staged = df.select(
        "*",
        F.expr(num_sql).alias("__num"),
        F.expr(_ndigits_sql(num_sql, max_precision)).alias("__nd"),
        allow_numeric.alias("__allow"),
    )
    num, nd, value = F.col("__num"), F.col("__nd"), F.col(value_col)

    stats = staged.groupBy(*keys).agg(
        F.min(num.isNotNull()).alias("__all_num"),
        F.min(F.col("__allow")).alias("__allow_all"),
        F.bit_or(F.expr("shiftleft(1L, __nd)")).alias("__ndmask"),
        F.max_by(value, F.struct(nd, value)).alias("__hi_max"),
        F.min_by(value, F.struct((-nd).alias("neg_nd"), value)).alias("__hi_min"),
        F.max_by(
            F.struct(*[F.col(c) for c in df.columns if c not in keys]),
            F.struct(nd, num, value),
        ).alias("__row"),
    )

    # Post-aggregation bit arithmetic (one codegen'd projection, built as
    # one SQL parse). The mask is nonzero by construction (every row sets
    # a bit), its highest set bit is the group's max precision, and
    # clearing that bit leaves the runner-up buckets. Resolvability
    # (reference datapackage.py:563-572): a p in 0..max_precision-1 must
    # isolate exactly one value with round(v,p) != v ⇔ the top bucket
    # holds one distinct value AND a runner-up bucket exists at precision
    # ≤ max_precision-1 (no second bucket ⇒ either a single value, the
    # first disjunct, or an unresolvable tie).
    hi_bit_sql = "CASE " + " ".join(
        f"WHEN (__ndmask & {1 << p}) != 0 THEN {1 << p}"
        for p in range(overflow, 0, -1)
    ) + " ELSE 1 END"
    stats = stats.withColumn("__low", F.expr(f"__ndmask - ({hi_bit_sql})"))
    resolvable = F.expr(
        "(__hi_max = __hi_min) AND (__low = 0 OR "
        f"(__allow_all AND __all_num AND __low < {1 << max_precision}))"
    )

    # Key columns come from the grouping attributes (preserves the output
    # partitioning/ordering for downstream prefix-keyed operators — see
    # dedup_exact_keep); only non-key columns come out of the struct.
    winners = stats.filter(resolvable).select(
        *[
            F.col(c) if c in keys else F.col(f"__row.{c}").alias(c)
            for c in df.columns
        ]
    )
    conflicted = stats.filter(~resolvable).select(*keys)
    errors = (
        df.join(conflicted, keys, "left_semi")
        .groupBy(*keys)
        .agg(F.sort_array(F.collect_set(value_col)).alias("values"))
    )
    return FuzzyDedupResult(resolved=winners, errors=errors)


def fuzzy_dedup_strict(
    df: DataFrame, keys: list[str], value_col: str = "value"
) -> DataFrame:
    """Reference-exact error semantics: raise on the first conflicted group
    (E2). Prefer the quarantine channel for large runs."""
    result = fuzzy_dedup(df, keys, value_col)
    bad = result.errors.limit(1).collect()
    if bad:
        row = bad[0]
        key_repr = ":".join(str(row[k]) for k in keys)
        raise ValueError(f"Fact {key_repr} has values {row['values']}")
    return result.resolved
