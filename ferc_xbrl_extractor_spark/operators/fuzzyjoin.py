"""G22: fuzzy string matching (edit-distance join) without a cross join.

The naive formulation — ``left JOIN right ON levenshtein(a, b) <= d`` — is
a cartesian product: |L|x|R| distance evaluations, hopeless at corpus
scale. This module blocks with *deletion neighborhoods* (the SymSpell
scheme): if ``lev(a, b) <= d`` then the sets of strings reachable from
``a`` and ``b`` by at most ``d`` single-character deletions intersect, so
joining on a shared deletion signature has PERFECT recall — the blocked
join is exactly equal to the naive one after a final ``levenshtein``
verification of candidates. The shuffle is keyed by signature; no pair of
strings that cannot match is ever co-located.

Cost model at 100 TB: each side explodes to O(rows * len^d) signature
rows (len+1 signatures at d=1) — a keyed equi-join over that relation,
with candidate verification only on bucket collisions. All expressions
are Catalyst (``transform``/``sequence``/``substring``/``levenshtein``);
no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _deletions(col: Column) -> Column:
    """Array of all strings formed by deleting exactly one character."""
    n = F.length(col)
    dels = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(
            col.substr(F.lit(1), i - 1),
            col.substr(i + 1, n),
        ),
    )
    # sequence(1, 0) would flip to a DESCENDING [1, 0] sequence — guard the
    # empty string explicitly.
    return F.when(n >= 1, dels).otherwise(F.array().cast("array<string>"))


def deletion_signatures(col: Column, max_dist: int = 1) -> Column:
    """Distinct deletion-neighborhood signatures of ``col`` up to
    ``max_dist`` deletions (the string itself included)."""
    if max_dist < 1 or max_dist > 2:
        raise ValueError("max_dist must be 1 or 2")
    frontier = _deletions(col)
    sigs = F.concat(F.array(col), frontier)
    if max_dist == 2:
        second = F.flatten(F.transform(frontier, _deletions))
        sigs = F.concat(sigs, second)
    return F.array_distinct(sigs)


def fuzzy_string_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All (left row, right row) pairs with ``levenshtein <= max_dist``,
    computed as signature-explode -> keyed equi-join -> distinct
    candidates -> levenshtein verify. Equal to the naive theta join by the
    SymSpell deletion-neighborhood theorem; never evaluates a distance on
    a pair that shares no signature.

    Returns left's columns + right's columns + ``distance``. Column names
    must not collide (pre-alias if they do).

    Row identity is the tuple of carried columns: the candidate dedup
    (one pair can collide on many signatures) is a ``distinct`` over
    them, so two INPUT rows that are entirely identical collapse to one.
    Carry a unique id column on each side to preserve input multiplicity
    — with ids present the result is exactly the naive theta join.
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"colliding columns: {sorted(overlap)}")
    lsig = left.withColumn(
        "__sig", F.explode(deletion_signatures(F.col(left_col), max_dist))
    )
    rsig = right.withColumn(
        "__sig", F.explode(deletion_signatures(F.col(right_col), max_dist))
    )
    # A candidate pair may collide on many signatures; dedup on the pair's
    # natural identity (all carried columns) before the verify expression.
    cand = lsig.join(rsig, "__sig").drop("__sig").distinct()
    dist = F.levenshtein(F.col(left_col), F.col(right_col))
    return cand.withColumn("distance", dist).filter(
        F.col("distance") <= max_dist
    )
