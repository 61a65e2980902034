"""End-to-end training-epoch construction (G41): mixture repetition →
deterministic global shuffle → sequence packing → (optionally) shard
text materialization, as ONE composed declarative plan.

This is the capstone the G-series training operators exist for: given a
curated corpus and a mixture spec ("2.5 epochs of src0, 0.4 of src1,
1.0 elsewhere"), produce the exact (document copy → training sequence)
layout a trainer consumes — reproducible bit-for-bit from
``(corpus, rates, salt)`` on any engine and any partitioning, because
every stage below is already integer-deterministic:

1. ``sampling.repeat_by_rate`` — fractional-epoch copy counts from
   integer 60-bit thresholds (map-side generate, zero shuffle).
2. ``sampling.shuffle_order`` over the composite ``(id, copy)`` key —
   each copy gets its own position in the md5 total order, so a
   document's epochs interleave through the stream instead of training
   back-to-back (ordered-block two-phase rank; no global sort).
3. ``packing.pack_sequences`` on that position — two-phase block prefix
   sum turns token counts into stream offsets and sequence ids.
4. ``packing.materialize_sequences`` (opt-in) — per-sequence shard rows.

Scale shape: the composition adds NO driver materialization beyond its
stages' own tiny collects (block count relations); stages 1-2-3 chain
map-side generate → one bounded keyed rank exchange → one bounded keyed
window + broadcast joins. No reference counterpart
(catalyst-cooperative/ferc-xbrl-extractor is an XBRL ETL); SURVEY.md
§2.12 G41.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferc_xbrl_extractor_spark.operators import packing, sampling
from ferc_xbrl_extractor_spark.operators.text import tokens


def build_epoch(
    df: DataFrame,
    rates: dict[str, float] | None = None,
    key_col: str = "source",
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    salt: str = "",
    budget: int = 2048,
    by: str | None = None,
    prefix_len: int = 2,
    block_size: int = 100_000,
    materialize: bool = False,
) -> DataFrame:
    """Build one training epoch's packed layout.

    Args:
        rates: mixture spec ``{stratum: epochs}`` over ``key_col``
            (``repeat_by_rate`` semantics: floor + Bernoulli fraction;
            values may span both sides of 1.0). None = every row once.
        token_col: precomputed per-document token count; None derives
            whitespace-token counts from ``text_col`` in the projection.
        salt: redraws BOTH the copy-count Bernoulli and the shuffle
            order (suffixed independently, so the two draws are not
            correlated through the shared id).
        budget / by / block_size: forwarded to ``pack_sequences``.
        materialize: True returns per-sequence shard rows
            (``materialize_sequences``); False (default) returns the
            per-document-copy assignment — input columns plus
            ``epoch_copy``, ``shuffle_pos``, ``tok_offset``, ``seq_id``,
            ``n_seqs``.
    """
    rep = (
        sampling.repeat_by_rate(
            df,
            key_col=key_col,
            rates=rates,
            default_rate=default_rate,
            id_col=id_col,
            salt=salt + "#rep",
        )
        if rates is not None
        else df.withColumn("epoch_copy", F.lit(0).cast("long"))
    )
    eid = F.concat(
        F.col(id_col).cast("string"), F.lit("#"), F.col("epoch_copy")
    )
    n_tok = (
        F.col(token_col).cast("long")
        if token_col
        else F.size(tokens(text_col)).cast("long")
    )
    staged = rep.select("*", eid.alias("__eid"), n_tok.alias("__ntok"))
    ordered = sampling.shuffle_order(
        staged, id_col="__eid", salt=salt + "#ord", prefix_len=prefix_len
    )
    packed = packing.pack_sequences(
        ordered,
        order_col="shuffle_pos",
        token_col="__ntok",
        budget=budget,
        by=by,
        block_size=block_size,
    ).drop("__eid", "__ntok")
    if materialize:
        return packing.materialize_sequences(
            packed, text_col=text_col, by=by
        )
    return packed


def mixture_rates(
    df: DataFrame,
    budget: int,
    weights: dict[str, int],
    key_col: str = "source",
    text_col: str = "text",
    token_col: str | None = None,
    default_weight: int = 1,
) -> dict[str, float]:
    """G73 → G41 bridge: turn a target weight mixture + token budget into
    the per-stratum ``rates`` dict :func:`build_epoch` consumes.

    Measures each stratum's token supply from the corpus (ONE map-side-
    combinable aggregate), water-fills the budget across strata with
    :func:`~ferc_xbrl_extractor_spark.operators.sampling.mixture_allocation`
    (integer-exact, supply-capped, remainder re-flowed), and returns
    ``{stratum: allocated/avail}`` — sampling rates in [0, 1], supply-
    feasible by construction. A stratum missing from ``weights`` gets
    ``default_weight``; weight 0 excludes it (rate 0.0); NULL strata
    are not in the returned dict and fall to ``build_epoch``'s
    ``default_rate`` (same as the plain ``--rates`` path).

    The collect is bounded by the stratum cardinality — this is a
    mixture over epoch strata (sources / languages / domains-as-buckets),
    the same |strata|-row class as ``repeat_by_rate``'s rate dict, not
    the raw |domains| crawl relation. Rates above 1.0 (true multi-epoch
    upsampling) are a TRAINING choice, not a supply computation — pass
    those through ``build_epoch(rates=...)`` directly.
    """
    from ferc_xbrl_extractor_spark.operators.sampling import (
        mixture_allocation,
    )

    n_tok = (
        F.col(token_col).cast("long")
        if token_col
        else F.size(tokens(text_col)).cast("long")
    )
    # NULL strata can't be addressed by a weights dict (and a None dict
    # key breaks every consumer that sorts/filters the strata) — they
    # fall through to build_epoch's default_rate, like the --rates path
    avail = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("domain"))
        .agg(F.sum(n_tok).alias("avail_tokens"))
    )
    wt = F.lit(default_weight)
    for k, v in sorted(weights.items()):
        wt = F.when(F.col("domain") == k, F.lit(int(v))).otherwise(wt)
    alloc = mixture_allocation(
        avail.withColumn("weight", wt.cast("long")), budget=budget
    )
    return {
        r["domain"]: (float(r["rate"]) if r["rate"] is not None else 0.0)
        for r in alloc.collect()  # bounded: one row per stratum
    }
