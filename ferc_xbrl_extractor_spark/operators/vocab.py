"""Vocabulary build + integer token encoding (G29) — the bridge between
corpus curation (G16) and sequence packing (G17): turn curated text into
the bounded-id integer streams a trainer consumes.

Two stages, each with an explicit scale shape:

- **build_vocab** — one explode → count aggregate (map-side partial
  combine; the exchange carries |distinct tokens|, not |tokens|), then
  global top-V via ``orderBy().limit(V)`` — Spark compiles that to
  ``TakeOrderedAndProject`` (per-partition heaps, no full sort). Id
  assignment is a ``row_number`` over the V survivors only: a
  single-partition window bounded by ``vocab_size``, never by the corpus.

- **encode_documents** — the vocab is folded into ONE row holding a
  ``map<token,id>`` and broadcast through a 1-row cross join (the same
  shape ``text.bm25_scores`` uses for corpus stats); encoding is then a
  per-row ``transform`` + ``element_at`` map probe, fully codegen'd.
  The corpus is never exploded, never shuffled by token, and never
  re-grouped by document — encode cost is a scan. A 100k-entry vocab is
  a few MB: trivially broadcastable; at millions of entries switch the
  probe to a broadcast hash join over posexploded tokens (one doc-keyed
  reassembly shuffle) — the map form is strictly better below that.

Ids are 1..V ordered by (count desc, token asc) — deterministic, total
(token is unique) — with 0 reserved for OOV/UNK, the convention id-based
trainers expect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50000,
    min_count: int = 1,
) -> DataFrame:
    """(token, token_id, n): the ``vocab_size`` most frequent corpus
    tokens, id 1..V by (count desc, token asc)."""
    counts = (
        df.select(F.explode_outer(tokens(text_col)).alias("token"))
        .filter(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
    topv = counts.orderBy(F.col("n").desc(), F.col("token")).limit(vocab_size)
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return topv.select(
        "token", F.row_number().over(w).cast("int").alias("token_id"), "n"
    )


def encode_documents(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    unk_id: int = 0,
    out_col: str = "token_ids",
) -> DataFrame:
    """Add ``out_col``: the document's whitespace tokens as vocab ids
    (OOV → ``unk_id``). Scan-shaped — see module docstring."""
    vmap = vocab.agg(
        F.map_from_entries(
            F.collect_list(F.struct("token", "token_id"))
        ).alias("__vmap")
    )
    toked = df.select("*", tokens(text_col).alias("__toks")).crossJoin(
        F.broadcast(vmap)
    )
    # Map probe via __getitem__ (UnresolvedExtractValue), which accepts a
    # column key — ``element_at`` requires a literal in older API shapes.
    ids = F.transform(
        "__toks",
        lambda t: F.coalesce(
            F.col("__vmap")[t], F.lit(int(unk_id)).cast("int")
        ),
    )
    return toked.select(*df.columns, ids.alias(out_col))
