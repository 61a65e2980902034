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


def decode_documents(
    df: DataFrame,
    vocab: DataFrame,
    ids_col: str = "token_ids",
    out_col: str = "decoded_text",
    unk_token: str = "<unk>",
) -> DataFrame:
    """Inverse of :func:`encode_documents`: rebuild whitespace-joined
    text from vocab ids (ids with no vocab entry → ``unk_token``) — the
    round-trip validator for encoded corpora (a doc of in-vocab tokens
    decodes byte-identically; see tests). Same scan shape as encode:
    the id→token map rides as ONE broadcast row, the probe is a
    codegen'd ``transform``, the corpus is never exploded or shuffled.
    """
    vmap = vocab.agg(
        F.map_from_entries(
            F.collect_list(F.struct("token_id", "token"))
        ).alias("__rmap")
    )
    joined = df.crossJoin(F.broadcast(vmap))
    toks = F.transform(
        ids_col,
        lambda i: F.coalesce(F.col("__rmap")[i], F.lit(unk_token)),
    )
    return joined.select(
        *[c for c in df.columns if c != out_col],
        F.array_join(toks, " ").alias(out_col),
    )


def _merge_pair(sym_col, a: "Column", b: "Column"):
    """Greedy left-to-right merge of adjacent (a, b) symbol pairs inside
    one symbol array — a single ``aggregate`` fold: append each symbol
    unless the accumulator's tail is ``a`` and the symbol is ``b``, in
    which case replace the tail with the merged symbol. Matches
    reference BPE's non-overlapping left-to-right merge order (after a
    merge the new tail is the merged symbol, so an overlapping second
    merge can't fire)."""
    merged = F.concat(a, b)
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_learn(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Distributed BPE tokenizer training (Sennrich et al. 2016,
    word-level variant): learn ``num_merges`` merge rules from corpus
    statistics, entirely as DataFrame aggregations.

    Scale shape — the classic reduction trick: the corpus collapses ONCE
    into the distinct-word relation ``(word, n)`` (one map-side-combinable
    aggregate; |distinct words| ≪ |tokens| by Zipf), and every BPE round
    then runs on that bounded relation only:

      explode adjacent symbol pairs weighted by word count
      → one pair-count aggregate (map-side partial combine)
      → argmax via orderBy(count desc, pair asc).limit(1)   (tiny)
      → apply the merge to each word's symbol array with one codegen'd
        fold (no Python), ``localCheckpoint`` to cut the per-round
        lineage exactly like G2b's propagation loop.

    Rounds are inherently sequential (each merge changes the next round's
    pair statistics) — the per-round cost is what distributes. Returns
    ``(merges, words)``: the ordered merge rules and the final
    ``(word, n, symbols)`` relation (feed to ``bpe_encode_documents``). Stops early when no pair reaches
    ``min_pair_count``.
    """
    words = (
        df.select(F.explode_outer(tokens(text_col)).alias("word"))
        .filter(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "symbols",
            F.filter(F.split(F.col("word"), ""), lambda c: F.length(c) > 0),
        )
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = words.select(
            F.col("n"),
            F.explode(
                F.when(
                    F.size("symbols") >= 2,
                    F.zip_with(
                        F.slice("symbols", 1, F.size("symbols") - 1),
                        F.slice("symbols", 2, F.size("symbols") - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("p.a"), F.col("p.b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_pair_count:
            break
        a, b = best[0]["p"]["a"], best[0]["p"]["b"]
        merges.append((a, b))
        words = words.withColumn(
            "symbols", _merge_pair(F.col("symbols"), F.lit(a), F.lit(b))
        ).localCheckpoint()
    return merges, words


def bpe_encode_documents(
    df: DataFrame,
    words: DataFrame,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    id_col: str | None = None,
    max_broadcast_words: int = 2_000_000,
) -> DataFrame:
    """Apply a learned BPE segmentation to a corpus: the (word → symbol
    sequence) table folds into ONE map row broadcast via cross join (the
    G29 shape), and each document's tokens expand through a ``transform``
    + ``flatten`` probe — scan-side, no explode of the corpus, no
    shuffle. Out-of-vocabulary words fall back to character symbols
    computed inline (the same split the trainer starts from).

    The word→symbols table holds EVERY distinct corpus word, which on a
    web-scale corpus is tens of millions of entries — past what a single
    broadcast row can hold. When ``words`` exceeds ``max_broadcast_words``
    the probe switches to the join fallback: posexplode the corpus
    tokens, hash-join against ``words`` on the word (AQE broadcasts it if
    it fits, shuffles otherwise), and reassemble per document in token
    order. The fallback needs a unique per-row key — pass ``id_col``;
    without one the guard raises rather than risk merging distinct rows.
    """
    # bounded probe: limit(k+1).count() early-exits the scan at k+1 rows
    # instead of materializing the full words lineage (for bpe_learn
    # output that is the whole iterative merge history) twice per call
    n_words = words.limit(max_broadcast_words + 1).count()
    if n_words > max_broadcast_words:
        if id_col is None:
            raise ValueError(
                f"bpe_encode_documents: >{max_broadcast_words} distinct "
                "words exceeds max_broadcast_words; the join fallback "
                "reassembles per document and needs id_col"
            )
        return _bpe_encode_via_join(df, words, text_col, out_col, id_col)
    wmap = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word", "symbols"))
        ).alias("__wmap")
    )
    toked = df.select("*", tokens(text_col).alias("__toks")).crossJoin(
        F.broadcast(wmap)
    )
    seqs = F.transform(
        "__toks",
        lambda w: F.coalesce(
            F.col("__wmap")[w],
            F.filter(F.split(w, ""), lambda c: F.length(c) > 0),
        ),
    )
    return toked.select(*df.columns, F.flatten(seqs).alias(out_col))


def _bpe_encode_via_join(
    df: DataFrame,
    words: DataFrame,
    text_col: str,
    out_col: str,
    id_col: str,
) -> DataFrame:
    """Join-fallback BPE encode for unbounded-vocabulary corpora: the
    corpus posexplodes to (id, pos, word), left-joins ``words`` (OOV rows
    fall back to inline character split), and reassembles each document
    with ``sort_array(collect_list(struct(pos, syms)))`` — order restored
    by the struct's leading pos field, one doc-keyed exchange. ``words``
    is never collected driver-side; Spark picks broadcast vs shuffle join
    from its actual size."""
    toked = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("__pos", "__w")
    )
    joined = toked.join(
        words.select(F.col("word").alias("__w"), "symbols"), "__w", "left"
    ).select(
        id_col,
        "__pos",
        F.coalesce(
            F.col("symbols"),
            F.filter(F.split("__w", ""), lambda c: F.length(c) > 0),
        ).alias("__syms"),
    )
    per_doc = joined.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("__pos", "__syms"))
                ),
                lambda s: s["__syms"],
            )
        ).alias(out_col)
    )
    # Empty/token-less documents never reach the explode; restore them
    # with an empty encoding so row counts match the map-probe path.
    return df.join(per_doc, id_col, "left").select(
        *df.columns,
        F.coalesce(
            F.col(out_col), F.array().cast("array<string>")
        ).alias(out_col),
    )


def coverage_report(
    df: DataFrame,
    text_col: str = "text",
    vocab_sizes: list[int] = (100, 1_000, 10_000, 50_000),
    min_count: int = 1,
) -> DataFrame:
    """Token-coverage curve for vocabulary sizing: for each candidate V,
    the fraction of ALL corpus token occurrences covered by the V most
    frequent tokens (the number that decides vocab_size / OOV budget
    before committing a tokenizer).

    Scale shape: reuses build_vocab's explode→count aggregate (the
    exchange carries |distinct tokens|), then a cumulative sum over the
    frequency-ranked counts. The running window IS a single partition by
    construction — but over the DISTINCT-TOKEN relation (Zipf-bounded,
    millions at web scale, not corpus-sized), and only the top
    max(vocab_sizes) rows of it survive the limit before the window runs.
    Returns (vocab_size, covered_tokens, total_tokens, coverage).
    """
    vmax = max(vocab_sizes)
    counts = (
        df.select(F.explode_outer(tokens(text_col)).alias("token"))
        .filter(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
    total = counts.agg(F.sum("n").alias("__total"))
    topv = counts.orderBy(F.col("n").desc(), F.col("token")).limit(vmax)
    w = Window.orderBy(F.col("n").desc(), F.col("token")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = topv.select(
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), F.col("token")))
        .alias("__rank"),
        F.sum("n").over(w).alias("__cum"),
    )
    sizes = F.array(*[F.lit(int(v)) for v in sorted(set(vocab_sizes))])
    # per size V: the cumulative count at rank min(V, |ranked|)
    per_size = (
        ranked.crossJoin(total)
        .select(
            F.explode(sizes).alias("vocab_size"),
            "__rank",
            "__cum",
            "__total",
        )
        .filter(F.col("__rank") <= F.col("vocab_size"))
        .groupBy("vocab_size")
        .agg(
            F.max("__cum").alias("covered_tokens"),
            F.max("__total").alias("total_tokens"),
        )
        .select(
            "vocab_size",
            F.col("covered_tokens").cast("long").alias("covered_tokens"),
            F.col("total_tokens").cast("long").alias("total_tokens"),
            F.round(
                F.col("covered_tokens") / F.col("total_tokens").cast("double"),
                6,
            ).alias("coverage"),
        )
    )
    return per_size
