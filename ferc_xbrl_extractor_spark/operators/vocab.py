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


# ---------------------------------------------------------------------------
# G99: unigram-LM (SentencePiece-style) tokenizer — the complement to
# G31 BPE. Kudo 2018 ("Subword Regularization", ACL) trains a unigram
# language model over subword pieces by EM and segments with Viterbi;
# this is the tokenizer family most modern LLMs actually ship.
# Same verification class as G31: no SQL oracle (iterative float EM),
# pytest-pinned against an independent serial Python reference.
# ---------------------------------------------------------------------------


def _word_relation(df: DataFrame, text_col: str) -> DataFrame:
    """The Zipf-bounded (word, n) relation every tokenizer trainer here
    reduces the corpus to — one map-side-combinable aggregate."""
    return (
        df.select(F.explode_outer(tokens(text_col)).alias("word"))
        .filter(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _viterbi(word: str, logp: dict, max_len: int) -> list:
    """Best-scoring segmentation of ``word`` under piece log-probs —
    ties prefer the LONGER last piece (deterministic; float ties are
    rare but the spec must be total). Characters absent from the model
    become their own pieces at the configured OOV penalty so encoding
    never fails on unseen text."""
    m = len(word)
    best = [0.0] + [float("-inf")] * m
    back = [0] * (m + 1)
    for i in range(1, m + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j == 1:
                    lp = _OOV_LOGP  # unseen single char
                else:
                    continue
            s = best[j] + lp
            # strictly-greater keeps the SMALLEST j on ties == the
            # longest last piece (j scans ascending)
            if s > best[i]:
                best[i], back[i] = s, j
    out, i = [], m
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


_OOV_LOGP = -100.0  # unseen single characters at encode time


def unigram_learn(
    df: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    seed_size: int = 8000,
    rounds: int = 2,
    max_piece_len: int = 8,
    shrink: float = 0.75,
) -> DataFrame:
    """G99: train a unigram-LM subword vocabulary (Kudo 2018) — returns
    ``(piece, logprob, ecount)``: at most ``vocab_size`` rows unless
    the corpus character set alone exceeds it — single characters are
    force-kept so any corpus word remains segmentable.

    Algorithm (the SentencePiece recipe with its documented
    simplifications): seed with the ``seed_size`` highest-scoring
    substrings (score = freq·len, the suffix-array seed's ranking) plus
    all single characters; then ``rounds`` of full soft EM — E-step:
    forward-backward expected piece counts over every segmentation of
    every distinct word; M-step: relative-frequency re-estimate — each
    followed by a count-based prune to ``max(vocab_size, ⌈cur·shrink⌉)``
    (SentencePiece prunes by likelihood loss; count pruning is the
    standard cheap proxy and keeps the loop one aggregate per round).
    After the last round the survivors renormalize.

    Scale shape (the VERDICT-prescribed G31 shape): the corpus
    collapses ONCE into the distinct-word relation; every EM round is
    ONE Arrow-batched ``mapInPandas`` pass over that bounded relation
    emitting per-batch pre-aggregated (piece, ecount) partials, then a
    map-side-combinable sum whose result is |pieces|-bounded (the
    driver holds the model dict — a tokenizer vocabulary is
    driver-sized by definition, ≤ a few MB at 100k pieces). The corpus
    itself is touched exactly once, at the word reduction.
    """
    import math

    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if not 0 < shrink <= 1:
        raise ValueError(f"shrink must be in (0, 1], got {shrink}")
    words = _word_relation(df, text_col).localCheckpoint()

    # --- seed: top substrings by freq*len, plus all single chars
    subs = words.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(max_piece_len),
                                F.length("word") - i + 1,
                            ),
                        ),
                        lambda l: F.col("word").substr(i, l),
                    ),
                )
            )
        ).alias("piece"),
        F.col("n"),
    ).groupBy("piece").agg(
        F.sum(F.col("n") * F.length("piece")).alias("score")
    )
    chars = {
        r["piece"]: float(r["score"])
        for r in subs.filter(F.length("piece") == 1).collect()
    }
    top = subs.filter(F.length("piece") >= 2).orderBy(
        F.col("score").desc(), F.col("piece")
    ).limit(max(seed_size - len(chars), 0)).collect()
    scores = dict(chars)
    scores.update({r["piece"]: float(r["score"]) for r in top})
    total = sum(scores.values())
    logp = {p: math.log(s / total) for p, s in scores.items()}

    # --- EM rounds over the distinct-word relation
    ecounts: dict = {}
    for r in range(rounds):
        ecounts = _expected_counts(words, logp, max_piece_len)
        total_e = sum(ecounts.values())
        logp = {
            p: math.log(c / total_e) for p, c in ecounts.items() if c > 0
        }
        target = max(vocab_size, int(math.ceil(len(logp) * shrink)))
        if r == rounds - 1:
            target = vocab_size
        # prune: singles are never dropped; multi-char pieces keep the
        # top slots by (ecount desc, piece asc) — deterministic
        singles = {p for p in logp if len(p) == 1}
        multis = sorted(
            (p for p in logp if len(p) > 1),
            key=lambda p: (-ecounts[p], p),
        )
        keep = singles | set(multis[: max(target - len(singles), 0)])
        logp = {p: lp for p, lp in logp.items() if p in keep}
        # renormalize the survivors
        z = math.log(sum(math.exp(lp) for lp in sorted(logp.values())))
        logp = {p: lp - z for p, lp in logp.items()}

    spark = df.sparkSession
    rows = [
        (p, logp[p], float(ecounts.get(p, 0.0)))
        for p in sorted(logp, key=lambda p: (-logp[p], p))
    ]
    return spark.createDataFrame(
        rows, "piece string, logprob double, ecount double"
    )


def _expected_counts(words: DataFrame, logp: dict, max_len: int) -> dict:
    """One soft-EM E-step: forward-backward over every distinct word,
    expected piece counts weighted by word frequency. Per-batch partials
    pre-aggregate inside the UDF (the exchange carries |pieces|-bounded
    rows per batch, never per-word rows); the model dict rides the
    closure once per executor."""
    import numpy as np
    import pandas as _pd
    from typing import Iterator as _It

    def _estep(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            acc: dict = {}
            for word, n in zip(pdf["word"], pdf["n"]):
                m = len(word)
                alpha = np.full(m + 1, -np.inf)
                alpha[0] = 0.0
                beta = np.full(m + 1, -np.inf)
                beta[m] = 0.0
                spans = []
                for i in range(1, m + 1):
                    for j in range(max(0, i - max_len), i):
                        lp = logp.get(word[j:i])
                        if lp is not None:
                            spans.append((j, i, lp))
                            alpha[i] = np.logaddexp(
                                alpha[i], alpha[j] + lp
                            )
                for j, i, lp in reversed(spans):
                    beta[j] = np.logaddexp(beta[j], lp + beta[i])
                z = alpha[m]
                if not np.isfinite(z):
                    continue  # unsegmentable (cannot happen post-seed)
                for j, i, lp in spans:
                    e = float(np.exp(alpha[j] + lp + beta[i] - z)) * int(n)
                    piece = word[j:i]
                    acc[piece] = acc.get(piece, 0.0) + e
            yield _pd.DataFrame(
                {"piece": list(acc), "ecount": list(acc.values())}
            )

    rows = (
        words.mapInPandas(_estep, "piece string, ecount double")
        .groupBy("piece")
        .agg(F.sum("ecount").alias("ecount"))
        .collect()  # bounded: |pieces| rows
    )
    return {r["piece"]: float(r["ecount"]) for r in rows}


def unigram_segment_words(
    words: DataFrame, pieces: DataFrame
) -> DataFrame:
    """Viterbi-segment the distinct-word relation under a trained
    unigram model: ``(word, n) → (word, n, symbols)`` — the same
    contract :func:`bpe_learn` returns, so the encode path is shared.
    The documented per-word Python step (a variable-length DP has no
    vectorized Catalyst form); it runs over the Zipf-bounded word
    relation, never the corpus, as one Arrow-batched pass with the
    piece dict riding the closure."""
    plist = pieces.select("piece", "logprob").collect()
    logp = {r["piece"]: float(r["logprob"]) for r in plist}
    max_len = max((len(p) for p in logp), default=1)

    def _seg(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["symbols"] = [
                _viterbi(w, logp, max_len) for w in pdf["word"]
            ]
            yield pdf

    return words.mapInPandas(
        _seg, "word string, n long, symbols array<string>"
    )


def unigram_encode_documents(
    df: DataFrame,
    pieces: DataFrame,
    text_col: str = "text",
    out_col: str = "unigram_tokens",
    id_col: str | None = None,
) -> DataFrame:
    """Encode a corpus with a trained unigram model: reduce to the
    distinct-word relation, Viterbi-segment it (bounded), then reuse
    the G29/G31 broadcast word→pieces map probe — the corpus is
    scanned once and never exploded (map path) and OOV words fall back
    to character pieces, exactly the :func:`bpe_encode_documents`
    contract (including its join fallback past the broadcast ceiling
    via ``id_col``)."""
    words = _word_relation(df, text_col)
    segs = unigram_segment_words(words, pieces)
    return bpe_encode_documents(
        df, segs, text_col=text_col, out_col=out_col, id_col=id_col
    )
