"""Near-duplicate detection at corpus scale (G2): n-gram Jaccard,
MinHash + LSH, and SimHash.

Design for 100 TB:

- **Never all-pairs.** Candidate generation is always an equi-join on a
  bucket key (a shared shingle, an LSH band hash, or a SimHash prefix), so
  the shuffle is keyed and AQE can split skewed buckets. The only O(n²)
  work is *within* a bucket, and hot buckets are capped
  (``max_shingle_df``).
- **Portable hashing.** MinHash permutations are
  ``min(md5(i || ':' || shingle))`` — md5 hex strings compare
  lexicographically the same in every engine, so the DuckDB oracle can
  reproduce signatures *exactly*, making this one of the few LSH
  implementations with an exact cross-engine correctness check.
- **No Python in the loop.** Shingling, signatures, and band hashing are
  Catalyst expressions (``transform``/``aggregate``/``md5``); candidate
  verification is a join + aggregate.

A pyspark.ml variant (``HashingTF + MinHashLSH.approxSimilarityJoin``) is
provided for parity with the stock MLlib pattern; it is seed-deterministic
but not oracle-reproducible, so tests pin it structurally (no cartesian in
the plan) rather than by value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ferc_xbrl_extractor_spark.operators.text import tokens


def shingles(text_col: str | Column = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles of a document as an array column."""
    toks = tokens(text_col)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def shingle_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Long (id, shingle) relation — the inverted-index input."""
    return df.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("shingle")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join via inverted index.

    shingle explode → self-join on shingle (candidates share ≥1 shingle,
    which any pair above a positive threshold must) → count common →
    jaccard = |∩| / (|A|+|B|-|∩|). Returns (id_a, id_b, jaccard) with
    id_a < id_b.

    ``max_shingle_df`` drops shingles shared by more than that many docs
    before pairing — the standard stop-shingle cap that bounds the worst
    bucket at scale (dropped shingles can only *lower* measured Jaccard,
    so set it well above the corpus's stopword plateau or leave None for
    exact results).
    """
    from pyspark import StorageLevel

    st = shingle_table(df, id_col, text_col, n).persist(StorageLevel.MEMORY_AND_DISK)
    if max_shingle_df is not None:
        freq = st.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
        st = st.join(
            F.broadcast(freq.filter(F.col("df_") > max_shingle_df)),
            "shingle",
            "left_anti",
        )
    sizes = st.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))

    a = st.select(F.col(id_col).alias("id_a"), "shingle")
    b = st.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(
            F.broadcast(sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))),
            "id_a",
        )
        .join(
            F.broadcast(sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))),
            "id_b",
        )
        .withColumn(
            "__jac",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("__jac") >= threshold)
        .select("id_a", "id_b", F.round("__jac", 4).alias("jaccard"))
    )


def minhash_signature(
    text_col: str | Column = "text", n: int = 3, num_hashes: int = 12
) -> Column:
    """MinHash signature as an array of ``num_hashes`` md5-hex minima.

    Permutation i is the lexicographic min of ``md5(i || ':' || shingle)``
    over the document's shingles — a valid MinHash family (md5 is a
    uniform enough permutation of the shingle space) that any engine with
    md5 reproduces bit-for-bit. Computed entirely map-side: no shuffle.
    """
    sh = shingles(text_col, n)

    def perm(i: int):
        # One-arg lambda factory: a default-arg lambda here would make
        # pyspark's higher-order-function binder pass the element *index*
        # as the second argument, silently clobbering the permutation id.
        prefix = f"{i}:"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    return F.array(
        *[F.array_min(F.transform(sh, perm(i))) for i in range(num_hashes)]
    )


def minhash_signature_table(
    st: DataFrame, id_col: str = "doc_id", num_hashes: int = 12
) -> DataFrame:
    """MinHash signatures computed from a long (id, shingle) relation:
    ``groupBy(id).agg(min(md5(i:shingle)) ...)``.

    Identical output to ``minhash_signature`` but the execution shape is
    map-side md5 + partial-aggregated min over ONE keyed shuffle — this is
    the path to use in plans (the per-row array-expression variant defeats
    whole-stage codegen on wide signatures and re-evaluates the shingle
    array per permutation; measured ~50× slower at 5k docs)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return st.groupBy(id_col).agg(*aggs)


def band_table(
    sig: DataFrame, id_col: str = "doc_id", num_hashes: int = 12, bands: int = 6
) -> DataFrame:
    """(id, band_idx, band_hash) from a signature table — the LSH bucket
    relation. rows-per-band = num_hashes/bands sets the s-curve threshold
    ≈ (1/bands)^(1/rows_per_band)."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per = num_hashes // bands
    return sig.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "|",
                            *[F.col(f"mh{b * rows_per + r}") for r in range(rows_per)],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 6,
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """LSH banding: pairs colliding in ≥1 band. The join key is
    (band_index, band_hash) so the shuffle is fully keyed — never
    all-pairs. Pass ``shingle_df`` to reuse a cached shingle table."""
    st = shingle_df if shingle_df is not None else shingle_table(df, id_col, text_col, n)
    banded = band_table(
        minhash_signature_table(st, id_col, num_hashes), id_col, num_hashes, bands
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band_idx", "band_hash")
    b = banded.select(F.col(id_col).alias("id_b"), "band_idx", "band_hash")
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 6,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup join: banded candidates, then exact Jaccard
    verification of only the candidate pairs. Output (id_a, id_b, jaccard)
    with jaccard ≥ threshold; a near-dup pair is found iff LSH surfaced it
    (approximate by design — recall set by the band shape).

    The shingle table feeds four consumers (signatures, sizes, both sides
    of the verification join), so it is persisted for the duration of the
    plan — at corpus scale you would materialize it to parquet instead."""
    from pyspark import StorageLevel

    st = shingle_table(df, id_col, text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cands = lsh_candidate_pairs(
        df, id_col, text_col, n, num_hashes, bands, shingle_df=st
    )
    sizes = st.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))

    # Count common shingles per candidate pair via two keyed joins on
    # (id, shingle) — no all-pairs work outside the candidate set.
    common = (
        cands.join(st.withColumnRenamed(id_col, "id_a"), "id_a")
        .join(
            st.select(F.col(id_col).alias("id_b"), F.col("shingle")),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(
            F.broadcast(sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))),
            "id_a",
        )
        .join(
            F.broadcast(sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))),
            "id_b",
        )
        .withColumn(
            "__jac",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("__jac") >= threshold)
        .select("id_a", "id_b", F.round("__jac", 4).alias("jaccard"))
    )


def simhash(text_col: str | Column = "text", bits: int = 32) -> Column:
    """SimHash of the document's token multiset, as a ``bits``-wide bigint.

    Token hash = first 15 hex chars of md5 (60 bits) via ``conv``; bit b of
    the fingerprint is the sign of Σ_tokens (±1 by token bit b). All
    Catalyst expressions; cost is O(tokens × bits) map-side.
    """
    toks = tokens(text_col)
    h = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")
    )
    def bit_merge(b: int):
        # Two-arg lambda factory (see perm() in minhash_signature for why
        # a default-arg lambda is wrong here).
        return lambda acc, v: acc + F.when(
            F.shiftright(v, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("bigint")
    for b in range(bits):
        contrib = F.aggregate(h, F.lit(0).cast("bigint"), bit_merge(b))
        out = out + F.when(contrib > 0, F.lit(2**b).cast("bigint")).otherwise(0)
    return out


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    prefix_bits: int = 8,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup candidates: bucket by the fingerprint's top
    ``prefix_bits`` (keyed join — the LSH trick again), verify Hamming
    distance ≤ max_hamming within buckets via bit_count(xor)."""
    fp = df.select(
        F.col(id_col), simhash(text_col, bits).alias("fp")
    ).withColumn("bucket", F.shiftright(F.col("fp"), bits - prefix_bits))
    a = fp.select(F.col(id_col).alias("id_a"), F.col("fp").alias("fp_a"), "bucket")
    b = fp.select(F.col(id_col).alias("id_b"), F.col("fp").alias("fp_b"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def minhash_lsh_ml(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hash_tables: int = 5,
    distance_threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Stock MLlib pattern: HashingTF over shingles → MinHashLSH →
    approxSimilarityJoin (banded/bucketed inside MLlib — never all-pairs).
    Seed-deterministic within Spark but not reproducible by a SQL oracle;
    use minhash_lsh_pairs for oracle-checked runs."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = df.select(F.col(id_col), shingles(text_col).alias("sh")).filter(
        F.size("sh") > 0
    )
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=1 << 18)
    feats = tf.transform(sh)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, distance_threshold, distCol="jaccard_dist"
    )
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round(1.0 - F.col("jaccard_dist"), 4).alias("jaccard"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
