"""Text-corpus ingestion and delivery beyond parquet (S7).

Training corpora ship as JSONL / CSV shard directories at least as often
as parquet; these readers wrap ``spark.read`` with the repo's documents
schema and two scale rules:

- **Explicit schema, never inference.** ``spark.read.json`` without a
  schema runs a full inference pass over the data first — at 100 TB that
  is a second scan of the corpus before the first real job. Callers pass
  (or default to) a DDL schema string and the read is one scan.
- **Shard-count delivery.** ``write_corpus_shards`` materializes a corpus
  as N balanced shards via round-robin repartition — the standard layout
  a training loader consumes (N ≫ trainer data-parallel degree, roughly
  uniform bytes per shard).

No reference counterpart (the reference ingests XBRL XML/zip; see
sources/filings.py for that surface); SURVEY.md §2.12 gap surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def load_documents_json(
    spark: SparkSession, path: str, schema: str = DOC_SCHEMA, **options: str
) -> DataFrame:
    """Read a JSONL corpus (one JSON object per line, the pretraining
    interchange format). Malformed lines yield null columns under the
    default PERMISSIVE mode — pass ``mode="DROPMALFORMED"`` to skip them
    or ``mode="FAILFAST"`` to raise (the E1-style skip/strict choice)."""
    return spark.read.schema(schema).options(**options).json(path)


def load_documents_csv(
    spark: SparkSession,
    path: str,
    schema: str = DOC_SCHEMA,
    **options: str,
) -> DataFrame:
    """Read a CSV corpus. Defaults: header row, quoted fields with
    embedded newlines supported (``multiLine`` — note this makes a single
    file non-splittable; prefer many shard files, which parallelize by
    file instead of by byte range).

    ``enforceSchema`` is disabled on purpose: Spark binds CSV columns by
    POSITION, and with the default enforceSchema=true a file whose header
    order differs from the schema is silently scrambled (ids parsed as
    text, text nulled by PERMISSIVE casts). With it false, Spark
    validates the header against the schema field names and fails loudly
    on a mismatch instead."""
    opts = {
        "header": "true",
        "multiLine": "true",
        "escape": '"',
        "enforceSchema": "false",
    }
    opts.update(options)
    return spark.read.schema(schema).options(**opts).csv(path)


def load_documents_orc(
    spark: SparkSession, path: str, schema: str = DOC_SCHEMA
) -> DataFrame:
    """Read an ORC corpus (Spark-native reader — columnar like parquet,
    with the same predicate pushdown / column pruning / split-by-stripe
    parallelism; common in Hive-lineage data lakes). The explicit schema
    is projected over the file schema, so a wider ORC table prunes to the
    declared columns at the stripe reader."""
    return spark.read.schema(schema).orc(path)


def write_corpus_shards(
    df: DataFrame, path: str, shards: int, fmt: str = "json"
) -> None:
    """Write a corpus as ``shards`` balanced files (round-robin
    repartition → one file per partition). fmt: json | parquet | csv | orc."""
    writer = df.repartition(shards).write.mode("overwrite")
    if fmt == "csv":
        writer = writer.options(header=True, escape='"')
    getattr(writer, fmt)(path)
