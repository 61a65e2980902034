"""Exactly-once corpus shard publishing: manifest-committed writes.

A 100-TB pipeline retries: the scheduler re-runs a failed epoch-build
stage, two workflow runs race on the same output path, a reader lists a
directory mid-write. Bare ``write_corpus_shards`` (sources/corpus.py) has
none of the protections warehouse sinks take for granted, so this module
adds the manifest-last commit protocol on top of it:

1. shards are written first (a normal distributed write);
2. a ``_MANIFEST.json`` is written LAST, carrying per-file row counts and
   order-insensitive content fingerprints plus corpus totals.

The manifest is the commit marker — readers treat a directory without one
as unpublished, exactly like Spark's own ``_SUCCESS`` but with enough
content evidence to *verify* the data, not just its existence. Re-running
``publish_shards`` on an already-committed path verifies the manifest and
skips the write (idempotent retry); a half-written directory (crash
between steps 1 and 2) has no manifest and is overwritten.

Fingerprints are computed distributedly: one pass over the written files,
grouped by ``input_file_name``, each file's fingerprint the SUM of
per-row ``xxhash64`` values — commutative, so it is independent of row
order within the file and of how Spark tasks split the read. Nothing is
collected except the |files|-row manifest itself.

No reference counterpart (the reference writes SQLite/parquet once,
locally — ref:src/ferc_xbrl_extractor/cli.py:191-207); the protocol is
the standard manifest-commit pattern from lakehouse table formats,
re-expressed for plain parquet/jsonl shard directories.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_MANIFEST.json"


def _read_shards(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    # Verification must see the CURRENT disk state: Spark's session-shared
    # file-status cache otherwise plans the scan with stale file lengths
    # (a shard rewritten shorter since the last read fails the read
    # instead of failing verification).
    spark.catalog.refreshByPath(path)
    reader = spark.read
    if fmt == "csv":
        reader = reader.options(header=True, escape='"', inferSchema=False)
    return getattr(reader, fmt)(path)


def shard_manifest(spark: SparkSession, path: str, fmt: str = "parquet") -> dict:
    """Compute a manifest for a shard directory: per-file ``n_rows`` and
    ``fingerprint`` (sum of per-row xxhash64 over all columns cast to
    string, so json/csv round-trips fingerprint identically), plus corpus
    totals. One distributed pass; the result is |files| rows."""
    df = _read_shards(spark, path, fmt)
    hashed = df.select(
        F.input_file_name().alias("__file"),
        F.xxhash64(*[F.col(c).cast("string") for c in df.columns]).alias(
            "__h"
        ),
    )
    # Hash sum rides as decimal(38,0): random 64-bit values overflow a
    # LONG sum after a handful of rows, and Spark 4's ANSI mode makes
    # that a hard error, not a wrap. Folded back to 64 bits driver-side.
    rows = (
        hashed.groupBy("__file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("__h").cast("decimal(38,0)")).alias("fingerprint"),
        )
        .collect()
    )
    files = {
        os.path.basename(r["__file"]): {
            "n_rows": int(r["n_rows"]),
            "fingerprint": int(r["fingerprint"]) % (1 << 64),
        }
        for r in rows
    }
    return {
        "format": fmt,
        "columns": list(df.columns),
        "n_files": len(files),
        "n_rows": sum(v["n_rows"] for v in files.values()),
        "fingerprint": sum(v["fingerprint"] for v in files.values())
        % (1 << 64),
        "files": dict(sorted(files.items())),
    }


def read_manifest(path: str) -> dict | None:
    """The committed manifest, or None if the directory is unpublished."""
    p = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as f:
        return json.load(f)


def verify_shards(spark: SparkSession, path: str, fmt: str | None = None) -> dict:
    """Re-derive the manifest from the files on disk and diff it against
    the committed one. Returns ``{"ok": bool, "missing": [...],
    "extra": [...], "mismatched": [...]}`` — the integrity check a
    downstream trainer runs before streaming a shard directory."""
    committed = read_manifest(path)
    if committed is None:
        return {"ok": False, "error": "no manifest", "missing": [],
                "extra": [], "mismatched": []}
    live = shard_manifest(spark, path, fmt or committed["format"])
    missing = sorted(set(committed["files"]) - set(live["files"]))
    extra = sorted(set(live["files"]) - set(committed["files"]))
    mismatched = sorted(
        name
        for name in set(committed["files"]) & set(live["files"])
        if committed["files"][name] != live["files"][name]
    )
    return {
        "ok": not (missing or extra or mismatched),
        "missing": missing,
        "extra": extra,
        "mismatched": mismatched,
    }


def publish_shards(
    df: DataFrame,
    path: str,
    shards: int,
    fmt: str = "parquet",
    force: bool = False,
) -> dict:
    """Write ``df`` as ``shards`` balanced files and commit with a
    manifest — idempotently.

    * Path already committed (manifest present) and ``force=False``: the
      write is SKIPPED and the committed manifest returned with
      ``{"published": False}`` — a retried job does no duplicate work and
      cannot corrupt a good output.
    * No manifest (fresh path, or a crash left a half-written directory):
      shards are (re)written, then the manifest is derived from what was
      actually written and committed last.

    The returned dict is the manifest plus ``published`` and
    ``elapsed_s``.
    """
    from ..sources.corpus import write_corpus_shards

    if not force:
        committed = read_manifest(path)
        if committed is not None:
            return {**committed, "published": False, "elapsed_s": 0.0}
    t0 = time.time()
    write_corpus_shards(df, path, shards, fmt=fmt)
    manifest = shard_manifest(df.sparkSession, path, fmt)
    tmp = os.path.join(path, MANIFEST_NAME + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(path, MANIFEST_NAME))
    return {**manifest, "published": True,
            "elapsed_s": round(time.time() - t0, 3)}
