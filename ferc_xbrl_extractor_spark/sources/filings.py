"""Filing scans (SURVEY.md §2.1 S1/S2/S5).

Spark-first shape: the unit of parallelism is the *filing file*. A directory
of ``.xbrl`` files is a ``binaryFile`` scan (splittable across executors,
listing parallelized by the driver); a zip archive is one binaryFile row that
a ``mapInPandas`` explodes into member rows (zips are not splittable, so
parallelism comes from having many zips — at production scale FERC publishes
one zip per form-year, and a 1000-executor cluster reads all of them
concurrently). The instance-name regex filter (reference xbrl.py:67-72) is
applied to the *listing*, before any parse work — file-skipping predicate
pushdown.

Reference behavior pinned: instances_from_zip / get_instances
(/root/reference/src/ferc_xbrl_extractor/instance.py:411-484), including the
``rssfeed`` JSON sidecar providing per-filing publication_time (UTC,
tz-naive) and taxonomy_version.
"""

from __future__ import annotations

import datetime
import io
import json
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FILING_SCHEMA = T.StructType(
    [
        T.StructField("filing_name", T.StringType(), False),
        T.StructField("content", T.BinaryType(), False),
        T.StructField("publication_time", T.TimestampType(), True),
        T.StructField("taxonomy_version", T.StringType(), True),
    ]
)


def _parse_rssfeed(raw: bytes) -> tuple[dict[str, datetime.datetime], dict[str, str]]:
    """Decode the zip's ``rssfeed`` member: filename -> (publication_time,
    taxonomy_version). Publication times are normalized to naive UTC."""
    meta = json.loads(raw)
    pub_times: dict[str, datetime.datetime] = {}
    tax_versions: dict[str, str] = {}
    for filers in meta.values():
        for filing in filers:
            ts = datetime.datetime.fromisoformat(
                filing["rss_metadata"]["published_parsed"]
            )
            pub_times[filing["filename"]] = ts.astimezone(
                datetime.timezone.utc
            ).replace(tzinfo=None)
            tax_versions[filing["filename"]] = filing.get("taxonomy_zip_name")
    return pub_times, tax_versions


def _explode_zip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One zip-file row in -> one row per ``.xbrl`` member out."""
    for pdf in batches:
        for _, row in pdf.iterrows():
            archive = zipfile.ZipFile(io.BytesIO(row["content"]))
            names = archive.namelist()
            pub_times: dict[str, datetime.datetime] = {}
            tax_versions: dict[str, str] = {}
            if "rssfeed" in names:
                pub_times, tax_versions = _parse_rssfeed(archive.read("rssfeed"))
            out = []
            for member in names:
                if not member.endswith(".xbrl"):
                    continue
                stem = member.rsplit("/", 1)[-1]
                stem = stem[: -len(".xbrl")]
                out.append(
                    {
                        "filing_name": stem,
                        "content": archive.read(member),
                        "publication_time": pub_times.get(member),
                        "taxonomy_version": tax_versions.get(member),
                    }
                )
            if out:
                yield pd.DataFrame(out)


def scan_filings(
    spark: SparkSession,
    path: str | list[str],
    instance_pattern: str | None = None,
    publication_time: datetime.datetime | None = None,
) -> DataFrame:
    """Scan directories of ``.xbrl`` files and/or zip archives into a
    filings DataFrame (filing_name, content, publication_time,
    taxonomy_version).

    ``path`` may be a single path or a list (the CLI's ``nargs='+'``
    surface, reference get_instances per filing source) — passed through
    to ``load`` as a list; a comma-joined string would be read as ONE
    literal path by Spark's file sources and match nothing.

    ``instance_pattern`` filters filing *names* before any XML parsing —
    the cheap pre-scan predicate (reference S5).
    """
    paths = [path] if isinstance(path, str) else list(path)
    listing = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{xbrl,zip}")
        .option("recursiveFileLookup", "true")
        .load(paths)
    )
    is_zip = F.col("path").endswith(".zip")

    plain = (
        listing.filter(~is_zip)
        .select(
            F.regexp_replace(
                F.element_at(F.split(F.col("path"), "/"), -1), r"\.xbrl$", ""
            ).alias("filing_name"),
            F.col("content"),
            # Reference parity: non-zip instances have NO publication time
            # (instance.py:454-484 leaves it None) unless the caller sets
            # one explicitly. Never stamp mtime — it changes on copy and
            # publication_time is part of every table's primary key.
            F.lit(publication_time).cast("timestamp").alias("publication_time"),
            F.lit(None).cast("string").alias("taxonomy_version"),
        )
    )
    zipped = (
        listing.filter(is_zip)
        .select("path", "content")
        # Hash-repartition on the zip path so N zips spread over N tasks
        # regardless of how few listing partitions the driver produced —
        # a plan-time expression, not the eager .rdd partition probe this
        # used to do (zips aren't splittable; the member explode is the
        # expensive step being parallelized here).
        .repartition(F.col("path"))
        .mapInPandas(_explode_zip, schema=FILING_SCHEMA)
    )
    filings = plain.unionByName(zipped)
    if instance_pattern:
        filings = filings.filter(F.col("filing_name").rlike(instance_pattern))
    return filings
