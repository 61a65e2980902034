"""The XML shredder (SURVEY.md §2.1 S3): filing bytes -> long relations.

This is the engine's one UDTF-shaped custom source: a ``mapInPandas`` that
runs an XML parse per filing row and emits a single long DataFrame holding
both record kinds (``fact`` and ``context``), discriminated by
``record_type``. Downstream, ``facts_from``/``contexts_from`` are cheap
filters over the cached shredded relation.

Scale design decision (the big departure from the reference, which keeps
facts and contexts separate and joins them per table —
/root/reference/src/ferc_xbrl_extractor/datapackage.py:446-453): a fact and
its context always live in the *same file*, so the shredder denormalizes the
context's primary-key fields (entity, period, dims) onto every fact row
**map-side**. The per-table context join therefore costs zero shuffles at
any scale; each output table needs exactly one shuffle (the pivot groupBy).
At 100 TB this removes ~255 joins per run.

Reference semantics pinned (instance.py:350-408):
- contexts: id, entity identifier, segment dimensions (explicit/typed,
  XML prefix stripped, names snakecased), instant vs duration period;
- facts: elements in the ``fact_prefix`` namespace carrying @contextRef;
  name snakecased; facts with null text dropped (P1) at parse time;
- per-filing ``report_date`` = first ``report_date`` duration fact, falling
  back to ``certifying_official_date`` (the FERC-714 workaround,
  instance.py:294-303).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ferc_xbrl_extractor_spark.functions.naming import snakecase, strip_xml_prefix

XBRL_INSTANCE = "http://www.xbrl.org/2003/instance"

SHREDDED_SCHEMA = T.StructType(
    [
        T.StructField("record_type", T.StringType(), False),  # 'fact' | 'context'
        T.StructField("filing_name", T.StringType(), False),
        T.StructField("c_id", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), True),
        T.StructField("instant", T.BooleanType(), True),
        T.StructField("start_date", T.StringType(), True),
        T.StructField("end_date", T.StringType(), True),
        T.StructField("dims", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("name", T.StringType(), True),  # facts only
        T.StructField("value", T.StringType(), True),  # facts only
        T.StructField("publication_time", T.TimestampType(), True),
        T.StructField("taxonomy_version", T.StringType(), True),
        T.StructField("report_date", T.StringType(), True),
    ]
)


def _parse_context(elem: ET.Element) -> dict | None:
    """One <context> element -> flat dict (entity, period, dims)."""
    entity = elem.find(f"{{{XBRL_INSTANCE}}}entity")
    period = elem.find(f"{{{XBRL_INSTANCE}}}period")
    if entity is None or period is None:
        return None
    ident = entity.find(f"{{{XBRL_INSTANCE}}}identifier")
    segment = entity.find(f"{{{XBRL_INSTANCE}}}segment")
    dims: dict[str, str] = {}
    if segment is not None:
        for child in segment:
            tag = child.tag
            if tag.endswith("explicitMember"):
                name = snakecase(strip_xml_prefix(child.attrib["dimension"]))
                dims[name] = (child.text or "").strip()
            elif tag.endswith("typedMember"):
                name = snakecase(strip_xml_prefix(child.attrib["dimension"]))
                sub = list(child)
                dims[name] = (sub[0].text or "") if sub else ""
            else:
                raise ValueError("XBRL dimension not formatted correctly")
    instant_el = period.find(f"{{{XBRL_INSTANCE}}}instant")
    if instant_el is not None:
        inst, start, end = True, None, instant_el.text
    else:
        start_el = period.find(f"{{{XBRL_INSTANCE}}}startDate")
        end_el = period.find(f"{{{XBRL_INSTANCE}}}endDate")
        inst = False
        start = start_el.text if start_el is not None else None
        end = end_el.text if end_el is not None else None
    return {
        "c_id": elem.attrib["id"],
        "entity_id": ident.text if ident is not None else None,
        "instant": inst,
        "start_date": start,
        "end_date": end,
        "dims": dims,
    }


def shred_one(content: bytes, fact_prefix: str = "ferc") -> tuple[list[dict], list[dict]]:
    """Parse one filing's bytes into (contexts, facts) row dicts.

    Pure function (no Spark) so unit tests can pin parser semantics against
    the reference's conftest fixture document directly.
    """
    # Collect prefix->uri mappings so facts can be selected by namespace
    # (ElementTree does not retain prefixes on parsed elements).
    fact_uris: set[str] = set()
    root = None
    for event, payload in ET.iterparse(
        _bytes_io(content), events=("start-ns", "start")
    ):
        if event == "start-ns":
            prefix, uri = payload
            if prefix == fact_prefix:
                fact_uris.add(uri)
        elif root is None:
            root = payload

    contexts: list[dict] = []
    facts: list[dict] = []
    for elem in root:
        tag = elem.tag
        if tag == f"{{{XBRL_INSTANCE}}}context":
            ctx = _parse_context(elem)
            if ctx is not None:
                contexts.append(ctx)
        elif tag.startswith("{") and "contextRef" in elem.attrib:
            uri = tag[1 : tag.index("}")]
            if uri in fact_uris:
                if elem.text is None:  # P1: null-value facts dropped at parse
                    continue
                facts.append(
                    {
                        "name": snakecase(tag[tag.index("}") + 1 :]),
                        "c_id": elem.attrib["contextRef"],
                        "value": elem.text,
                    }
                )
    return contexts, facts


def _bytes_io(content: bytes):
    import io

    return io.BytesIO(content)


def _report_date(facts: list[dict], ctx_by_id: dict[str, dict]) -> str | None:
    for key in ("report_date", "certifying_official_date"):
        for f in facts:
            ctx = ctx_by_id.get(f["c_id"])
            if f["name"] == key and ctx is not None and not ctx["instant"]:
                return f["value"]
    return None


def _shred_batches(fact_prefix: str):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for _, filing in pdf.iterrows():
                try:
                    contexts, facts = shred_one(filing["content"], fact_prefix)
                except ET.ParseError:
                    # E1: corrupt filing -> skip (reference xbrl.py:159-163)
                    continue
                ctx_by_id = {c["c_id"]: c for c in contexts}
                base = {
                    "filing_name": filing["filing_name"],
                    "publication_time": filing["publication_time"],
                    "taxonomy_version": filing["taxonomy_version"],
                    "report_date": _report_date(facts, ctx_by_id),
                }
                for c in contexts:
                    rows.append(
                        {
                            "record_type": "context",
                            **base,
                            **c,
                            "name": None,
                            "value": None,
                        }
                    )
                for f in facts:
                    ctx = ctx_by_id.get(f["c_id"])
                    if ctx is None:
                        continue
                    rows.append({"record_type": "fact", **base, **ctx, **f})
            if rows:
                yield pd.DataFrame(rows, columns=[f.name for f in SHREDDED_SCHEMA])

    return fn


def shred_filings(filings: DataFrame, fact_prefix: str = "ferc") -> DataFrame:
    """filings(filing_name, content, publication_time, taxonomy_version)
    -> long shredded relation (facts with denormalized context PK + contexts).

    One input row -> many output rows; Arrow-batched. Callers should
    ``persist()`` the result when materializing many tables from it.
    """
    return filings.mapInPandas(_shred_batches(fact_prefix), schema=SHREDDED_SCHEMA)


def facts_from(shredded: DataFrame) -> DataFrame:
    """Fact rows (with denormalized context PK fields)."""
    return shredded.filter(F.col("record_type") == "fact").drop("record_type")


def contexts_from(shredded: DataFrame) -> DataFrame:
    """Context rows (one per <context> element)."""
    return (
        shredded.filter(F.col("record_type") == "context")
        .drop("record_type", "name", "value", "report_date")
    )
