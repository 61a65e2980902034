"""Arelle-free taxonomy scan (SURVEY.md §2.1 S4, §2.8 K5).

The reference shells out to Arelle to load a FERC taxonomy archive and walk
its presentation DAG (arelle_interface.py:16-60, taxonomy.py:230-262). This
container has no Arelle, and at any rate the taxonomy archive is
self-contained — every schema and linkbase the DTS needs ships inside the
zip — so a namespace-aware stdlib XML parse recovers everything the engine
needs:

- concept declarations (xs:element): name, id, type, periodType, balance;
- role types (link:roleType): roleURI + definition text ("NNN - Schedule -
  Title", the string clean_table_name turns into the table name);
- presentation linkbases: parent-child arcs per role → the concept tree
  whose Axis children become PK columns and whose leaves become data
  columns (reference datapackage.py:156-194 semantics, mirrored exactly);
- calculation linkbases: summation-item weights (K5 metadata);
- reference linkbases: account / form-location parts (K5 metadata).

Type resolution follows Arelle's ``baseXsdType``: custom item types
declared in the archive are walked through their restriction/extension
chain; the standard xbrli/us item types bottom out in a fixed table (they
live in remote schemas the reference fetches over HTTP — their bases are
spec constants, not data).

Everything here is driver-side schema inference — executors never see a
taxonomy. The output is the ``TableSpec`` catalog (freeze with
``specs_to_json``) plus the K5 metadata document.
"""

from __future__ import annotations

import io
import logging
import re
import zipfile
from dataclasses import dataclass, field
from pathlib import Path

_LOG = logging.getLogger(__name__)

from ferc_xbrl_extractor_spark.catalog.tablespec import TableSpec, merge_catalogs
from ferc_xbrl_extractor_spark.functions.naming import clean_table_name, snakecase

XS = "{http://www.w3.org/2001/XMLSchema}"
LB = "{http://www.xbrl.org/2003/linkbase}"
XLINK = "{http://www.w3.org/1999/xlink}"
XBRLI = "{http://www.xbrl.org/2003/instance}"

PARENT_CHILD = "http://www.xbrl.org/2003/arcrole/parent-child"
SUMMATION_ITEM = "http://www.xbrl.org/2003/arcrole/summation-item"
CONCEPT_REFERENCE = "http://www.xbrl.org/2003/arcrole/concept-reference"

# XSD base type for the standard item types (xbrli + common us/srt type
# libraries). These live in schemas the archive references remotely; their
# bases are constants from the XBRL 2.1 / us-types specs — the same values
# Arelle's baseXsdType reports.
STANDARD_TYPE_BASES: dict[str, str] = {
    "stringItemType": "string",
    "normalizedStringItemType": "string",
    "tokenItemType": "string",
    "QNameItemType": "string",
    "anyURIItemType": "string",
    "domainItemType": "string",
    "textBlockItemType": "string",
    "monetaryItemType": "decimal",
    "decimalItemType": "decimal",
    "sharesItemType": "decimal",
    "pureItemType": "decimal",
    "percentItemType": "decimal",
    "perShareItemType": "decimal",
    "perUnitItemType": "decimal",
    "energyItemType": "decimal",
    "powerItemType": "decimal",
    "lengthItemType": "decimal",
    "voltageItemType": "decimal",
    "floatItemType": "decimal",
    "doubleItemType": "decimal",
    "integerItemType": "integer",
    "intItemType": "integer",
    "longItemType": "integer",
    "shortItemType": "integer",
    "nonNegativeIntegerItemType": "integer",
    "nonPositiveIntegerItemType": "integer",
    "positiveIntegerItemType": "integer",
    "negativeIntegerItemType": "integer",
    "booleanItemType": "boolean",
    "dateItemType": "date",
    "dateTimeItemType": "date",
    "gYearItemType": "gyear",
    "gYearMonthItemType": "gyear",
    "durationItemType": "duration",
}


@dataclass
class Concept:
    name: str
    concept_id: str
    type_local: str  # local name of the declared type
    period_type: str  # 'duration' | 'instant'
    balance: str | None = None
    abstract: bool = False


@dataclass
class Role:
    uri: str
    definition: str


@dataclass
class TaxonomyVersion:
    """One dated taxonomy's parsed content."""

    concepts_by_id: dict[str, Concept] = field(default_factory=dict)
    concepts_by_name: dict[str, Concept] = field(default_factory=dict)
    roles: dict[str, Role] = field(default_factory=dict)
    # every roleType's definition text (incl. reference roles) — Arelle's
    # roleTypeDefinition lookup, used to name K5 reference groups
    role_definitions: dict[str, str] = field(default_factory=dict)
    # role_uri -> list of (parent_id, child_id, order)
    presentation: dict[str, list[tuple[str, str, float]]] = field(
        default_factory=dict
    )
    # concept name -> [(child concept name, weight)]
    calculations: dict[str, list[tuple[str, float]]] = field(default_factory=dict)
    # concept name -> {reference role definition: [part dicts]}
    references: dict[str, dict] = field(default_factory=dict)
    # custom item type local name -> base type local name it derives from
    type_bases: dict[str, str] = field(default_factory=dict)
    # type local names that resolved to neither a standard base nor an
    # archive-shipped derivation — diagnosed loudly, defaulted to string
    unresolved_types: set[str] = field(default_factory=set)
    # absolute-URL schema references (xs:import/xs:include schemaLocation)
    # the archive points at but does not ship — the remote DTS surface;
    # catalog.remote_dts.resolve_remote_dts() follows these with the
    # reference's retry/cache semantics when a fetcher is available
    remote_refs: set[str] = field(default_factory=set)

    def base_type(self, type_local: str) -> str:
        """XBRL base of a declared item type, following archive-shipped
        ``restriction``/``extension`` chains into the standard bases.

        Boundary: by default only types shipped in the archive plus the
        STANDARD_TYPE_BASES constants resolve. A type defined solely in a
        remote schema is NOT silently mis-typed — it is recorded in
        ``unresolved_types`` and warned about once, then defaults to
        'string' (the widest type: values survive verbatim). To actually
        follow remote DTS references the way the reference's Arelle
        loader does (ref arelle_interface.py:16-60, HTTP fetch with web
        cache + 7-attempt exponential backoff), run
        ``catalog.remote_dts.resolve_remote_dts(version, ...)`` or pass
        ``resolve_remote=True`` to ``parse_taxonomy_archive`` — offline
        stays the default; nothing fetches unless asked."""
        seen: set[str] = set()
        cur = type_local
        while cur not in STANDARD_TYPE_BASES and cur in self.type_bases:
            if cur in seen:
                break
            seen.add(cur)
            cur = self.type_bases[cur]
        if cur not in STANDARD_TYPE_BASES and type_local not in self.unresolved_types:
            self.unresolved_types.add(type_local)
            _LOG.warning(
                "taxonomy type %r does not resolve to a standard XBRL base "
                "(not shipped in the archive and not a known standard type); "
                "defaulting to 'string'. If this type lives in a remote "
                "schema, pass extra_type_bases={%r: <base>} to the taxonomy "
                "parser (or ship the schema in the archive).",
                type_local,
                type_local,
            )
        return STANDARD_TYPE_BASES.get(cur, "string")


def _local(qname: str | None) -> str:
    """Local name of 'prefix:name' or ElementTree's '{uri}name'."""
    name = qname or ""
    if "}" in name:
        name = name.rsplit("}", 1)[-1]
    return name.split(":")[-1]


def _parse_schema(version: TaxonomyVersion, data: bytes) -> None:
    import xml.etree.ElementTree as ET

    root = ET.fromstring(data)
    # remote DTS references: absolute-URL imports/includes the archive
    # does not ship; recorded for resolve_remote_dts (local/relative
    # schemaLocations are archive members and parse in the normal sweep)
    for kind in ("import", "include"):
        for imp in root.iter(f"{XS}{kind}"):
            loc = imp.get("schemaLocation") or ""
            if loc.startswith(("http://", "https://")):
                version.remote_refs.add(loc)
    for el in root.iter(f"{XS}element"):
        name = el.get("name")
        cid = el.get("id")
        if not name or not cid:
            continue
        concept = Concept(
            name=name,
            concept_id=cid,
            type_local=_local(el.get("type")),
            period_type=el.get(f"{XBRLI}periodType", "duration"),
            balance=el.get(f"{XBRLI}balance"),
            abstract=el.get("abstract") == "true",
        )
        version.concepts_by_id[cid] = concept
        version.concepts_by_name[name] = concept

    for rt in root.iter(f"{LB}roleType"):
        uri = rt.get("roleURI")
        defn = rt.findtext(f"{LB}definition")
        if not uri or defn is None:
            continue
        version.role_definitions[uri] = defn.strip()
        used_on = {el.text for el in rt.findall(f"{LB}usedOn")}
        if any("presentationLink" in (u or "") for u in used_on):
            version.roles[uri] = Role(uri=uri, definition=defn.strip())

    # custom item types: restriction/extension base chains
    for kind in ("complexType", "simpleType"):
        for ct in root.iter(f"{XS}{kind}"):
            tname = ct.get("name")
            if not tname:
                continue
            for deriv in ct.iter():
                if deriv.tag in (f"{XS}restriction", f"{XS}extension"):
                    base = _local(deriv.get("base"))
                    if base and base != tname:
                        version.type_bases[tname] = base
                        break


def _href_id(href: str | None) -> str | None:
    if not href or "#" not in href:
        return None
    return href.rsplit("#", 1)[-1]


def _parse_linkbase(version: TaxonomyVersion, data: bytes) -> None:
    import xml.etree.ElementTree as ET

    root = ET.fromstring(data)

    for plink in root.iter(f"{LB}presentationLink"):
        role_uri = plink.get(f"{XLINK}role")
        if not role_uri:
            continue
        locs = {
            loc.get(f"{XLINK}label"): _href_id(loc.get(f"{XLINK}href"))
            for loc in plink.findall(f"{LB}loc")
        }
        edges = version.presentation.setdefault(role_uri, [])
        for arc in plink.findall(f"{LB}presentationArc"):
            if arc.get(f"{XLINK}arcrole") != PARENT_CHILD:
                continue
            if arc.get("use") == "prohibited":
                continue
            parent = locs.get(arc.get(f"{XLINK}from"))
            child = locs.get(arc.get(f"{XLINK}to"))
            if parent and child:
                edges.append((parent, child, float(arc.get("order", "0"))))

    for clink in root.iter(f"{LB}calculationLink"):
        locs = {
            loc.get(f"{XLINK}label"): _href_id(loc.get(f"{XLINK}href"))
            for loc in clink.findall(f"{LB}loc")
        }
        for arc in clink.findall(f"{LB}calculationArc"):
            if arc.get(f"{XLINK}arcrole") != SUMMATION_ITEM:
                continue
            parent_id = locs.get(arc.get(f"{XLINK}from"))
            child_id = locs.get(arc.get(f"{XLINK}to"))
            parent = version.concepts_by_id.get(parent_id)
            child = version.concepts_by_id.get(child_id)
            if parent and child:
                version.calculations.setdefault(parent.name, []).append(
                    (child.name, float(arc.get("weight", "1")))
                )

    for rlink in root.iter(f"{LB}referenceLink"):
        locs = {
            loc.get(f"{XLINK}label"): _href_id(loc.get(f"{XLINK}href"))
            for loc in rlink.findall(f"{LB}loc")
        }
        # reference resources keyed by their xlink:label
        refs: dict[str, ET.Element] = {}
        for ref in rlink.findall(f"{LB}reference"):
            label = ref.get(f"{XLINK}label")
            if label:
                refs[label] = ref
        for arc in rlink.findall(f"{LB}referenceArc"):
            if arc.get(f"{XLINK}arcrole") != CONCEPT_REFERENCE:
                continue
            concept = version.concepts_by_id.get(locs.get(arc.get(f"{XLINK}from")))
            ref = refs.get(arc.get(f"{XLINK}to"))
            if concept is None or ref is None:
                continue
            parts = {_local(part.tag): (part.text or "") for part in ref}
            role_uri = ref.get(f"{XLINK}role") or "reference"
            version.references.setdefault(concept.name, {}).setdefault(
                role_uri, []
            ).append(parts)


def parse_taxonomy_version(
    archive: zipfile.ZipFile,
    extra_type_bases: dict[str, str] | None = None,
) -> TaxonomyVersion:
    """Parse one dated taxonomy zip (schemas first, then linkbases).

    Unparseable members are skipped with a warning: published FERC archives
    really do contain corrupt entries (e.g. the form-6 2023-04-01 archive
    ships an HTML 'Request Rejected' page saved as sched-602's .xsd) — one
    bad schedule must not sink the other ~250 tables.

    ``extra_type_bases``: user-supplied {custom type local name → base
    type local name} mappings for types defined only in REMOTE schemas the
    archive references but does not ship (the reference resolves those
    over HTTP via Arelle; this engine is offline-by-design and instead
    diagnoses them via ``TaxonomyVersion.unresolved_types`` — this hook is
    how a user closes the gap for their taxonomy).
    """
    import logging
    import xml.etree.ElementTree as ET

    logger = logging.getLogger(__name__)
    version = TaxonomyVersion()
    if extra_type_bases:
        version.type_bases.update(extra_type_bases)
    names = sorted(archive.namelist())
    for n in names:
        if n.endswith(".xsd"):
            try:
                _parse_schema(version, archive.read(n))
            except ET.ParseError as err:
                logger.warning("skipping unparseable schema %s: %s", n, err)
    for n in names:
        if n.endswith(".xml"):
            try:
                _parse_linkbase(version, archive.read(n))
            except ET.ParseError as err:
                logger.warning("skipping unparseable linkbase %s: %s", n, err)
    return version


TAXONOMY_DATE_PATTERN = re.compile(r"\d{4}-\d{2}-\d{2}")


def parse_taxonomy_archive(
    source: str | Path | bytes,
    extra_type_bases: dict[str, str] | None = None,
    resolve_remote: bool = False,
    fetcher=None,
    cache_dir: str | Path | None = None,
) -> dict[str, TaxonomyVersion]:
    """S4 entry: a zip of dated taxonomy zips (reference xbrl.py:244-255)
    -> {date: TaxonomyVersion}. A zip containing schemas directly is
    treated as a single undated version. F8: the version date is extracted
    from the inner zip's filename.

    ``resolve_remote=True`` additionally follows each version's remote
    DTS references (xs:import/include URLs the archive does not ship)
    with the reference's retry/cache policy — see
    ``catalog.remote_dts.resolve_remote_dts``; ``fetcher``/``cache_dir``
    pass through (offline by default: nothing is fetched unless asked)."""
    if isinstance(source, bytes):
        outer = zipfile.ZipFile(io.BytesIO(source))
    else:
        outer = zipfile.ZipFile(source)
    versions: dict[str, TaxonomyVersion] = {}
    inner_zips = [n for n in outer.namelist() if n.endswith(".zip")]
    if inner_zips:
        for n in inner_zips:
            m = TAXONOMY_DATE_PATTERN.search(n)
            date = m.group(0) if m else n
            inner = zipfile.ZipFile(io.BytesIO(outer.read(n)))
            versions[date] = parse_taxonomy_version(inner, extra_type_bases)
    else:
        versions["0000-00-00"] = parse_taxonomy_version(outer, extra_type_bases)
    if resolve_remote:
        from .remote_dts import resolve_remote_dts

        for v in versions.values():
            resolve_remote_dts(v, fetcher=fetcher, cache_dir=cache_dir)
    return versions


# ---------------------------------------------------------------------------
# Concept-tree walk -> TableSpec (reference datapackage.py:156-194, 249-283)
# ---------------------------------------------------------------------------

def _role_children(
    version: TaxonomyVersion, role_uri: str
) -> tuple[dict[str, list[str]], list[str]]:
    """Adjacency (parent concept id -> ordered child ids) + root ids."""
    edges = version.presentation.get(role_uri, [])
    children: dict[str, list[tuple[float, str]]] = {}
    targets: set[str] = set()
    sources: set[str] = set()
    for parent, child, order in edges:
        children.setdefault(parent, []).append((order, child))
        targets.add(child)
        sources.add(parent)
    ordered = {
        p: [c for _, c in sorted(cs, key=lambda t: t[0])] for p, cs in children.items()
    }
    roots = [p for p in sources if p not in targets]
    return ordered, roots


def _walk_fields(
    version: TaxonomyVersion,
    children: dict[str, list[str]],
    node_id: str,
    period_type: str,
    axes: dict[str, str],
    columns: dict[str, str],
    seen: set[str],
) -> None:
    """Reference _get_fields_from_concepts: Axis children join the PK (and
    are not descended into), interior nodes recurse, leaves with a matching
    period type become data columns."""
    if node_id in seen:
        return
    seen.add(node_id)
    for child_id in children.get(node_id, []):
        child = version.concepts_by_id.get(child_id)
        if child is None:
            continue
        if child.name.endswith("Axis"):
            axes[snakecase(child.name)] = "string"
        elif children.get(child_id):
            _walk_fields(
                version, children, child_id, period_type, axes, columns, seen
            )
        elif child.period_type == period_type:
            field_type = {
                "string": "string",
                "decimal": "number",
                "gyear": "year",
                "integer": "integer",
                "boolean": "boolean",
                "date": "date",
                "duration": "string",
            }[version.base_type(child.type_local)]
            columns[snakecase(child.name)] = field_type


def catalog_from_version(version: TaxonomyVersion) -> dict[str, TableSpec]:
    """One taxonomy version -> {table_name: TableSpec} (up to 2 tables per
    role; roles with no data columns for a period type emit nothing,
    matching Resource.from_link_role)."""
    specs: dict[str, TableSpec] = {}
    for role_uri, role in version.roles.items():
        # Arelle's relationship view only lists roles that actually carry
        # parent-child arcs; roleTypes declared but never used in a
        # presentation network (e.g. form-6's bare 'Default' role) are not
        # fact tables.
        if not version.presentation.get(role_uri):
            continue
        cleaned = clean_table_name(role.definition)
        if cleaned is None:
            continue
        children, roots = _role_children(version, role_uri)
        for period_type in ("duration", "instant"):
            axes: dict[str, str] = {}
            columns: dict[str, str] = {}
            for root in roots:
                _walk_fields(
                    version, children, root, period_type, axes, columns, set()
                )
            if not columns:
                continue
            name = f"{cleaned}_{period_type}"
            specs[name] = TableSpec(
                name=name,
                period_type=period_type,
                columns=columns,
                axes=sorted(axes),
            )
    return specs


def catalog_from_archive(
    source: str | Path | bytes,
    extra_type_bases: dict[str, str] | None = None,
) -> dict[str, TableSpec]:
    """S4 + U2/O3: parse all dated versions, merge oldest-first with the
    reference's append-new/keep-removed/PK-must-match semantics.
    ``extra_type_bases`` — see parse_taxonomy_version."""
    versions = parse_taxonomy_archive(source, extra_type_bases)
    return merge_catalogs(
        {date: catalog_from_version(v) for date, v in sorted(versions.items())}
    )


# ---------------------------------------------------------------------------
# K5: taxonomy metadata JSON (reference arelle_interface.py:92-166,
# taxonomy.py:265-297)
# ---------------------------------------------------------------------------

def _concept_metadata(version: TaxonomyVersion, concept: Concept) -> dict:
    refs_out: dict = {}
    for role_uri, part_lists in version.references.get(concept.name, {}).items():
        # Arelle's roleTypeDefinition: the reference role's definition text
        # ('Account', 'Form Location'), falling back to the URI local name.
        role = version.role_definitions.get(role_uri, _local(role_uri))
        refs_out[role] = part_lists
        # reference flattens single-part single-entry references
        if (
            len(part_lists) == 1
            and len(part_lists[0]) == 1
            and role in part_lists[0]
        ):
            refs_out[role] = part_lists[0][role]
    return {
        "name": snakecase(concept.name),
        "references": refs_out,
        "calculations": [
            {"name": snakecase(child), "weight": weight}
            for child, weight in version.calculations.get(concept.name, [])
        ],
        "balance": concept.balance,
    }


def metadata_from_versions(versions: dict[str, TaxonomyVersion]) -> dict:
    """K5: {table_name: {column_name: metadata}} across all versions,
    later versions updating earlier (reference dict.update order)."""
    out: dict[str, dict] = {}
    for _date, version in sorted(versions.items()):
        for role_uri, role in version.roles.items():
            if not version.presentation.get(role_uri):
                continue
            cleaned = clean_table_name(role.definition)
            if cleaned is None:
                continue
            children, roots = _role_children(version, role_uri)
            for period_type in ("duration", "instant"):
                table_meta: dict[str, dict] = {}

                def walk(node_id: str, seen: set[str]) -> None:
                    if node_id in seen:
                        return
                    seen.add(node_id)
                    for child_id in children.get(node_id, []):
                        child = version.concepts_by_id.get(child_id)
                        if child is None:
                            continue
                        if children.get(child_id):
                            walk(child_id, seen)
                        elif (
                            not child.name.endswith("Axis")
                            and child.period_type == period_type
                        ):
                            table_meta[snakecase(child.name)] = _concept_metadata(
                                version, child
                            )

                for root in roots:
                    walk(root, set())
                key = f"{cleaned}_{period_type}"
                out.setdefault(key, {}).update(table_meta)
    return out
