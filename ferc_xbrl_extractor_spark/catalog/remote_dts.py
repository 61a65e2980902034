"""Remote DTS (discoverable taxonomy set) resolution.

The reference follows HTTP schema references through Arelle with a web
cache and a bounded retry loop — up to ``max_retries`` attempts with
exponential backoff ``2**(try+1)`` seconds
(ref:src/ferc_xbrl_extractor/arelle_interface.py:16-31, default 7
attempts). This engine is offline-by-design: ``parse_taxonomy_version``
resolves archive-shipped types only and diagnoses the rest via
``TaxonomyVersion.unresolved_types``. This module closes the remaining
gap with the same semantics, WITHOUT baking a network dependency into
the parse path:

- :func:`fetch_with_retry` — the reference's retry/backoff policy around
  an injectable ``fetcher`` callable. The default fetcher uses stdlib
  urllib (only touched when resolution is explicitly requested; this
  build environment has no network, so tests inject fakes — the policy,
  cache, and closure logic are what is exercised).
- :func:`resolve_remote_dts` — transitively fetch + parse every
  ``remote_refs`` schema a taxonomy version recorded (xs:import /
  xs:include with absolute URLs), layering their type derivations and
  concepts into the version, with an optional on-disk cache (the Arelle
  web-cache analog) so repeated loads never re-fetch.

Driver-side by design: the DTS closure of a FERC taxonomy is tens of
small schemas, fetched once per run and broadcast implicitly through
the TableSpec catalog — this is metadata resolution, not data-plane
work, so there is nothing to distribute.
"""

from __future__ import annotations

import hashlib
import logging
import time
from collections.abc import Callable
from pathlib import Path

from .taxonomy_xml import TaxonomyVersion, _parse_schema

_LOG = logging.getLogger(__name__)

Fetcher = Callable[[str], bytes]


def _default_fetcher(url: str) -> bytes:
    from urllib.request import urlopen

    with urlopen(url, timeout=30) as resp:  # noqa: S310 (explicit opt-in)
        return resp.read()


def fetch_with_retry(
    url: str,
    fetcher: Fetcher | None = None,
    max_retries: int = 7,
    sleep: Callable[[float], None] = time.sleep,
) -> bytes:
    """Fetch ``url`` with the reference's retry policy: up to
    ``max_retries`` attempts; attempt ``i`` (0-based) failing sleeps
    ``2**(i+1)`` seconds before the next; the last failure re-raises
    (ref:arelle_interface.py:16-31)."""
    if max_retries < 1:
        raise ValueError("max_retries must be >= 1 (attempts, not retries)")
    fetcher = fetcher or _default_fetcher
    for try_count in range(max_retries):
        try:
            return fetcher(url)
        except Exception as err:
            if try_count + 1 == max_retries:
                raise
            backoff = 2 ** (try_count + 1)
            _LOG.warning(
                "fetch %s failed try #%d (%s), retrying in %ds",
                url, try_count, err, backoff,
            )
            sleep(backoff)
    raise RuntimeError("unreachable: loop re-raises on final attempt")


def _schema_locations(data: bytes, base_url: str) -> set[str]:
    """Every xs:import/xs:include schemaLocation in a FETCHED schema,
    resolved to absolute URLs: remote documents resolve their RELATIVE
    locations against the document URL (the common XSD idiom, and what
    the reference's Arelle loader does) — unlike archive members, whose
    relative locations are sibling archive files and parse in the normal
    sweep."""
    import xml.etree.ElementTree as ET
    from urllib.parse import urljoin

    out: set[str] = set()
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        return out
    xs = "{http://www.w3.org/2001/XMLSchema}"
    for kind in ("import", "include"):
        for el in root.iter(f"{xs}{kind}"):
            loc = el.get("schemaLocation")
            if loc:
                out.add(urljoin(base_url, loc))
    return out


def resolve_remote_dts(
    version: TaxonomyVersion,
    fetcher: Fetcher | None = None,
    cache_dir: str | Path | None = None,
    max_retries: int = 7,
    max_schemas: int = 100,
    sleep: Callable[[float], None] = time.sleep,
) -> list[str]:
    """Follow the version's remote schema references transitively,
    parsing each fetched schema into the version (type derivations,
    concepts, roles layer in exactly like archive members).

    ``cache_dir``: optional on-disk web cache — each URL's bytes land in
    ``<cache_dir>/<md5(url)>.xsd`` and later resolutions read the file
    instead of fetching (the Arelle web-cache analog; safe to share
    across runs). Returns the list of URLs resolved (fetched or cached),
    in resolution order. ``max_schemas`` bounds runaway closures.

    Types that previously fell into ``unresolved_types`` get another
    chance: the set is cleared so the next ``base_type`` probe re-walks
    the (now deeper) derivation chains.
    """
    cache = Path(cache_dir) if cache_dir is not None else None
    if cache is not None:
        cache.mkdir(parents=True, exist_ok=True)
    resolved: list[str] = []
    seen: set[str] = set()
    frontier = sorted(version.remote_refs)
    while frontier:
        if len(resolved) >= max_schemas:
            _LOG.warning(
                "remote DTS closure exceeded max_schemas=%d; remaining "
                "references unresolved: %s", max_schemas, frontier,
            )
            break
        url, *frontier = frontier
        if url in seen:
            continue
        seen.add(url)
        data: bytes | None = None
        cpath = (
            cache / (hashlib.md5(url.encode()).hexdigest() + ".xsd")
            if cache is not None
            else None
        )
        if cpath is not None and cpath.exists():
            data = cpath.read_bytes()
        if data is None:
            data = fetch_with_retry(
                url, fetcher=fetcher, max_retries=max_retries, sleep=sleep
            )
            if cpath is not None:
                cpath.write_bytes(data)
        _parse_schema(version, data)
        resolved.append(url)
        # newly-discovered transitive references join the frontier —
        # resolved against THIS document's URL, so relative
        # schemaLocations inside fetched schemas follow correctly
        frontier.extend(
            sorted(
                u
                for u in _schema_locations(data, url)
                if u not in seen and u.startswith(("http://", "https://"))
            )
        )
    if resolved:
        # previously-defaulted types may now resolve; re-diagnose lazily
        version.unresolved_types.clear()
    return resolved
