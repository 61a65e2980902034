"""Remote DTS resolution: the reference's retry/cache semantics
(ref:arelle_interface.py:16-31) around an injectable fetcher — no
network in this environment, so fakes exercise the policy, the cache,
and the transitive closure."""

from __future__ import annotations

import pytest

from ferc_xbrl_extractor_spark.catalog.remote_dts import (
    fetch_with_retry,
    resolve_remote_dts,
)
from ferc_xbrl_extractor_spark.catalog.taxonomy_xml import (
    TaxonomyVersion,
    _parse_schema,
)

BASE = "https://example.com/types-base.xsd"
MID = "https://example.com/types-mid.xsd"

# archive-shipped schema: declares a concept whose type derives from a
# chain defined only in REMOTE schemas (mid -> base -> xbrli monetary)
LOCAL_XSD = f"""<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema"
           xmlns:xbrli="http://www.xbrl.org/2003/instance">
  <xs:import namespace="http://example.com/mid" schemaLocation="{MID}"/>
  <xs:import namespace="local" schemaLocation="other-local.xsd"/>
  <xs:element name="RateBaseAmount" id="rate_base"
              type="mid:MidType" xbrli:periodType="instant"/>
</xs:schema>
"""

# NOTE: the import here is RELATIVE ("types-base.xsd") — a fetched remote
# schema resolves relative schemaLocations against its own URL (the
# common XSD idiom); the closure must urljoin it to BASE.
MID_XSD = """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:import namespace="http://example.com/base" schemaLocation="types-base.xsd"/>
  <xs:complexType name="MidType">
    <xs:simpleContent><xs:restriction base="base:BaseType"/></xs:simpleContent>
  </xs:complexType>
</xs:schema>
"""

BASE_XSD = """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema"
           xmlns:xbrli="http://www.xbrl.org/2003/instance">
  <xs:complexType name="BaseType">
    <xs:simpleContent><xs:restriction base="xbrli:monetaryItemType"/></xs:simpleContent>
  </xs:complexType>
</xs:schema>
"""

DOCS = {MID: MID_XSD.encode(), BASE: BASE_XSD.encode()}


def _version_with_remote_chain() -> TaxonomyVersion:
    v = TaxonomyVersion()
    _parse_schema(v, LOCAL_XSD.encode())
    return v


def test_parse_schema_records_absolute_remote_refs_only():
    v = _version_with_remote_chain()
    assert v.remote_refs == {MID}  # relative locations are archive members


def test_fetch_with_retry_backoff_matches_reference():
    calls, sleeps = [], []
    attempts = {"n": 0}

    def flaky(url):
        calls.append(url)
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise OSError("connection reset")
        return b"payload"

    out = fetch_with_retry(
        "https://example.com/x.xsd", fetcher=flaky, sleep=sleeps.append
    )
    assert out == b"payload"
    assert len(calls) == 3
    assert sleeps == [2, 4]  # 2**(try+1), the reference's ladder


def test_fetch_with_retry_exhausts_and_reraises():
    sleeps = []

    def always_down(url):
        raise OSError("boom")

    with pytest.raises(OSError, match="boom"):
        fetch_with_retry(
            "https://example.com/x.xsd",
            fetcher=always_down,
            max_retries=3,
            sleep=sleeps.append,
        )
    assert sleeps == [2, 4]  # max_retries - 1 backoffs, then the raise


def test_resolve_remote_dts_transitive_closure_resolves_types():
    v = _version_with_remote_chain()
    assert v.base_type("MidType") == "string"  # unresolved before
    assert "MidType" in v.unresolved_types

    fetched = []

    def fetcher(url):
        fetched.append(url)
        return DOCS[url]

    resolved = resolve_remote_dts(v, fetcher=fetcher, sleep=lambda s: None)
    # mid discovered base transitively
    assert resolved == [MID, BASE] and fetched == [MID, BASE]
    assert v.base_type("MidType") == "decimal"  # monetaryItemType base
    assert "MidType" not in v.unresolved_types


def test_resolve_remote_dts_cache_short_circuits_fetch(tmp_path):
    v1 = _version_with_remote_chain()
    resolve_remote_dts(
        v1, fetcher=DOCS.__getitem__, cache_dir=tmp_path, sleep=lambda s: None
    )
    assert len(list(tmp_path.iterdir())) == 2

    v2 = _version_with_remote_chain()
    def no_network(url):
        raise AssertionError("cache should have answered")

    resolved = resolve_remote_dts(
        v2, fetcher=no_network, cache_dir=tmp_path, sleep=lambda s: None
    )
    assert resolved == [MID, BASE]
    assert v2.base_type("MidType") == "decimal"


def test_resolve_remote_dts_bounds_runaway_closure():
    v = TaxonomyVersion()
    v.remote_refs.add("https://example.com/s0.xsd")
    n = {"i": 0}

    def endless(url):
        n["i"] += 1
        nxt = f"https://example.com/s{n['i']}.xsd"
        return (
            '<?xml version="1.0"?>'
            '<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">'
            f'<xs:import schemaLocation="{nxt}"/></xs:schema>'
        ).encode()

    resolved = resolve_remote_dts(
        v, fetcher=endless, max_schemas=5, sleep=lambda s: None
    )
    assert len(resolved) == 5  # bounded, loudly warned, no infinite loop


def test_fetch_with_retry_rejects_zero_attempts():
    with pytest.raises(ValueError, match="max_retries"):
        fetch_with_retry("https://example.com/x.xsd", fetcher=lambda u: b"",
                         max_retries=0)
