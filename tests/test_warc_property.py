"""Property tests: WARC writer/reader round-trip under arbitrary payloads
and prefixed garbage (hypothesis)."""

import datetime
import gzip

from hypothesis import given, settings
from hypothesis import strategies as st

from extractor_spark.engine.warc import build_warc, extract_pages

_TS = datetime.datetime(2024, 5, 1, 12, 0, 0)

_urls = st.integers(0, 10**6).map(lambda i: f"https://prop.test/p/{i}")
_payloads = st.binary(min_size=0, max_size=400)
_records = st.lists(st.tuples(_urls, st.just(_TS), _payloads), min_size=0, max_size=8)


@settings(max_examples=60, deadline=None)
@given(_records)
def test_roundtrip_property(records):
    got = list(extract_pages(build_warc(records)))
    assert [(u, p) for u, _, p in got] == [(u, p) for u, _, p in records]
    assert all(ts == _TS for _, ts, _ in got)


@settings(max_examples=30, deadline=None)
@given(_records, st.binary(max_size=64))
def test_roundtrip_gzip_with_garbage_prefix(records, garbage):
    # plain garbage before the archive must not derail record seeking;
    # per-record gzip members round-trip
    blob = build_warc(records)
    got = list(extract_pages(garbage.replace(b"WARC/", b"") + blob))
    assert len(got) == len(records)
    gz = b"".join(gzip.compress(build_warc([r])) for r in records)
    got2 = list(extract_pages(gz, gzipped=True))
    assert [(u, p) for u, _, p in got2] == [(u, p) for u, _, p in records]
