"""Corpus-datasheet composition gates (jobs/datasheet.py).

The sections reuse operators that carry their own oracle-strength gates
(Gopher SQL, exact-dup SQL, PII spans, sanitize pass, source KL); these
tests pin the COMPOSITION: independent DuckDB recomputation of the
relational sections, engine-function recomputation of the planted Python
sections, internal consistency, and determinism.
"""

from __future__ import annotations

import duckdb
import pytest

from jobs.datasheet import build_datasheet

pytestmark = pytest.mark.spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sheet(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return build_datasheet(spark, docs, top_k=5)


def test_totals_and_sections_match_duckdb(sheet):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    t = con.execute(
        """SELECT count(*), sum(length(text)),
                  sum(len(regexp_split_to_array(trim(text), '\\s+'))),
                  count(DISTINCT lang), count(DISTINCT source)
           FROM documents"""
    ).fetchone()
    assert sheet["totals"] == {
        "docs": t[0],
        "chars": t[1],
        "tokens": t[2],
        "langs": t[3],
        "sources": t[4],
    }
    langs = dict(
        con.execute("SELECT lang, count(*) FROM documents GROUP BY lang").fetchall()
    )
    assert {k: v["docs"] for k, v in sheet["languages"].items()} == langs
    dup = con.execute(
        """SELECT count(*), coalesce(sum(n), 0), coalesce(sum(n - 1), 0) FROM (
             SELECT count(*) AS n FROM documents GROUP BY md5(text)
             HAVING count(*) > 1)"""
    ).fetchone()
    assert (
        sheet["duplication"]["exact_groups"],
        sheet["duplication"]["docs_in_dup_groups"],
        sheet["duplication"]["excess_copies"],
    ) == dup


def test_internal_consistency(sheet):
    n = sheet["totals"]["docs"]
    assert sum(v["docs"] for v in sheet["languages"].values()) == n
    assert sum(v["docs"] for v in sheet["sources"].values()) == n
    assert sum(v["chars"] for v in sheet["sources"].values()) == sheet["totals"]["chars"]
    q = sheet["quality"]
    assert 0 < q["gopher_scored"] <= n
    assert 0 <= q["gopher_passed"] <= q["gopher_scored"]
    q10, q50, q90 = q["token_quantiles_10_50_90"]
    assert q10 <= q50 <= q90
    assert 0 <= q["stopword_ratio_milli"] <= 1000
    kls = [d["kl_r4"] for d in sheet["drift_top_sources"]]
    assert kls == sorted(kls, reverse=True)
    assert all(k >= 0 for k in kls)  # Gibbs


def test_determinism(spark, sheet):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert build_datasheet(spark, docs, top_k=5) == sheet


def test_planted_composition(spark):
    """Engineered corpus: every Python-side section fires and lands in the
    right field, with expected values recomputed from the engine functions
    the sections are built on (the operators' own gates pin those)."""
    from extractor_spark.engine.piispans import pii_spans
    from extractor_spark.engine.textclean import sanitize_text

    rows = [
        (1, "duplicate body " * 20, "en", "srcA"),
        (2, "duplicate body " * 20, "en", "srcA"),   # exact dup of 1
        (3, "contact me at alice@example.com for details", "en", "srcB"),
        (4, "cafÃ© mojibake body here", "fr", "srcB"),  # cp1252 round-trip
        (5, "control\x00char body", "de", "srcC"),
        (6, "plain clean document body", "en", "srcC"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    sheet = build_datasheet(spark, docs, top_k=3)

    assert sheet["totals"]["docs"] == 6
    assert sheet["duplication"] == {
        "exact_groups": 1,
        "docs_in_dup_groups": 2,
        "excess_copies": 1,
        "excess_milli": 166,
    }
    want_pii: dict[str, int] = {}
    for _id, text, _l, _s in rows:
        for kind, *_ in pii_spans(text):
            want_pii[kind] = want_pii.get(kind, 0) + 1
    assert want_pii.get("email") == 1
    assert sheet["pii"] == want_pii
    repaired = stripped = changed = 0
    for _id, text, _l, _s in rows:
        clean, repairs, removed = sanitize_text(text)
        repaired += repairs > 0
        stripped += removed > 0
        changed += clean != text
    assert repaired >= 1 and stripped >= 1
    assert sheet["sanitize"] == {
        "docs_mojibake_repaired": repaired,
        "docs_controls_stripped": stripped,
        "docs_changed": changed,
    }
    assert set(sheet["sources"]) == {"srcA", "srcB", "srcC"}
