"""FineWeb-style composite filter chain gates (queries._FINEWEB_SPARK).

The chain composes four already-gated components (Gopher, C4, repetition,
lang-id) with identical join/threshold logic in both dialects, so the
DuckDB twin here is the same composition of the components' own pinned
twins — full-frame equality at two SFs, plus engineered docs proving the
chain actually differentiates (the synth corpus is word-soup that every
prose filter correctly rejects).
"""

import duckdb
import pandas as pd
import pytest

from extractor_spark.spark.queries import (
    _FINEWEB_DUCK,
    _FINEWEB_SPARK,
    QUERIES,
    _views,
)


@pytest.fixture(scope="module")
def spark():
    from extractor_spark.spark.session import get_spark

    yield get_spark("fineweb-chain-tests", cpus=8)


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_chain_matches_duckdb_twin(spark, sf_dir):
    _views(spark, sf_dir)
    sdf = spark.sql(_FINEWEB_SPARK).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    odf = con.execute(_FINEWEB_DUCK).df()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(s) == len(o) > 0
    pd.testing.assert_frame_equal(s, o, check_dtype=False)


GOOD = "\n".join(
    f"This proper sentence number {i} contains the good and useful words "
    "that we all need to read here today."
    for i in range(12)
)


def test_chain_differentiates_on_engineered_docs(spark):
    docs = [
        (1, GOOD),  # passes every stage
        (2, "short text the and of."),  # fails gopher (n_words < 50)
        # fails c4 only: no terminal punctuation anywhere
        (3, GOOD.replace(".", "")),
        # fails repetition only: one good line repeated 12x (dup_permille
        # = 917 > 300) — still enough distinct words for gopher
        (4, "\n".join([GOOD.splitlines()[0]] * 12)),
        # fails lang: same shape, French markers instead of English
        (5, GOOD.replace(" the ", " le ").replace(" and ", " et ")),
    ]
    spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "text"])
    ).createOrReplaceTempView("documents")
    rows = {r["doc_id"]: r.asDict() for r in spark.sql(_FINEWEB_SPARK).collect()}
    assert rows[1]["fineweb_keep"] is True
    assert rows[2]["fineweb_keep"] is False and rows[2]["gopher_pass"] is False
    assert rows[3]["fineweb_keep"] is False and rows[3]["c4_keep"] is False
    assert rows[4]["fineweb_keep"] is False and rows[4]["dup_permille"] > 300
    assert rows[5]["fineweb_keep"] is False and rows[5]["predicted_lang"] == "fr"
    # the stage flags a doc fails must be exactly the engineered ones
    assert rows[3]["gopher_pass"] is True
    assert rows[5]["gopher_pass"] is True and rows[5]["c4_keep"] is True


def test_registry_entry_oracled(spark):
    # round-5 rotation: the chain is driver-oracled via its DuckDB twin
    from extractor_spark.spark.queries import _FINEWEB_DUCK

    fn, oracle = QUERIES["fineweb_filter_chain"]
    assert oracle == _FINEWEB_DUCK
    out = fn(spark, "/root/testdata/sf0.001")
    assert out.count() == 500
