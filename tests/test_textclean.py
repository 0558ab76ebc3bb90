"""Gates for engine/textclean.py (ftfy-lite unicode sanitation) and its
Spark Arrow stage / registry query.

Strategy (no external ftfy available in the sandbox): hand-computed
goldens for every damage class, hypothesis properties (idempotence,
ASCII-cleanliness no-op, conservativeness on legit non-ASCII), and the
repo's standard Spark≡engine byte-equality gate for the Arrow stage.
"""

import unicodedata

from hypothesis import example, given, settings
from hypothesis import strategies as st

from extractor_spark.engine.textclean import sanitize_text

# (dirty, expected_clean, expected_repairs_min, expected_removed)
GOLDENS = [
    # cp1252 mojibake of ’ and — (one repair pass fixes both)
    ("the companyâ€™s results â€” strong", "the company’s results — strong", 1, 0),
    # latin-1 mojibake of é/ü
    ("rÃ©sumÃ© for MÃ¼ller", "résumé for Müller", 1, 0),
    # DOUBLE mojibake of “quoted” (two repair passes)
    ("Ã¢â‚¬Å“quotedÃ¢â‚¬Â\x9d twice", "“quoted” twice", 2, 0),
    # C0 controls stripped, \t and \n kept
    ("a\x00b\x07c\td\ne", "abc\td\ne", 0, 2),
    # zero-width + BOM + replacement char stripped
    ("zero​width‍ joiners ﻿BOM �!", "zerowidth joiners BOM !", 0, 4),
    # NFC composition (e + combining acute → é); nothing removed
    ("café nice", "café nice", 0, 0),
    # \r\n and bare \r normalize to \n (not counted as removal)
    ("a\r\nb\rc", "a\nb\nc", 0, 0),
    ("", "", 0, 0),
]


def test_goldens():
    for dirty, want, want_repairs, want_removed in GOLDENS:
        clean, repairs, removed = sanitize_text(dirty)
        assert clean == want, (dirty, clean)
        assert repairs >= want_repairs, (dirty, repairs)
        assert removed == want_removed, (dirty, removed)


def test_conservative_on_legit_text():
    """Text that merely CONTAINS suspicious characters is never rewritten:
    the round trip must strictly reduce the hint count to be accepted."""
    for s in [
        "déjà vu — l'été",
        "中文文本保持不变",
        "русский текст",
        "curly ‘quotes’ and “double” — em",
        "naïve café Müller",
    ]:
        clean, repairs, removed = sanitize_text(s)
        assert repairs == 0
        assert removed == 0
        assert clean == unicodedata.normalize("NFC", s)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
@example("\x80\xe2\xa0\xa0")  # r5 fuzz find: stripping the stray C1 byte
# UNLOCKS the 'â\xa0\xa0' -> U+2820 mojibake repair, so the single-ordering
# pipeline was not idempotent; fixed by running to a fixpoint
def test_idempotent(s):
    clean1, _, _ = sanitize_text(s)
    clean2, repairs2, removed2 = sanitize_text(clean1)
    assert clean2 == clean1
    assert removed2 == 0


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E), max_size=200
    )
)
def test_printable_ascii_is_untouched(s):
    assert sanitize_text(s) == (s, 0, 0)


def test_spark_stage_equals_engine(spark):
    """Arrow stage ≡ direct engine call, byte for byte, over the planted
    dirty docs AND a slice of the real corpus."""
    from pyspark.sql import functions as F

    from extractor_spark.spark.arrow_udfs import sanitize_text_udf
    from extractor_spark.spark.queries import _PLANTED_DIRTY

    texts = [r["text"] for r in (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("text").limit(50).collect()
    )] + list(_PLANTED_DIRTY)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = (
        df.withColumn("s", sanitize_text_udf()(F.col("text")))
        .select("text", "s.clean", "s.repairs", "s.removed")
        .collect()
    )
    for r in got:
        clean, repairs, removed = sanitize_text(r["text"])
        assert (r["clean"], r["repairs"], r["removed"]) == (clean, repairs, removed)


def test_query_planted_docs_all_repaired(spark):
    from extractor_spark.spark.queries import _PLANTED_DIRTY, QUERIES

    rows = QUERIES["unicode_sanitize_stats"][0](
        spark, "/root/testdata/sf0.001"
    ).collect()
    planted = {r["doc_id"]: r for r in rows if r["doc_id"] < 0}
    assert len(planted) == len(_PLANTED_DIRTY)
    assert all(r["changed"] for r in planted.values())
    # mojibake plants (ids -1..-3) must show repair passes, control/zw
    # plants (-4, -5) must show removals, the NFC plant (-6) neither
    assert all(planted[-i]["n_mojibake_repairs"] >= 1 for i in (1, 2, 3))
    assert all(planted[-i]["n_chars_removed"] >= 1 for i in (4, 5))
    assert planted[-6]["n_mojibake_repairs"] == 0
    assert planted[-6]["n_chars_removed"] == 0
    corpus = [r for r in rows if r["doc_id"] >= 0]
    assert corpus and all(r["clean_n_chars"] > 0 for r in corpus)
