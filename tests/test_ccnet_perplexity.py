"""CCNet perplexity-bucketing gates (queries.ccnet_perplexity_frame).

The LM/scoring/bucketing arithmetic is pinned by an independent pandas
stupid-backoff LM: token arrays are taken FROM Spark's own tokenization
expression (so this gate isolates the new LM logic, not Java-vs-Python
locale differences in lower/split), then every count, log-prob sum,
fixed-point rounding, tertile cutoff, and bucket label is recomputed in
pure Python and compared for exact integer equality.
"""

import math
from collections import Counter, defaultdict

import pandas as pd
import pytest

from extractor_spark.spark.queries import (
    QUERIES,
    _views,
    ccnet_perplexity_frame,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from extractor_spark.spark.session import get_spark

    yield get_spark("ccnet-tests", cpus=8)


def _spark_tokens(spark, docs_df):
    """Token arrays via the SAME Spark expression the query uses."""
    from pyspark.sql import functions as F

    rows = (
        docs_df.select(
            "doc_id",
            "lang",
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda t: t != "",
            ).alias("w"),
        )
        .filter(F.size("w") > 0)
        .collect()
    )
    return [(r["doc_id"], r["lang"], list(r["w"])) for r in rows]


def _pandas_twin(token_rows):
    """Independent stupid-backoff bigram LM + tertile bucketing."""
    bg = Counter()
    ctx = Counter()
    tok = Counter()
    tot = Counter()
    for doc_id, lang, w in token_rows:
        if doc_id % 2 != 0:
            continue
        prev = ["<s>"] + w[:-1]
        for p, c in zip(prev, w):
            bg[(lang, p, c)] += 1
            ctx[(lang, p)] += 1
            tok[(lang, c)] += 1
            tot[lang] += 1
    vocab = Counter()
    for (lang, _c) in tok:
        vocab[lang] += 1

    scored = []
    for doc_id, lang, w in token_rows:
        prev = ["<s>"] + w[:-1]
        lp = 0.0
        for p, c in zip(prev, w):
            if (lang, p, c) in bg:
                lp += math.log(bg[(lang, p, c)] / ctx[(lang, p)])
            else:
                lp += math.log(0.4) + math.log(
                    (tok.get((lang, c), 0) + 1) / (tot[lang] + vocab[lang] + 1)
                )
        n = len(w)
        lp_micro = int(round(-lp / n * 1e6))
        lp_milli = math.floor((lp_micro + 500) / 1000)
        scored.append((doc_id, lang, n, lp_micro, lp_milli))

    by_lang = defaultdict(list)
    for row in scored:
        by_lang[row[1]].append(row[4])
    cuts = {}
    for lang, millis in by_lang.items():
        n = len(millis)
        hist = Counter(millis)
        cum = 0
        c1 = c2 = None
        for m in sorted(hist):
            cum += hist[m]
            if c1 is None and cum * 3 >= n:
                c1 = m
            if c2 is None and cum * 3 >= 2 * n:
                c2 = m
        cuts[lang] = (c1, c2)

    out = []
    for doc_id, lang, n, lp_micro, lp_milli in scored:
        c1, c2 = cuts[lang]
        bucket = "head" if lp_milli <= c1 else ("middle" if lp_milli <= c2 else "tail")
        out.append((doc_id, lang, n, lp_micro, bucket))
    return sorted(out)


def test_matches_pandas_twin_exactly(spark):
    _views(spark, SF_DIR)
    docs = spark.table("documents")
    got = sorted(
        (r["doc_id"], r["lang"], r["n_tokens"], r["lp_micro"], r["bucket"])
        for r in ccnet_perplexity_frame(docs).collect()
    )
    want = _pandas_twin(_spark_tokens(spark, docs))
    assert len(got) == len(want) > 0
    assert got == want


def test_registry_entry_is_deterministic(spark):
    fn, oracle = QUERIES["ccnet_perplexity"]
    assert oracle is None  # rows-only by construction
    a = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    b = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    assert a == b and len(a) > 0


def test_fluent_text_beats_scrambled_and_backoff_is_finite(spark):
    # train docs (even ids) establish the LM; doc 101 repeats the trained
    # phrase verbatim, doc 103 is rare-word soup with tokens absent from
    # train (pure backoff floor). Both odd = score-only.
    phrase = "the quick brown fox jumps over the lazy dog . "
    docs = [
        (0, "en", phrase * 30),
        (2, "en", phrase * 30),
        (4, "en", "a different but common sentence appears here . " * 20),
        (101, "en", phrase * 10),
        (103, "en", "zyx wvu tsr qpo nml kji hgf edc ba9 876 " * 10),
    ]
    sdf = spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "lang", "text"])
    )
    rows = {r["doc_id"]: r.asDict() for r in ccnet_perplexity_frame(sdf).collect()}
    assert set(rows) == {0, 2, 4, 101, 103}
    # fluent repeat ≪ unseen-token soup, and every score is finite
    assert rows[101]["lp_micro"] < rows[103]["lp_micro"]
    assert all(isinstance(r["lp_micro"], int) for r in rows.values())
    # the engineered corpus must agree with the twin too (exercises the
    # backoff branch inside the equality gate)
    got = sorted(
        (r["doc_id"], r["lang"], r["n_tokens"], r["lp_micro"], r["bucket"])
        for r in ccnet_perplexity_frame(sdf).collect()
    )
    assert got == _pandas_twin(_spark_tokens(spark, sdf))


def test_tertiles_are_balanced_per_lang(spark):
    _views(spark, SF_DIR)
    out = ccnet_perplexity_frame(spark.table("documents")).toPandas()
    for lang, grp in out.groupby("lang"):
        sizes = grp["bucket"].value_counts()
        n = len(grp)
        # value-cutoff tertiles: each bucket within ±20% of n/3 at this SF
        for b in ("head", "middle", "tail"):
            assert abs(sizes.get(b, 0) - n / 3) <= max(2, 0.2 * n), (lang, dict(sizes))
