"""Gates for the positional phrase index (spark/phraseindex.py) and the
fused registry query (queries.py:_PHRASE_SPARK).

Equivalence chain:

- phrase_search over a STORED index ≡ brute-force Python scan (token
  arrays read from Spark's own tokenize expression, per the ccnet twin
  lesson — Java \\s and Python str.split disagree on exotic whitespace).
- the fused trigram registry query ≡ serving the same phrases from the
  stored index (so with the TWIN_SQL DuckDB gate this pins
  fused ≡ stored-index ≡ DuckDB).
- repeated-term phrases and overlapping occurrences pinned on an
  engineered corpus; serving scan's term filter reaches the parquet scan
  (PushedFilters plan gate).
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _corpus_tokens(spark, docs):
    """doc_id -> token list, using Spark's own tokenize expression."""
    from extractor_spark.spark.phraseindex import tokenize_expr

    return {
        r["doc_id"]: list(r["t"])
        for r in docs.select("doc_id", tokenize_expr().alias("t")).collect()
    }


def _brute_hits(toks_by_doc, phrases):
    out = set()
    for pid, p in enumerate(phrases):
        q = p.strip().lower().split()
        k = len(q)
        for doc_id, t in toks_by_doc.items():
            for s in range(len(t) - k + 1):
                if t[s : s + k] == q:
                    out.add((pid, doc_id, s + 1))  # 1-based start
    return out


@pytest.fixture(scope="module")
def sf_index(spark, tmp_path_factory):
    from extractor_spark.spark.phraseindex import build_phrase_index

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    path = str(tmp_path_factory.mktemp("phraseidx") / "idx")
    build_phrase_index(docs, path)
    return docs, path


def test_phrase_search_matches_bruteforce(spark, sf_index):
    from extractor_spark.spark.phraseindex import phrase_search

    docs, path = sf_index
    toks = _corpus_tokens(spark, docs)
    # phrases drawn from the corpus (varying k) + one absent phrase
    phrases = [
        " ".join(toks[3][2:5]),  # k=3
        " ".join(toks[17][0:5]),  # k=5
        " ".join(toks[42][1:3]),  # k=2
        "zzzqx never appears anywhere",
    ]
    got = {
        (r["phrase_id"], r["doc_id"], r["start"])
        for r in phrase_search(spark, path, phrases).collect()
    }
    want = _brute_hits(toks, phrases)
    assert got == want
    # the corpus-drawn phrases each hit at least their source doc
    assert {(0, 3), (1, 17), (2, 42)} <= {(p, d) for p, d, _ in got}
    assert not any(p == 3 for p, _, _ in got)


def test_repeated_terms_and_overlapping_occurrences(spark, tmp_path):
    from extractor_spark.spark.phraseindex import build_phrase_index, phrase_search

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),
            (2, "x the cat the cat the y"),
            (3, "the cat sat"),
        ],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "idx")
    build_phrase_index(docs, path, n_partitions=2)
    got = {
        (r["phrase_id"], r["doc_id"], r["start"])
        for r in phrase_search(spark, path, ["a a", "the cat the"]).collect()
    }
    assert got == {
        # "a a" overlaps itself in "a a a a": starts 1, 2, 3
        (0, 1, 1),
        (0, 1, 2),
        (0, 1, 3),
        # "the cat the" twice in doc 2 (overlapping at starts 2 and 4),
        # and NOT in doc 3 ("the cat sat" lacks the trailing "the")
        (1, 2, 2),
        (1, 2, 4),
    }


def test_candidate_and_aggregation_paths_agree(spark, sf_index):
    """The rarest-term candidate-driven path (default) and the
    aggregation fallback (forced via max_candidate_rows=0) must return
    identical rows — including k=1 phrases, which the candidate path
    answers from the rare leg alone."""
    from extractor_spark.spark.phraseindex import phrase_search

    docs, path = sf_index
    toks = _corpus_tokens(spark, docs)
    phrases = [
        " ".join(toks[3][2:5]),
        toks[17][0],  # k=1
        " ".join(toks[42][1:3]),
        "zzzqx absent",
    ]
    rows = lambda df: {(r["phrase_id"], r["doc_id"], r["start"]) for r in df.collect()}
    cand_path = rows(phrase_search(spark, path, phrases))
    agg_path = rows(phrase_search(spark, path, phrases, max_candidate_rows=0))
    assert cand_path == agg_path
    assert cand_path == _brute_hits(toks, phrases)


def test_serving_scan_pushes_term_filter(spark, sf_index):
    from extractor_spark.spark.phraseindex import phrase_search

    _, path = sf_index
    plan = phrase_search(spark, path, ["alpha beta"])._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(term" in plan
    # the bucket directories prune at planning time (≤k of 256 partitions)
    assert "PartitionFilters: [bucket" in plan and " IN (" in plan.split(
        "PartitionFilters: [bucket", 1
    )[1].split("]", 1)[0]


def test_registry_query_equals_stored_index_serving(spark, sf_index):
    from extractor_spark.spark.phraseindex import phrase_search
    from extractor_spark.spark.queries import QUERIES

    docs, path = sf_index
    toks = _corpus_tokens(spark, docs)
    # reconstruct the registry query's deterministic phrase set:
    # tokens 5..7 (1-based) of every 50th doc with ≥7 tokens
    q_docs = sorted(d for d, t in toks.items() if d % 50 == 0 and len(t) >= 7)
    phrases = [" ".join(toks[d][4:7]) for d in q_docs]
    assert phrases, "corpus must yield at least one query phrase"

    served = phrase_search(spark, path, phrases).collect()
    agg: dict = {}
    for r in served:
        key = (q_docs[r["phrase_id"]], r["doc_id"])
        n, first = agg.get(key, (0, None))
        agg[key] = (n + 1, r["start"] if first is None else min(first, r["start"]))
    want = {
        (pd, doc, phrases[q_docs.index(pd)], n, first)
        for (pd, doc), (n, first) in agg.items()
    }

    fused = QUERIES["phrase_search"][0](spark, SF).collect()
    got = {
        (r["phrase_id"], r["doc_id"], r["phrase"], r["n_hits"], r["first_pos"])
        for r in fused
    }
    assert got == want
