"""Gates for corpus → BPE token-id shards (spark/tokenshards.py).

Equivalence chain: the map-only inline encoder is pinned two independent
ways — (a) its corpus-wide token frequencies equal ``encode_bpe_df``'s
(itself pinned in tests/test_bpe_learn.py against a dict-based reference
trainer + list-walk encoder), and (b) a pure-Python word-by-word reference
encoder reproduces every doc's id sequence exactly on the driver corpus.
Packing is pinned by the roundtrip: decoding the concatenated shards in
seq order reproduces the filtered corpus word stream in doc order, every
sequence is exactly seq_len ids except the final one, and total ids are
conserved.  Determinism across invocations closes it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from extractor_spark.spark.bpe import _EOW, learn_bpe
from extractor_spark.spark.queries import QUERIES, release_query_caches
from extractor_spark.spark.tokenshards import (
    bpe_vocab,
    decode_ids,
    encode_corpus_ids,
    pack_token_shards,
    tokenize_pack,
)

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


def _py_encode_word(word: str, merges) -> list[str]:
    """Independent reference: list-walk BPE apply, left-to-right."""
    syms = list(word) + [_EOW]
    for _rank, left, right, _n in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


def _py_words(text: str) -> list[str]:
    return [
        w
        for w in text.strip().lower().split()
        if w and all(ord(c) <= 0xFFFF for c in w)
    ]


@pytest.fixture(scope="module")
def corpus(spark):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .where("text IS NOT NULL")
    )
    merges = learn_bpe(docs, n_merges=8)
    vocab = bpe_vocab(docs, merges)
    return docs, merges, vocab


@pytest.mark.parametrize("strategy", ["join", "inline"])
def test_encoder_matches_python_reference(spark, corpus, strategy):
    docs, merges, vocab = corpus
    idx = {t: i for i, t in enumerate(vocab)}
    got = {
        r["doc_id"]: list(r["ids"])
        for r in encode_corpus_ids(docs, merges, vocab, strategy=strategy).collect()
    }
    for row in docs.collect():
        want = [
            idx[s]
            for w in _py_words(row["text"])
            for s in _py_encode_word(w, merges)
        ]
        assert got[row["doc_id"]] == want, (strategy, row["doc_id"])


def test_strategies_agree_exactly(spark, corpus):
    docs, merges, vocab = corpus
    a = {
        r["doc_id"]: list(r["ids"])
        for r in encode_corpus_ids(docs, merges, vocab, strategy="join").collect()
    }
    b = {
        r["doc_id"]: list(r["ids"])
        for r in encode_corpus_ids(docs, merges, vocab, strategy="inline").collect()
    }
    assert a == b


def test_inline_encoder_freqs_match_encode_bpe_df(spark, corpus):
    from extractor_spark.spark.bpe import encode_bpe_df

    docs, merges, vocab = corpus
    enc = encode_corpus_ids(docs, merges, vocab)
    got = {
        vocab[r["tok"]]: r["freq"]
        for r in enc.select(F.explode("ids").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .collect()
    }
    want = {
        r["token"]: r["freq"]
        for r in encode_bpe_df(docs, merges, top_k=1_000_000).collect()
    }
    assert got == want


def test_pack_roundtrip_and_length_invariants(spark, corpus):
    docs, merges, vocab = corpus
    seq_len = 128
    enc = encode_corpus_ids(docs, merges, vocab)
    shards = pack_token_shards(enc, seq_len).orderBy("seq_id").collect()
    release_query_caches()
    assert shards
    total = sum(len(r["token_ids"]) for r in shards)
    n_seq = len(shards)
    assert [r["seq_id"] for r in shards] == list(range(n_seq))
    for r in shards[:-1]:
        assert len(r["token_ids"]) == seq_len, r["seq_id"]
    assert 0 < len(shards[-1]["token_ids"]) <= seq_len
    # conservation + roundtrip against the filtered corpus word stream
    stream = [i for r in shards for i in r["token_ids"]]
    assert len(stream) == total
    want_words = [
        w
        for row in sorted(docs.collect(), key=lambda r: r["doc_id"])
        for w in _py_words(row["text"])
    ]
    assert decode_ids(stream, vocab) == want_words


def test_tokenize_pack_deterministic(spark, corpus):
    docs, _m, _v = corpus
    m1, v1, s1 = tokenize_pack(docs, n_merges=8, seq_len=128)
    rows1 = [(r["seq_id"], list(r["token_ids"])) for r in s1.orderBy("seq_id").collect()]
    release_query_caches()
    m2, v2, s2 = tokenize_pack(docs, n_merges=8, seq_len=128)
    rows2 = [(r["seq_id"], list(r["token_ids"])) for r in s2.orderBy("seq_id").collect()]
    release_query_caches()
    assert m1 == m2 and v1 == v2 and rows1 == rows2


def test_registry_query(spark):
    q = QUERIES["bpe_tokenize_pack"][0]
    df = q(spark, SF)
    rows = df.collect()
    release_query_caches()
    assert rows and [f.name for f in df.schema] == ["seq_id", "n_tokens", "ids_hash"]
    assert all(r["n_tokens"] == 128 for r in rows[:-1])
    rows2 = q(spark, SF).collect()
    release_query_caches()
    assert [tuple(r) for r in rows2] == [tuple(r) for r in rows]


def test_seeded_shuffle_pack_order(spark, corpus):
    """shuffle_seed composes packs over the seeded global order: roundtrip
    decode equals the corpus word stream in xxhash64(doc_id, seed) order,
    same seed reproduces identical packs, and the order differs from the
    doc_id-ordered packing."""
    from pyspark.sql import functions as F

    docs, merges, vocab = corpus
    enc = encode_corpus_ids(docs, merges, vocab)
    seeded = (
        pack_token_shards(enc, 128, shuffle_seed=7).orderBy("seq_id").collect()
    )
    release_query_caches()
    plain = pack_token_shards(enc, 128).orderBy("seq_id").collect()
    release_query_caches()
    stream = [i for r in seeded for i in r["token_ids"]]
    assert stream != [i for r in plain for i in r["token_ids"]]
    order = {
        r["doc_id"]: r["o"]
        for r in docs.select(
            "doc_id", F.xxhash64("doc_id", F.lit(7)).alias("o")
        ).collect()
    }
    want_words = [
        w
        for row in sorted(docs.collect(), key=lambda r: (order[r["doc_id"]], r["doc_id"]))
        for w in _py_words(row["text"])
    ]
    assert decode_ids(stream, vocab) == want_words
    again = (
        pack_token_shards(enc, 128, shuffle_seed=7).orderBy("seq_id").collect()
    )
    release_query_caches()
    assert [list(r["token_ids"]) for r in again] == [
        list(r["token_ids"]) for r in seeded
    ]
