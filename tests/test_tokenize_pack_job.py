"""CLI-composition gates for jobs/tokenize_pack.py: the written shard
artifact decodes back to the filtered corpus word stream, the manifest is
consistent with the written data, and a second run reusing the written
merges table (--merges-table path) reproduces the shards byte-for-byte.
The component math is pinned in tests/test_tokenshards.py; this file pins
the composition + on-disk artifact only."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))

from extractor_spark.spark.queries import release_query_caches

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


def test_job_roundtrip_manifest_and_merge_reuse(spark, tmp_path):
    from tokenize_pack import run_job

    out1 = str(tmp_path / "run1")
    os.makedirs(out1)
    manifest = run_job(
        spark, f"{SF}/documents.parquet", out1, n_merges=8, seq_len=128
    )
    release_query_caches()
    assert manifest["seq_len"] == 128 and manifest["n_merges"] == 8
    assert manifest == json.load(open(os.path.join(out1, "manifest.json")))

    vocab = [
        r["token"]
        for r in spark.read.parquet(os.path.join(out1, "vocab"))
        .orderBy("id")
        .collect()
    ]
    assert manifest["vocab_size"] == len(vocab)
    shards = (
        spark.read.parquet(os.path.join(out1, "shards")).orderBy("seq_id").collect()
    )
    assert manifest["n_seqs"] == len(shards)
    stream = [i for r in shards for i in r["token_ids"]]
    assert manifest["n_tokens"] == len(stream)
    for r in shards[:-1]:
        assert len(r["token_ids"]) == 128

    # roundtrip vs the corpus
    from extractor_spark.spark.tokenshards import decode_ids

    docs = sorted(
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .where("text IS NOT NULL")
        .collect(),
        key=lambda r: r["doc_id"],
    )
    want_words = [
        w
        for row in docs
        for w in row["text"].strip().lower().split()
        if w and all(ord(c) <= 0xFFFF for c in w)
    ]
    assert decode_ids(stream, vocab) == want_words
    assert manifest["n_docs"] == len(docs)

    # run 2 reuses run 1's merges table: identical shards, no re-learning
    out2 = str(tmp_path / "run2")
    os.makedirs(out2)
    manifest2 = run_job(
        spark,
        f"{SF}/documents.parquet",
        out2,
        seq_len=128,
        merges_table=os.path.join(out1, "merges"),
    )
    release_query_caches()
    assert manifest2 == manifest
    shards2 = (
        spark.read.parquet(os.path.join(out2, "shards")).orderBy("seq_id").collect()
    )
    assert [(r["seq_id"], list(r["token_ids"])) for r in shards2] == [
        (r["seq_id"], list(r["token_ids"])) for r in shards
    ]
