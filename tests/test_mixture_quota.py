"""Gates for the domain-quota and mixture-resample curation queries.

Cross-engine value equality vs the DuckDB twins is already enforced by
tests/test_queries_oracle.py (TWIN_SQL fold).  This file pins the
semantic invariants and the scale-critical plan shape:

- source_quota_cap: no source exceeds the cap; the kept docs per source
  are the longest ones (md5 tiebreak only breaks n_chars ties); the
  physical plan contains WindowGroupLimit BOTH below and above the
  exchange (Spark's rank-filter pushdown) — that partial/final pair is
  what makes a 10^9-page hot domain cost top-CAP per map task instead of
  a full per-key sort, so it must not silently disappear on upgrades.
- mixture_sample: per-language draw is exactly min(budget, available),
  and the draw is deterministic across runs.
"""

from collections import Counter

import pytest

from extractor_spark.spark.queries import (
    _MIXTURE_TARGETS,
    _SOURCE_QUOTA_CAP,
    QUERIES,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def quota_rows(spark):
    return QUERIES["source_quota_cap"][0](spark, SF_DIR).collect()


def test_source_quota_never_exceeded(quota_rows):
    per_source = Counter(r["source"] for r in quota_rows)
    assert per_source, "quota query returned nothing"
    assert max(per_source.values()) <= _SOURCE_QUOTA_CAP
    # the sf0.01 corpus genuinely exercises the cap (sources above it exist)
    assert any(v == _SOURCE_QUOTA_CAP for v in per_source.values())


def test_source_quota_keeps_longest_docs(spark, quota_rows):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source", "n_chars")
        .collect()
    )
    kept = {r["doc_id"] for r in quota_rows}
    kept_min: dict[str, int] = {}
    drop_max: dict[str, int] = {}
    for r in docs:
        if r["doc_id"] in kept:
            kept_min[r["source"]] = min(
                kept_min.get(r["source"], 1 << 60), r["n_chars"]
            )
        else:
            drop_max[r["source"]] = max(drop_max.get(r["source"], -1), r["n_chars"])
    for src, dmax in drop_max.items():
        # ties at the boundary are broken by md5, so >= (not >) is the invariant
        assert kept_min[src] >= dmax, f"{src}: dropped a longer doc than one kept"


def test_source_quota_plan_has_partial_and_final_group_limit(spark):
    df = QUERIES["source_quota_cap"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partial (pre-shuffle) + final (post-shuffle) rank pushdown
    assert plan.count("WindowGroupLimit") >= 2, plan
    assert "Exchange" in plan


def test_mixture_sample_counts_and_determinism(spark):
    fn = QUERIES["mixture_sample"][0]
    rows = fn(spark, SF_DIR).collect()
    avail = Counter(
        r["lang"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("lang")
        .collect()
    )
    got = Counter(r["lang"] for r in rows)
    want = {lang: min(n, avail[lang]) for lang, n in _MIXTURE_TARGETS}
    assert got == {k: v for k, v in want.items() if v > 0}
    # at least one language must be genuinely subsampled at this SF
    assert any(got[lang] < avail[lang] for lang, _ in _MIXTURE_TARGETS)
    again = fn(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
