"""Gates for spark/pq.py (product quantization + ADC search).

- ADC exactness: every JVM-computed adc_dist equals the numpy
  reconstruction twin ‖q_norm − reconstruct(code)‖² (a different
  computation route — full-vector reconstruction vs per-subspace LUT
  sum — that is algebraically identical, so equality is ±1e-6 after the
  engine's 6-decimal rounding).
- Encoder twin: the vectorized per-batch GEMM encoder must agree with an
  independent pure-Python nested-loop argmin on every vector.
- Recall: final top-10 after exact rerank must recall the exact cosine
  top-10 (mean ≥ 0.8, min ≥ 0.6 over 10 seeded queries — measured 0.92 /
  0.80 on this corpus; quantization loss only affects shortlist
  CONTAINMENT, the rerank restores exact order).
- Plan: the ADC code scan is JVM-only (no Python eval node), shuffle-free
  before its TakeOrdered.
"""

import numpy as np
import pytest

from extractor_spark.spark.pq import adc_lut, adc_topk, encode, pq_search, train_pq

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def pq(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    codebooks = train_pq(emb)
    codes = encode(emb, codebooks).cache()
    codes.count()
    rows = emb.orderBy("vec_id").collect()
    ids = [r["vec_id"] for r in rows]
    x = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    yield emb, codebooks, codes, ids, x, xn
    codes.unpersist()


def test_encode_matches_nested_loop_twin(pq):
    emb, cb, codes, ids, x, xn = pq
    got = {r["vec_id"]: list(r["code"]) for r in codes.collect()}
    m, k, dsub = cb.shape
    for row_i in range(0, len(ids), 7):  # every 7th vector: 72 checks
        v = xn[row_i]
        want = []
        for j in range(m):
            sub = v[j * dsub : (j + 1) * dsub]
            best, best_d = -1, float("inf")
            for c in range(k):
                d = float(((sub - cb[j, c]) ** 2).sum())
                if d < best_d:
                    best, best_d = c, d
            want.append(best)
        assert got[ids[row_i]] == want, ids[row_i]


def test_adc_scores_equal_reconstruction_twin(pq):
    emb, cb, codes, ids, x, xn = pq
    q = x[ids.index(0)]
    qn = q / np.linalg.norm(q)
    m, k, dsub = cb.shape
    # full scan: no limit, every corpus row's JVM score
    full = adc_topk(codes, cb, q, topk=len(ids), exclude_vec_id=None).collect()
    code_of = {r["vec_id"]: list(r["code"]) for r in codes.collect()}
    for r in full:
        rec = np.concatenate([cb[j, code_of[r["vec_id"]][j]] for j in range(m)])
        want = float(((qn - rec) ** 2).sum())
        assert abs(r["adc_dist"] - want) < 1e-6, r["vec_id"]


def test_adc_lut_zero_query_raises(pq):
    _, cb, *_ = pq
    with pytest.raises(ValueError):
        adc_lut(cb, [0.0] * (cb.shape[0] * cb.shape[2]))


def test_recall_after_rerank(pq):
    emb, cb, codes, ids, x, xn = pq
    recalls = []
    for qi in range(0, 40, 4):
        qv = x[ids.index(qi)]
        got = {
            r["vec_id"]
            for r in pq_search(
                emb, codes, cb, qv, topk=10, exclude_vec_id=qi
            ).collect()
        }
        cos = xn @ (qv / np.linalg.norm(qv))
        exact = set(
            [ids[i] for i in np.argsort(-cos) if ids[i] != qi][:10]
        )
        recalls.append(len(exact & got) / 10)
    assert sum(recalls) / len(recalls) >= 0.8, recalls
    assert min(recalls) >= 0.6, recalls


def test_rerank_output_is_exact_cosine_on_shortlist(pq):
    """The rerank stage must produce EXACT cosine values: every returned
    (vec_id, cos_sim) equals the numpy cosine to 4 decimals."""
    emb, cb, codes, ids, x, xn = pq
    q = x[ids.index(0)]
    qn = q / np.linalg.norm(q)
    for r in pq_search(emb, codes, cb, q, topk=10, exclude_vec_id=0).collect():
        want = round(float(xn[ids.index(r["vec_id"])] @ qn), 4)
        assert abs(r["cos_sim"] - want) <= 1e-9


def test_adc_scan_plan_is_jvm_only_and_shuffle_free(pq):
    emb, cb, codes, ids, x, xn = pq
    df = adc_topk(codes, cb, x[0], topk=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan, plan
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan  # no Arrow/Batch eval in the scan


def test_query_registry_entry_runs_and_is_deterministic(spark):
    from extractor_spark.spark.queries import QUERIES

    fn = QUERIES["pq_topk"][0]
    a = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    b = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    assert a == b
    assert len(a) == 10
    assert all(vid != 0 for vid, _ in a)
