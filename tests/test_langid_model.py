"""Trained char-trigram NB language-ID gates (spark/langid.py).

Twin protocol (ccnet/lr precedent): the TRIGRAM rows are collected from
Spark's own extraction expression (isolating the classifier math from
Java-vs-Python string/regex divergence), then counting, top-K vocabulary
truncation, the micro-nat model, and per-doc scoring are all re-run in
pure Python with integer arithmetic — predictions must match EXACTLY
(scores are BIGINT sums; no float-order tolerance exists to hide behind).
"""

import math
from collections import Counter, defaultdict

import pytest

SF_DIR = "/root/testdata/sf0.001"
SCALE = 1_000_000
VOCAB = 2000


@pytest.fixture(scope="module")
def spark():
    from extractor_spark.spark.session import get_spark

    yield get_spark("langid-tests", cpus=8)


def _twin(spark):
    from extractor_spark.spark.langid import doc_trigrams
    from extractor_spark.spark.queries import _views

    _views(spark, SF_DIR)
    docs = spark.table("documents")
    rows = doc_trigrams(docs).collect()
    per_doc: dict = {}
    actual: dict = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["tri"])
        actual[r["doc_id"]] = r["lang"]

    # --- training (even half), independent of train_langid ---
    counts: dict = defaultdict(Counter)
    lang_docs = Counter()
    for d, tris in per_doc.items():
        if d % 2 == 0:
            counts[actual[d]].update(tris)
    for r in (
        docs.filter("pmod(doc_id, 2) = 0").groupBy("lang").count().collect()
    ):
        lang_docs[r["lang"]] = r["count"]
    n_docs = sum(lang_docs.values())

    model: dict = {}
    floors: dict = {}
    priors: dict = {}
    for lang, c in counts.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB]
        total = sum(cnt for _t, cnt in top)
        V = len(top) + 1
        model[lang] = {
            t: math.floor(SCALE * math.log((cnt + 1) / (total + V)))
            for t, cnt in top
        }
        floors[lang] = math.floor(SCALE * math.log(1.0 / (total + V)))
    for lang, n in lang_docs.items():
        priors[lang] = math.floor(SCALE * math.log(n / n_docs))

    preds = {}
    for d, tris in per_doc.items():
        best = None
        for lang in sorted(floors):
            s = priors[lang]
            m = model[lang]
            for t in tris:
                s += m.get(t, floors[lang])
            # argmax: score desc, lang asc (strict > keeps earlier lang on tie)
            if best is None or (s > best[0]) or (s == best[0] and lang < best[1]):
                best = (s, lang)
        preds[d] = best[1]
    return actual, preds


def test_predictions_match_integer_twin(spark):
    from extractor_spark.spark.queries import QUERIES

    fn, oracle = QUERIES["langid_ngram_model"]
    assert oracle is None
    out = {r["doc_id"]: r for r in fn(spark, SF_DIR).collect()}
    actual, preds = _twin(spark)

    assert set(out) == set(preds)
    for d, r in out.items():
        assert r["predicted_lang"] == preds[d], (d, r, preds[d])
        assert r["actual_lang"] == actual[d]
        assert r["is_train"] == (d % 2 == 0)
        assert r["correct"] == (preds[d] == actual[d])


def test_model_beats_majority_class_on_train_half(spark):
    """The model must actually learn: train-half accuracy strictly above
    the majority-class baseline (what a constant predictor scores)."""
    from extractor_spark.spark.queries import QUERIES

    fn, _ = QUERIES["langid_ngram_model"]
    rows = [r for r in fn(spark, SF_DIR).collect() if r["is_train"]]
    acc = sum(r["correct"] for r in rows) / len(rows)
    maj = Counter(r["actual_lang"] for r in rows).most_common(1)[0][1] / len(rows)
    assert acc > maj, (acc, maj)


def test_deterministic(spark):
    from extractor_spark.spark.queries import QUERIES

    fn, _ = QUERIES["langid_ngram_model"]
    a = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    b = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    assert a == b
