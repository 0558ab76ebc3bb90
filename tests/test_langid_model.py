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


def test_trigram_regexp_matches_spec(spark):
    """The r6 regexp_extract_all trigram extraction must produce EXACTLY
    the spec form's rows (same trigrams, same order per doc) — including
    astral chars (surrogate pairs), Unicode line/paragraph separators
    (U+2028/U+2029 survive the \\s collapse: Java \\s is ASCII-only),
    NBSP, combining marks, short/empty/null texts."""
    from extractor_spark.spark.langid import _doc_trigrams_hof, doc_trigrams
    from extractor_spark.spark.queries import _views

    adversarial = [
        (0, "en", "abc def  ghi\t\njk"),
        (1, "en", "ab"),
        (2, "en", ""),
        (3, "en", None),
        (4, "en", "x y z w"),          # line/para separators
        (5, "en", "a\U0001f600b\U0001f680cd"),   # astral emoji
        (6, "en", "école française"),  # combining marks
        (7, "en", "A B C"),            # NBSP (not Java \s)
        (8, "en", "  leading and trailing  "),
        (9, "en", "ЖЩ间한🙂🙂🙂"),
    ]
    docs = spark.createDataFrame(
        adversarial, "doc_id long, lang string, text string"
    )
    got = [tuple(r) for r in doc_trigrams(docs).collect()]
    want = [tuple(r) for r in _doc_trigrams_hof(docs).collect()]
    assert sorted(got) == sorted(want) and len(want) > 20

    # and on the real corpus: exact multiset equality
    _views(spark, SF_DIR)
    corpus = spark.table("documents")
    g = Counter(tuple(r) for r in doc_trigrams(corpus).collect())
    w = Counter(tuple(r) for r in _doc_trigrams_hof(corpus).collect())
    assert g == w


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
