"""Round-4 curation-rule operators: Gopher quality flags, C4 line filters,
DSIR importance weights.

The driver's 50 oracled registry slots are full, so these are rows-only
there — but gopher/c4 get full DuckDB-twin equality HERE (same strength
as the oracle gate, pinned in-repo), and DSIR gets property gates
(determinism, finiteness, en-vs-non-en separation, bucket bound).
"""

import duckdb
import pytest

from extractor_spark.spark.queries import (
    _C4_DUCK,
    _C4_SPARK,
    _GOPHER_DUCK,
    _GOPHER_SPARK,
    QUERIES,
    _views,
)

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def spark():
    from extractor_spark.spark.session import get_spark

    s = get_spark("curation-rules-tests", cpus=8)
    yield s


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize(
    "spark_sql,duck_sql", [(_GOPHER_SPARK, _GOPHER_DUCK), (_C4_SPARK, _C4_DUCK)]
)
@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_rule_query_matches_duckdb_twin(spark, spark_sql, duck_sql, sf_dir):
    _views(spark, sf_dir)
    sdf = spark.sql(spark_sql).toPandas()
    odf = _duck(sf_dir).execute(duck_sql).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    cols = sorted(sdf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(s) == len(o) and len(s) > 0
    import pandas as pd

    pd.testing.assert_frame_equal(s, o, check_dtype=False)


def test_gopher_flags_on_engineered_docs(spark):
    """Each Gopher rule must fire on a doc engineered to violate exactly it."""
    good_words = ("the quick brown fox and that dog have fun with it . " * 10).split()
    docs = [
        (1, " ".join(good_words)),  # passes everything
        (2, "short text the and of"),  # n_words < 50
        (3, " ".join(["####"] * 60) + " the and that have with be to of"),  # symbols/alpha
        (4, "\n".join(["- bullet item the and that have" + " w" * 44] * 10)),  # bullets
    ]
    import pandas as pd

    spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "text"])
    ).createOrReplaceTempView("documents")
    rows = {r["doc_id"]: r.asDict() for r in spark.sql(_GOPHER_SPARK).collect()}
    assert rows[1]["gopher_pass"] is True
    assert rows[2]["gopher_pass"] is False and rows[2]["n_words"] < 50
    assert rows[3]["gopher_pass"] is False
    assert rows[3]["symbol_ratio_milli"] > 100 or rows[3]["alpha_ratio_milli"] < 800
    assert rows[4]["gopher_pass"] is False and rows[4]["bullet_ratio_milli"] > 900


def test_c4_rules_on_engineered_docs(spark):
    import pandas as pd

    docs = [
        # 3 well-formed sentences on their own lines -> keep
        (1, "This is a proper sentence one.\nAnother full sentence right here.\nAnd a third complete sentence now."),
        # javascript line + short lines -> only 2 keepable -> drop
        (2, "Please enable javascript to continue browsing.\nok.\nAnother full sentence right here.\nAnd a third complete sentence now."),
        # lorem ipsum -> drop
        (3, "Lorem ipsum dolor sit amet something.\nAnother full sentence right here.\nAnd a third complete sentence now."),
        # brace -> drop
        (4, "This sentence mentions a { brace token.\nAnother full sentence right here.\nAnd a third complete sentence now."),
        # no terminal punctuation -> lines dropped
        (5, "no punctuation here at all\nstill none in this line\nnor in this final one"),
    ]
    spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "text"])
    ).createOrReplaceTempView("documents")
    rows = {r["doc_id"]: r.asDict() for r in spark.sql(_C4_SPARK).collect()}
    assert rows[1]["c4_keep"] is True and rows[1]["n_kept_lines"] == 3
    assert rows[2]["c4_keep"] is False and rows[2]["n_kept_lines"] == 2
    assert rows[3]["c4_keep"] is False and rows[3]["has_lorem"] is True
    assert rows[4]["c4_keep"] is False and rows[4]["has_brace"] is True
    assert rows[5]["c4_keep"] is False and rows[5]["n_kept_lines"] == 0


def test_dsir_importance_gates(spark):
    fn, _ = QUERIES["dsir_importance"]
    out1 = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    out2 = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    assert out1 == out2, "DSIR scores must be deterministic"
    assert 0 < len(out1) <= 200
    scores = {doc_id: imp for doc_id, _nf, imp in out1}
    assert all(isinstance(v, int) for v in scores.values()), "scores must be atomic ints"

    # separation: with target = English docs, English docs should dominate
    # the top of the importance ranking
    _views(spark, SF_DIR)
    langs = {
        r["doc_id"]: r["lang"]
        for r in spark.table("documents").select("doc_id", "lang").collect()
    }
    top50 = [doc_id for doc_id, _nf, _imp in out1[:50]]
    en_frac_top = sum(langs[d] == "en" for d in top50) / len(top50)
    en_frac_all = sum(v == "en" for v in langs.values()) / len(langs)
    assert en_frac_top > en_frac_all + 0.2, (en_frac_top, en_frac_all)


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_line_dedup_matches_duckdb_twin(spark, sf_dir):
    from extractor_spark.spark.queries import _LINE_DEDUP_DUCK, _LINE_DEDUP_SPARK

    _views(spark, sf_dir)
    sdf = spark.sql(_LINE_DEDUP_SPARK).toPandas()
    odf = _duck(sf_dir).execute(_LINE_DEDUP_DUCK).df()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    s = sdf[cols].sort_values("doc_id").reset_index(drop=True)
    o = odf[cols].sort_values("doc_id").reset_index(drop=True)
    assert len(s) == len(o) and len(s) > 0
    import pandas as pd

    pd.testing.assert_frame_equal(s, o, check_dtype=False)


def test_line_dedup_removes_cross_corpus_boilerplate(spark):
    """A nav line shared by >2 docs disappears from every doc; unique lines
    survive in original order; a doc of pure boilerplate ends up empty."""
    import pandas as pd

    nav = "Home | About | Contact"
    docs = [
        (1, f"{nav}\nUnique first line one.\nAnother unique line."),
        (2, f"{nav}\nDifferent body text here."),
        (3, f"{nav}\nThird doc body."),
        (4, nav),  # nothing but boilerplate
        (5, "Entirely unique document.\nSecond unique line."),
    ]
    spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "text"])
    ).createOrReplaceTempView("documents")
    from extractor_spark.spark.queries import _LINE_DEDUP_SPARK

    rows = {r["doc_id"]: r.asDict() for r in spark.sql(_LINE_DEDUP_SPARK).collect()}
    assert rows[1]["deduped_text"] == "Unique first line one.\nAnother unique line."
    assert rows[2]["deduped_text"] == "Different body text here."
    assert rows[4]["deduped_text"] == "" and rows[4]["n_lines_kept"] == 0
    assert rows[5]["deduped_text"] == "Entirely unique document.\nSecond unique line."
    assert rows[1]["n_lines_in"] == 3 and rows[1]["n_lines_kept"] == 2


def test_meta_blocking_prune_gates(spark):
    """SparkER WNP gates: (1) kept edges are a subset of the unpruned
    candidate set; (2) pruning actually removes the low-weight tail;
    (3) true near-dup pairs (exact Jaccard >= 0.8 twin) that were in the
    candidate set survive pruning — high-similarity pairs share many
    bands, so their weights sit above the endpoint means; (4) determinism."""
    from extractor_spark.spark.queries import QUERIES, release_query_caches

    fn, _ = QUERIES["meta_blocking_prune"]
    kept1 = {(r["d1"], r["d2"]): r["weight"] for r in fn(spark, SF_DIR).collect()}
    release_query_caches()
    kept2 = {(r["d1"], r["d2"]): r["weight"] for r in fn(spark, SF_DIR).collect()}
    release_query_caches()
    assert kept1 == kept2, "meta-blocking must be deterministic"
    assert kept1, "pruned edge set is empty"

    cand_fn, _ = QUERIES["minhash_lsh_candidates"]
    candidates = {(r["d1"], r["d2"]) for r in cand_fn(spark, SF_DIR).collect()}
    assert set(kept1) <= candidates, "pruned edges must come from the candidate set"
    assert len(kept1) < len(candidates), (
        "WNP should drop the low-weight tail", len(kept1), len(candidates))

    # exact Jaccard >= 0.8 true pairs via the registered oracle query
    from extractor_spark.spark.queries import _JACCARD_SPARK

    _views(spark, SF_DIR)
    jrows = spark.sql(_JACCARD_SPARK).collect()
    cols = jrows[0].asDict().keys() if jrows else []
    key1, key2 = list(cols)[:2]
    true_pairs = {(r[key1], r[key2]) for r in jrows}
    covered = true_pairs & candidates
    assert covered, "no true pairs in candidate set (fixture drift?)"
    survived = covered & set(kept1)
    recall = len(survived) / len(covered)
    # meta-blocking deliberately trades a little recall for candidate-set
    # pruning (SparkER reports single-digit-% loss); measured here: 25/28
    # = 0.893 at sf0.001 with ~40% of candidate edges pruned
    assert recall >= 0.85, (recall, len(survived), len(covered))


def test_dsir_scores_match_pandas_reference(spark):
    """Numeric twin of DSIR scoring: take the SAME hashed gram->bucket
    stream Spark computes (xxhash64 has no Python twin, so bucketing is
    shared), then recompute the add-one-smoothed log-ratio model and
    per-doc mean scores in pandas/numpy and demand equality with the
    query's importance_micro output — oracle-strength for everything
    downstream of the hash."""
    import numpy as np
    from pyspark.sql import functions as F

    from extractor_spark.spark.queries import QUERIES

    B = 4096
    _views(spark, SF_DIR)
    docs = spark.table("documents").filter(F.length(F.trim(F.col("text"))) > 0)
    words = docs.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_target"),
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("w"),
    )
    grams = words.select(
        "doc_id",
        "is_target",
        F.explode(
            F.concat(
                F.col("w"),
                F.zip_with(
                    F.slice(F.col("w"), 1, F.greatest(F.size("w") - 1, F.lit(0))),
                    F.slice(F.col("w"), 2, F.greatest(F.size("w") - 1, F.lit(0))),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
            )
        ).alias("gram"),
    ).filter(F.col("gram") != "")
    pdf = grams.select(
        "doc_id",
        "is_target",
        F.pmod(F.xxhash64("gram"), F.lit(B)).alias("bucket"),
    ).toPandas()

    raw_cnt = pdf.groupby("bucket").size()
    tgt_cnt = pdf[pdf["is_target"]].groupby("bucket").size()
    raw_total, tgt_total = len(pdf), int(pdf["is_target"].sum())
    log_ratio = {}
    for b in raw_cnt.index:
        t = int(tgt_cnt.get(b, 0))
        r = int(raw_cnt[b])
        log_ratio[b] = np.log((t + 1) / (tgt_total + B)) - np.log(
            (r + 1) / (raw_total + B)
        )
    pdf["lr"] = pdf["bucket"].map(log_ratio)
    ref = (
        pdf.groupby("doc_id")["lr"]
        .agg(["count", "sum"])
        .assign(micro=lambda d: (d["sum"] / d["count"] * 1e6).round().astype("int64"))
    )

    fn, _ = QUERIES["dsir_importance"]
    got = {r["doc_id"]: (r["n_features"], r["importance_micro"])
           for r in fn(spark, SF_DIR).collect()}
    assert got, "empty DSIR output"
    for doc_id, (nf, micro) in got.items():
        assert nf == int(ref.loc[doc_id, "count"]), (doc_id, nf)
        # float-sum association order differs between engines; at micro
        # resolution the mean is identical or off by at most 1 ulp-rounded unit
        assert abs(micro - int(ref.loc[doc_id, "micro"])) <= 1, (
            doc_id, micro, int(ref.loc[doc_id, "micro"]))


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_ngram_decontaminate_matches_duckdb_twin(spark, sf_dir):
    import pandas as pd

    from extractor_spark.spark.queries import (
        _NGRAM_DECON_DUCK,
        _NGRAM_DECON_SPARK,
    )

    _views(spark, sf_dir)
    sdf = spark.sql(_NGRAM_DECON_SPARK).toPandas()
    odf = _duck(sf_dir).execute(_NGRAM_DECON_DUCK).df()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    s = sdf[cols].sort_values("doc_id").reset_index(drop=True)
    o = odf[cols].sort_values("doc_id").reset_index(drop=True)
    assert len(s) == len(o)
    pd.testing.assert_frame_equal(s, o, check_dtype=False)


def test_ngram_decontaminate_catches_partial_inclusion(spark):
    """The point of n-gram (vs whole-doc) decontamination: a training doc
    QUOTING 8+ consecutive benchmark words is flagged even though its
    fingerprint differs; a paraphrase sharing no 8-gram is not."""
    import pandas as pd

    bench = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    docs = [
        (1, bench),  # contamination set (doc_id < 10)
        (10, "Intro words then " + bench + " and a different tail."),  # quotes it
        (11, "alpha bravo charlie delta echo foxtrot golf DIFFERENT india juliett x"),  # breaks every 8-gram
        (12, "entirely unrelated text with plenty of its own words to spare here"),
    ]
    spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "text"])
    ).createOrReplaceTempView("documents")
    from extractor_spark.spark.queries import _NGRAM_DECON_SPARK

    rows = {r["doc_id"]: r.asDict() for r in spark.sql(_NGRAM_DECON_SPARK).collect()}
    assert 10 in rows and rows[10]["n_shared_distinct"] >= 1
    assert 11 not in rows and 12 not in rows


# ---------------------------------------------------------------------------
# fastText-style hashed linear classifier + Efraimidis–Spirakis sampling
# ---------------------------------------------------------------------------

def _ft_reference(sf_dir):
    """Pandas twin of _fasttext_quality_score built on the bit-identical
    Murmur3 reimplementation — exact-integer, so equality is exact."""
    import re

    import pandas as pd

    from extractor_spark.spark.queries import _FT_DIM, _murmur3_32

    ws = re.compile(r"[ \t\n\x0b\f\r]+")  # Java default \s (ASCII-only)
    wcache = {}

    def w_of(bucket):
        if bucket not in wcache:
            h = _murmur3_32(("w" + str(bucket)).encode(), 42)
            wcache[bucket] = h % 2001 - 1000 if h >= 0 else ((h % 2001) + 2001) % 2001 - 1000
        return wcache[bucket]

    df = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = []
    for doc_id, text in zip(df["doc_id"], df["text"]):
        toks = [t for t in ws.split(text.strip(" ")) if t != ""]
        feats = toks + [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]
        if not feats:
            continue  # explode drops feature-less docs
        logit = 0
        for f in feats:
            h = _murmur3_32(f.encode("utf-8"), 42)
            bucket = ((h % _FT_DIM) + _FT_DIM) % _FT_DIM
            logit += w_of(bucket)
        rows.append((int(doc_id), len(feats), logit, logit > 0))
    return sorted(rows)


def test_fasttext_matches_murmur_pandas_reference(spark):
    """EXACT equality vs the pure-Python twin: pins tokenization (Java \\s,
    space-only trim), Murmur3 seed-42 bucketing, the derived integer
    weights, and the integer sum — oracle-strength end to end."""
    from extractor_spark.spark.queries import QUERIES

    fn, _ = QUERIES["fasttext_quality_score"]
    got = sorted(
        (r["doc_id"], r["n_features"], r["logit_milli"], r["ft_keep"])
        for r in fn(spark, SF_DIR).collect()
    )
    ref = _ft_reference(SF_DIR)
    assert len(got) == len(ref) and len(got) > 0
    assert got == ref


def test_fasttext_plan_broadcasts_model(spark):
    """The D-row weight table must broadcast (corpus side never shuffles
    for the join) and the per-doc sum must have a map-side partial."""
    from extractor_spark.spark.queries import QUERIES

    fn, _ = QUERIES["fasttext_quality_score"]
    plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]
    assert "partial_count" in plan or "partial" in plan.lower(), plan[:2000]


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_weighted_sample_matches_duckdb_twin(spark, sf_dir):
    """Efraimidis–Spirakis keys use arithmetic-only determinism (Knuth
    multiplicative hash), so DuckDB computes the identical sample."""
    import pandas as pd

    from extractor_spark.spark.queries import (
        _WEIGHTED_SAMPLE_DUCK,
        _WEIGHTED_SAMPLE_SPARK,
    )

    _views(spark, sf_dir)
    sdf = spark.sql(_WEIGHTED_SAMPLE_SPARK).toPandas()
    odf = _duck(sf_dir).execute(_WEIGHTED_SAMPLE_DUCK).df()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    s = sdf[cols].sort_values("doc_id").reset_index(drop=True)
    o = odf[cols].sort_values("doc_id").reset_index(drop=True)
    assert len(s) == 64 and len(o) == 64
    pd.testing.assert_frame_equal(s, o, check_dtype=False)


def test_weighted_sample_plan_is_topk_not_full_sort(spark):
    """ORDER BY + LIMIT must lower to TakeOrderedAndProject: per-partition
    top-k, only k rows leave the executors — no global sort Exchange."""
    from extractor_spark.spark.queries import QUERIES

    fn, _ = QUERIES["weighted_sample_topk"]
    plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_weighted_sample_prefers_heavy_docs(spark):
    """Selection probability must actually track weight: the drawn docs'
    mean n_chars exceeds the corpus mean (deterministic for this corpus)."""
    from extractor_spark.spark.queries import QUERIES

    fn, _ = QUERIES["weighted_sample_topk"]
    rows = fn(spark, SF_DIR).collect()
    sel_mean = sum(r["weight"] for r in rows) / len(rows)
    _views(spark, SF_DIR)
    corpus = spark.table("documents").selectExpr("avg(n_chars) AS m").collect()[0]["m"]
    assert sel_mean > corpus, (sel_mean, corpus)


def test_pca_project_matches_numpy_reference(spark):
    """Full-dataset numpy PCA (exact covariance, eigh, same sign fix) must
    agree with the distributed two-pass version within micro rounding."""
    import numpy as np
    import pandas as pd

    from extractor_spark.spark.queries import QUERIES

    fn, _ = QUERIES["pca_project"]
    got = {r["vec_id"]: (r["pc1_micro"], r["pc2_micro"])
           for r in fn(spark, SF_DIR).collect()}

    df = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    x = np.array([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    mean = x.mean(axis=0)
    xc = x - mean
    cov = xc.T @ xc / len(x)
    _vals, vecs = np.linalg.eigh(cov)
    comps = vecs[:, ::-1][:, :2].T.copy()
    for i in range(2):
        if comps[i][np.argmax(np.abs(comps[i]))] < 0:
            comps[i] = -comps[i]
    proj = xc @ comps.T
    ref = {int(v): (int(np.rint(proj[j, 0] * 1e6)), int(np.rint(proj[j, 1] * 1e6)))
           for j, v in enumerate(df["vec_id"])}

    assert set(got) == set(ref) and len(got) == len(df)
    for vid, (p1, p2) in got.items():
        r1, r2 = ref[vid]
        # partial-sum association order differs between the distributed
        # fold and the single numpy pass — ±2 micro covers it
        assert abs(p1 - r1) <= 2 and abs(p2 - r2) <= 2, (vid, (p1, p2), (r1, r2))


def test_pca_project_variance_ordering_and_determinism(spark):
    import numpy as np

    from extractor_spark.spark.queries import QUERIES

    fn, _ = QUERIES["pca_project"]
    rows1 = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    rows2 = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    assert rows1 == rows2, "PCA projection must be deterministic"
    p = np.array([(r[1], r[2]) for r in rows1], dtype=np.float64)
    assert p[:, 0].var() >= p[:, 1].var() > 0
