"""Distributed BPE merge learning (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units", ACL — public algorithm).

Training a subword vocabulary is a standard step of every large-scale
text pipeline (the reference's LLM-extraction stage consumes token
budgets; its tokenizer-side twin here already exists as the
``bpe_token_counts`` query).  This module learns the MERGE TABLE itself
from a corpus, Spark-first:

- The corpus collapses to a (word, cnt) vocabulary once — the classic
  trick that makes BPE training corpus-size-independent: at 100 TB the
  distinct-word table is ~10^8-10^9 rows while the corpus is 10^12 docs,
  and every later round touches only the vocabulary.
- Each round is exactly ONE Spark job: pair counts are a map-side-
  combined groupBy over the symbol sequences (zip_with of the sequence
  against its own tail — no posexplode of positions), the argmax row
  (count desc, pair asc — deterministic tie-break) is the only thing the
  driver ever receives, and the merge is applied JVM-side as an
  ``F.aggregate`` left-fold over each symbol array (no Python in the
  loop).  The new state takes a LAZY localCheckpoint whose materializing
  action is the next round's argmax, previous-round blocks released
  after the action — same flat-lineage protocol as webgraph.pagerank.
- Words containing astral (non-BMP) code points are filtered on BOTH
  engine and twin sides: Java regex splits strings by UTF-16 code unit,
  Python by code point, so BMP-only is the exactly-shared domain (the
  filter is a single code-point class check, applied identically).

Gates (tests/test_bpe_learn.py): exact merge-sequence equality against
an independent dict-based reference BPE trainer, overlapping-pair
left-to-right semantics ("aaaa" style), determinism, one-job-per-round
lineage flatness via the caches registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BMP_ONLY = "^[\u0000-\uffff]+$"  # Java regex: code-point class, astral excluded
_EOW = "</w>"


def _tokens(docs: DataFrame):
    return docs.select(
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda t: t != "",
            )
        ).alias("word")
    )


def learn_bpe(docs: DataFrame, n_merges: int = 24) -> list[tuple[int, str, str, int]]:
    """Learn `n_merges` BPE merges from the corpus's text column.

    Returns [(rank, left, right, pair_count), ...] in merge order —
    driver-sized by construction (one row per merge)."""
    from . import caches

    spark = docs.sparkSession
    sc = spark.sparkContext

    vocab = (
        _tokens(docs)
        .filter(F.col("word").rlike(_BMP_ONLY))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .select(
            "cnt",
            F.concat(
                # Spark split uses limit=-1 (keeps the trailing empty the
                # end-of-string lookahead produces) — drop empties
                F.filter(F.split(F.col("word"), "(?!^)"), lambda c: c != ""),
                F.array(F.lit(_EOW)),
            ).alias("sym"),
        )
    )
    before = caches.persistent_ids(sc)
    state = vocab.localCheckpoint(eager=False)
    cur_handles = caches.checkpoint_handles_since(sc, before)
    # two-generation handle ledger (pagerank protocol): a round's argmax
    # MATERIALIZES the current checkpoint, which still READS the previous
    # one — so the grandparent generation is the oldest releasable set,
    # and peak symbol-table storage is exactly two rounds
    grand_handles: list = []

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = (
            state.select(
                "cnt",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("sym"), 1, F.greatest(F.size("sym") - 1, F.lit(0))),
                        F.slice(F.col("sym"), 2, F.greatest(F.size("sym") - 1, F.lit(0))),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("n"))
        )
        # the ONE action of the round: materializes state's checkpoint
        best = pairs.orderBy(F.col("n").desc(), "l", "r").limit(1).collect()
        for h in grand_handles:
            h.unpersist()
        grand_handles = []
        if not best:
            break
        left, right, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
        merges.append((rank, left, right, n))
        if rank == n_merges - 1:
            break  # last merge learned — no next state needed
        merged = left + right
        new_state = state.select(
            "cnt",
            F.aggregate(
                F.col("sym"),
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(left))
                    & (x == F.lit(right)),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            ).alias("sym"),
        )
        before = caches.persistent_ids(sc)
        state = new_state.localCheckpoint(eager=False)
        grand_handles, cur_handles = cur_handles, caches.checkpoint_handles_since(
            sc, before
        )

    for h in grand_handles:
        h.unpersist()
    for h in cur_handles:
        h.unpersist()
    return merges


def learn_bpe_df(docs: DataFrame, n_merges: int = 24) -> DataFrame:
    """learn_bpe as a DataFrame (rank, left, right, pair_count)."""
    spark = docs.sparkSession
    rows = learn_bpe(docs, n_merges=n_merges)
    schema = "rank int, left string, right string, pair_count bigint"
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(rows, schema)
