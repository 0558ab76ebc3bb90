"""Distributed connected components via min-label propagation (Pregel-lite).

One implementation shared by queries.dedup_clusters (doc_id keys) and
curate's near-dup clustering (url keys): each iteration is one shuffle
(edges ⋈ labels → groupBy min), state is localCheckpoint'ed so the plan
stays flat, convergence is detected with a changed-count action.
Iterations ∝ component diameter — near-dup clusters are band-induced
quasi-cliques, so 2-4 rounds in practice; at petabyte scale swap in
alternating large/small-star for log-diameter convergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import caches


def min_label_components(nodes: DataFrame, pairs: DataFrame, key: str) -> DataFrame:
    """``nodes``: one row per vertex with column ``key``; ``pairs``: one row
    per undirected edge with columns (src, dst) of the same type as ``key``
    (min() must order it).  Returns (``key``, cluster_id) where cluster_id
    is the minimum key reachable from the vertex (isolated vertices keep
    their own key)."""
    edges = pairs.select("src", "dst").unionAll(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sc = nodes.sparkSession.sparkContext
    edges = edges.repartition(sc.defaultParallelism, "src")
    edges.persist()
    before = caches.persistent_ids(sc)
    labels = nodes.select(F.col(key), F.col(key).alias("label")).localCheckpoint()
    prev_handles = caches.checkpoint_handles_since(sc, before)

    while True:
        nbr = (
            edges.join(labels, edges.src == labels[key])
            .select(F.col("dst").alias("_nkey"), "label")
            .groupBy("_nkey")
            .agg(F.min("label").alias("nbr_label"))
        )
        before = caches.persistent_ids(sc)
        new_labels = (
            labels.join(nbr, labels[key] == nbr._nkey, "left")
            .select(
                labels[key],
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias(
                    "label"
                ),
                (F.col("nbr_label") < F.col("label")).alias("_changed"),
            )
        ).localCheckpoint()  # truncate lineage each round.  The checkpoint
        # is eager, so once it materializes the PREVIOUS round's blocks have
        # no dependents — release them now (DataFrame.unpersist is a no-op
        # on checkpoints; only the JVM-RDD handle frees the storage), so
        # peak label storage is 2 rounds, not the whole convergence history.
        cur_handles = caches.checkpoint_handles_since(sc, before)
        for h in prev_handles:
            h.unpersist()
        prev_handles = cur_handles
        n_changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if n_changed == 0:
            break
    edges.unpersist()
    # the final checkpoint backs the (lazy) result — consumers release it
    # via queries.release_query_caches() after collecting
    for h in prev_handles:
        caches.register(h)
    return labels.withColumnRenamed("label", "cluster_id")
