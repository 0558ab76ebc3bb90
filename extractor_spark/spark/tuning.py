"""Scale-adaptive execution tuning for iterative operators (r6).

The power-iteration / merge-loop operators (pagerank, trustrank, HITS,
connected components, BPE learning) run O(rounds) Spark jobs over a state
frame whose size is set by the DATA (hosts, vocabulary words), not the
cluster.  With the session-wide ``spark.sql.shuffle.partitions`` (= core
count) every round schedules full-width stages — at bench scale that is
32 tasks per stage for a 53-row state, and the fixed per-task/per-stage
overhead dominates the loop (guide §2: make partitioning scale-adaptive,
derive it from input size rather than a constant tuned for either local
mode or the cluster).

``loop_partitions`` derives the loop's shuffle width from the state/edge
row count; ``scoped_loop_conf`` applies it for the duration of the loop
and restores the session conf afterwards.  In the tiny regime (≤4
partitions) AQE is also scoped off: its per-shuffle materialize/replan
barrier costs more than any re-optimization can save on single-digit-
partition exchanges, while at probe scale (e.g. 2M edges → full width)
AQE and its skew handling stay on.

Correctness note: partition-count changes can reorder floating-point
additions inside aggregations (±ulps).  Integer/min/max loops (CC, BPE)
are exactly order-independent; the double-summing graph loops are pinned
by their same-iterate numpy twins (±1e-12) and verified output-identical
at the driver SFs (OPTIMIZATION_r06.md).
"""

from __future__ import annotations

import math
from contextlib import contextmanager

# Target state/edge rows per shuffle partition inside iterative loops.
# ~50k host- or word-sized rows is well under a MB-scale partition; the
# cap at defaultParallelism keeps probe-scale runs (2M edges) at full
# cluster width.
ROWS_PER_PARTITION = 50_000


def loop_partitions(sc, n_rows: int, rows_per_partition: int = ROWS_PER_PARTITION) -> int:
    """Shuffle width for an iterative loop over ``n_rows``-row state."""
    if n_rows <= 0:
        return 1
    return max(1, min(sc.defaultParallelism, math.ceil(n_rows / rows_per_partition)))


@contextmanager
def scoped_loop_conf(spark, n_parts: int, codegen: bool = True):
    """Scope ``spark.sql.shuffle.partitions`` (and, in the tiny regime,
    AQE) to an iterative loop; always restores the previous values.

    ``codegen=False`` (graph loops only) additionally disables whole-stage
    and expression codegen IN THE TINY REGIME: every round's plan embeds
    fresh literals (the previous round's scalar), so Janino compiles new
    classes each round with zero cache hits — tens of ms per stage to
    execute over a host-sized frame where interpreted evaluation is
    trivially cheap.  Execution strategy only, results identical (same
    expression tree, same FP op order).  Loops whose per-row work is
    heavy (BPE's symbol-array fold, incdedup's signature hashing) keep
    codegen — there the compiled inner loop pays for itself."""
    conf = spark.conf
    old_parts = conf.get("spark.sql.shuffle.partitions")
    old_aqe = conf.get("spark.sql.adaptive.enabled")
    no_cg = not codegen and n_parts <= 4
    if no_cg:
        old_wscg = conf.get("spark.sql.codegen.wholeStage")
        old_fact = conf.get("spark.sql.codegen.factoryMode")
    conf.set("spark.sql.shuffle.partitions", str(n_parts))
    if n_parts <= 4:
        conf.set("spark.sql.adaptive.enabled", "false")
    if no_cg:
        conf.set("spark.sql.codegen.wholeStage", "false")
        conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try:
        yield
    finally:
        conf.set("spark.sql.shuffle.partitions", old_parts)
        conf.set("spark.sql.adaptive.enabled", old_aqe)
        if no_cg:
            conf.set("spark.sql.codegen.wholeStage", old_wscg)
            conf.set("spark.sql.codegen.factoryMode", old_fact)
