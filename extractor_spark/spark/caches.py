"""Registry for persisted/checkpointed intermediates that back LAZY query
results (LSH signature DFs, connected-components label checkpoints).

A query that returns a DataFrame built on a persisted intermediate cannot
unpersist it before returning — the result hasn't been computed yet.  The
contract: the producer registers the intermediate here; consumers call
``retire_all()`` (via ``queries.release_query_caches``) after collecting.
Each producer also retires its own predecessor on re-invocation, so the
live set is bounded by the number of distinct cache-producing queries, not
by invocation count.

localCheckpoint needs special handling: ``DataFrame.unpersist()`` is a
no-op for it (the storage belongs to the internal RDD, not the cache
manager), so checkpointed producers register a JVM-RDD handle captured by
diffing ``getPersistentRDDs`` around the checkpoint call (verified
empirically on Spark 4.1: only ``jrdd.unpersist()`` releases the blocks).

OWNERSHIP
---------
``LIVE`` is a session-global registry with SINGLE-THREADED intent: queries
are invoked sequentially (driver harness, bench.py, tests), and
``retire_all()`` deliberately clears everything a consumer has finished
with.  A concurrent caller could retire another in-flight query's
checkpoint — callers that interleave cache-producing work inside a larger
job must use :func:`scope` (curate does), which retires only registrations
made inside the with-block.  Pinned by tests/test_caches_scope.py.
"""

from __future__ import annotations

import contextlib
import threading

LIVE: list = []

# Serializes the snapshot → localCheckpoint → diff capture pattern
# (persistent_ids / checkpoint_handles_since) for callers that run
# checkpoint-producing loops CONCURRENTLY (webgraph.spam_mass_ranks runs
# the pagerank and trustrank loops on two threads).  Without it, thread
# A's id-diff can capture thread B's just-created checkpoint RDD and later
# unpersist it out from under B — a lineage-truncated RDD cannot be
# recomputed.  Uncontended in every single-threaded caller.
CKPT_LOCK = threading.RLock()


def register(handle) -> None:
    """``handle`` is anything with .unpersist(): a persisted DataFrame or a
    JvmRddHandle from :func:`checkpoint_handles_since`."""
    LIVE.append(handle)


def retire_all() -> None:
    while LIVE:
        try:
            LIVE.pop().unpersist()
        except Exception:
            pass


def retire_since(mark: int) -> None:
    """Retire only entries registered after ``mark`` (= len(LIVE) snapshot).
    For composite jobs (curate) that consume a cache-producing sub-query
    internally without touching caches owned by unrelated pending queries."""
    while len(LIVE) > mark:
        try:
            LIVE.pop().unpersist()
        except Exception:
            pass


@contextlib.contextmanager
def scope():
    """Scoped ownership: retires (on exit, including on error) only the
    caches registered INSIDE the with-block.  Registrations made before
    entry — owned by pending lazy query results elsewhere — are untouched.
    This is the sanctioned way for a composite job to consume
    cache-producing sub-queries without the session-global ``retire_all``
    footgun (round-3 verdict item 7)."""
    mark = len(LIVE)
    try:
        yield
    finally:
        retire_since(mark)


class JvmRddHandle:
    """Unpersist wrapper around a JVM RDD (the only way to release a
    localCheckpoint's blocks)."""

    def __init__(self, jrdd):
        self._jrdd = jrdd

    def unpersist(self) -> None:
        self._jrdd.unpersist(False)


def persistent_ids(sc) -> set:
    jmap = sc._jsc.getPersistentRDDs()
    ids, it = set(), jmap.entrySet().iterator()
    while it.hasNext():
        ids.add(it.next().getKey())
    return ids


def checkpoint_handles_since(sc, before: set) -> list:
    """JVM handles for persistent RDDs that appeared after ``before`` was
    snapshotted — i.e. the blocks an eager localCheckpoint just stored."""
    handles, it = [], sc._jsc.getPersistentRDDs().entrySet().iterator()
    while it.hasNext():
        e = it.next()
        if e.getKey() not in before:
            handles.append(JvmRddHandle(e.getValue()))
    return handles
