"""Tracked operator caches.

Several operators persist a fan-in intermediate by design (MinHash
per-doc tables, BM25 postings, LM token/bigram rows, graph edges, the
global-ranking numbered table — see SCALE.md "Cache policy"): the
cached table is consumed by 2+ downstream branches of the SAME query,
and without materialization each branch re-runs the expensive subtree.

The flip side (ADVICE r4): those ``persist()`` registrations live in
Spark's CacheManager until explicitly unpersisted, so a long-lived
session composing operators repeatedly accumulates dead caches (each
one is small — doc-grain or vocabulary-grain — but unbounded in
number). The operators cannot unpersist themselves: their result is
lazy, so the cache must outlive the function and stay alive until the
caller's terminal action.

This module is the release valve. Operators route their persists
through :func:`tracked_persist`; a long-lived caller wraps each unit of
work in :func:`released_after`, or calls :func:`release_tracked`
between pipelines:

    with released_after():
        bm25_topk(...).collect()          # caches live here
    # caches released

One-shot jobs (bench.py, the driver) never need to bother — session
teardown drops everything. ``tools/check_correctness.py`` calls
``spark.catalog.clearCache()`` between queries, which also clears
these (clearCache is a superset of release_tracked).
"""

from __future__ import annotations

import contextlib
import threading
from typing import Iterator

from pyspark.sql import DataFrame

# _LOCK guards the registry's list mutations so concurrent driver
# threads never corrupt it or double-release an entry (ADVICE r5).
# NOTE the remaining semantic assumption: :func:`released_after`'s
# mark-based scoping is positional (LIFO), so with MULTIPLE driver
# threads interleaving tracked_persist calls, a released_after block in
# one thread can release caches registered by another thread's
# in-flight query. That is safe (unpersist never breaks correctness —
# the consumer just recomputes) but defeats the caching; callers who
# share one session across driver threads should scope per-thread work
# with release via `spark.catalog.clearCache()` at quiesce points
# instead, or serialize units of work. Single-threaded drivers (every
# caller in this repo: bench, correctness, pipelines, tests) get exact
# scoping.
_LOCK = threading.Lock()
_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + registration for later bulk release."""
    df.persist()
    with _LOCK:
        _TRACKED.append(df)
    return df


def _pop_down_to(mark: int) -> list[DataFrame]:
    with _LOCK:
        released = _TRACKED[mark:]
        del _TRACKED[mark:]
    return released


def release_tracked() -> int:
    """Unpersist every tracked cache (best-effort; a cache whose
    session already stopped is skipped). Returns the number released."""
    n = 0
    for df in _pop_down_to(0):
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n


@contextlib.contextmanager
def released_after() -> Iterator[None]:
    """Scope operator caches to a unit of work: caches persisted inside
    the block are released on exit (exception-safe). Caches created
    BEFORE the block are untouched (single-threaded driver; see module
    note on the multi-thread caveat)."""
    with _LOCK:
        mark = len(_TRACKED)
    try:
        yield
    finally:
        for df in _pop_down_to(mark):
            try:
                df.unpersist()
            except Exception:
                pass
