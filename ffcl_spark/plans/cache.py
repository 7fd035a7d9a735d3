"""Cache hand-off between operators and one-shot callers.

Operators whose physical plan materializes an intermediate (the
cogrouped kernel output of the kNN joins) have two kinds of callers:

- ITERATIVE callers (Borůvka's escalation rounds) pass
  ``checkpoint=True``: intermediates are locally checkpointed and
  unpersisted before return, so repeated calls never accumulate cached
  partitions — at the cost of one extra materialization per call.
- ONE-SHOT callers (bench stages, gate queries) take the default
  ``checkpoint=False``: the intermediate stays persisted and the
  returned DataFrame reads it; the caller's single action is a cache
  read, with no second materialization. The persisted handles ride on
  the returned DataFrame — call :func:`release` when done (benchmark
  reps must, so rep 2 measures the operator, not the cache).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def carry(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Attach persisted upstream handles to ``out`` for later release.
    Handles already carried by the inputs are merged in."""
    handles = []
    for c in cached:
        handles.extend(getattr(c, "_ffcl_cached", ()))
        if c.storageLevel.useMemory or c.storageLevel.useDisk:
            handles.append(c)
    out._ffcl_cached = handles
    return out


def free_checkpoint(df: DataFrame) -> None:
    """Deterministically unpersist a localCheckpointed frame's RDD.

    ``DataFrame.unpersist`` reaches only CacheManager entries; the
    checkpoint's RDD-level persist is invisible to it and otherwise
    waits on GC + ContextCleaner, which can lag minutes on a busy
    driver (observed: surviving checkpoint RDDs per streaming epoch in
    the full test suite). A checkpointed frame's analyzed plan is a
    ``LogicalRDD`` whose ``rdd()`` IS the persisted RDD — note
    ``toRdd()`` is NOT (it returns a derived, unpersisted RDD).
    No-op for non-checkpointed frames."""
    plan = df._jdf.queryExecution().analyzed()
    if plan.getClass().getName().endswith(".LogicalRDD"):
        plan.rdd().unpersist(False)


def release(df: DataFrame) -> None:
    """Unpersist every cached intermediate carried by ``df`` — both
    CacheManager entries and checkpoint RDDs (no-op for DataFrames
    without carried handles)."""
    for c in getattr(df, "_ffcl_cached", ()):
        c.unpersist()
        free_checkpoint(c)
    df._ffcl_cached = []
