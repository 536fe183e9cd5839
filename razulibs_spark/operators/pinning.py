"""Iteration pinning — one policy for materializing per-round state
in driver-looped algorithms (PageRank, BFS, transitive closure,
connected components).

Every iterative operator here must pin each round's frame: cut the
self-referencing lineage (which otherwise grows the plan every round)
and materialize once so later rounds don't recompute earlier ones.
There are three mechanisms with different failure/lifecycle trades,
and the right one depends on the deployment, not the algorithm:

- ``localCheckpoint``: blocks are UNREPLICATED and lineage is gone —
  on a real cluster, losing any executor mid-algorithm fails the
  query unrecoverably. On local[n] that's free: executor loss means
  the JVM died anyway, and blocks are released by the ContextCleaner
  when the frame is garbage-collected (no unpersist bookkeeping).
- reliable ``checkpoint``: blocks go to the checkpoint directory
  (HDFS/object store on a cluster) — lineage is cut AND the state
  survives executor loss. Costs a write to stable storage per round.
- ``persist``: keeps lineage (block loss triggers recompute) but the
  plan keeps growing round over round — acceptable only for a few
  rounds, and entries outlive the algorithm until unpersist.

``pin_iteration`` picks by ``spark.razulibs.iterPin``:

- ``auto`` (default): ``localCheckpoint`` on a local master;
  elsewhere reliable ``checkpoint`` when a checkpoint dir is set,
  else ``persist`` (the only fault-tolerant option left).
- ``localCheckpoint`` / ``checkpoint`` / ``persist``: forced.

operators/stats.py:range_cumsum keeps its own tuned pin (lazy
localCheckpoint, ``spark.razulibs.rangeCumsum.pin``): its frame is
consumed by exactly two back-to-back jobs in one call, not a loop —
the lifecycle trade is different and separately documented there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pin_iteration(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize one iteration's state per the deployment policy
    (module docstring). Local-mode default is ``localCheckpoint`` —
    identical to the historical hard-coded behavior."""
    spark = df.sparkSession
    mode = spark.conf.get("spark.razulibs.iterPin", "auto")
    sc = spark.sparkContext
    if mode == "auto":
        if sc.master.startswith("local"):
            mode = "localCheckpoint"
        elif sc._jsc.sc().getCheckpointDir().isDefined():
            mode = "checkpoint"
        else:
            mode = "persist"
    if mode == "checkpoint":
        return df.checkpoint(eager=eager)
    if mode == "persist":
        pinned = df.persist()
        if eager:
            pinned.count()
        return pinned
    return df.localCheckpoint(eager=eager)
