"""Iteration pinning — one policy for materializing per-round state
in driver-looped algorithms (PageRank, BFS levels, transitive closure,
connected components).

Every iterative operator here must pin each round's frame: cut the
self-referencing lineage (which otherwise grows the plan every round —
for self-joining loops Catalyst analysis goes EXPONENTIAL in rounds)
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
  RETENTION: Spark never deletes reliable checkpoint files for the
  lifetime of the application unless
  ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (default
  false) — a deep loop (PageRank/BFS/closure over many rounds)
  accumulates O(rounds × state-size) files in the checkpoint dir.
  Cluster deploys using auto/checkpoint mode should set that conf
  (the ContextCleaner then removes each round's files once the frame
  is garbage-collected) or point the checkpoint dir at
  lifecycle-managed storage (e.g. an object-store prefix with an
  expiry rule).
- ``persist``: keeps lineage (block loss triggers recompute) but does
  NOT cut the plan — the exponential-analysis hazard above — and
  entries outlive the algorithm in the CacheManager until an explicit
  unpersist/clearCache. Acceptable only as a deliberate, forced
  choice for few-round loops.

``pin_iteration`` picks by ``spark.razulibs.iterPin``:

- ``auto`` (default): ``localCheckpoint`` on a local master;
  reliable ``checkpoint`` on a cluster with a checkpoint dir. A
  cluster WITHOUT a checkpoint dir raises — every silent fallback is
  wrong somewhere (localCheckpoint loses the query on executor loss;
  persist can hang the driver on deep loops), so the deploy must
  either ``sc.setCheckpointDir(...)`` or force a mode it understands.
- ``localCheckpoint`` / ``checkpoint`` / ``persist``: forced. Any
  other value raises (a typo must not silently hand back the
  fault-intolerant default the operator tried to opt out of).

operators/stats.py:range_cumsum keeps its own tuned pin (lazy
localCheckpoint, ``spark.razulibs.rangeCumsum.pin``): its frame is
consumed by exactly two back-to-back jobs in one call, not a loop —
the lifecycle trade is different and separately documented there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_MODES = ("localCheckpoint", "checkpoint", "persist")


def resolve_pin_mode(
    conf_value: str, master: str, has_checkpoint_dir: bool
) -> str:
    """Pure policy decision (unit-testable without a cluster): map the
    ``spark.razulibs.iterPin`` value + deployment facts to a mode."""
    if conf_value == "auto":
        # "local" / "local[n]" / "local[n,f]" only — NOT
        # "local-cluster[...]", which runs real separate executor JVMs
        # where localCheckpoint's unreplicated blocks can be lost on
        # executor failure (the exact hazard auto mode routes around).
        if master == "local" or master.startswith("local["):
            return "localCheckpoint"
        if has_checkpoint_dir:
            return "checkpoint"
        raise ValueError(
            "spark.razulibs.iterPin=auto on a non-local master requires "
            "a checkpoint directory (sc.setCheckpointDir on shared "
            "storage) for fault-tolerant iteration state. Set one, or "
            "force spark.razulibs.iterPin=localCheckpoint (fast; query "
            "dies on executor loss) / persist (lineage kept; only safe "
            "for few-round loops — plan analysis grows per round and "
            "cache entries outlive the algorithm)."
        )
    if conf_value not in _MODES:
        raise ValueError(
            f"spark.razulibs.iterPin={conf_value!r} is not one of "
            f"auto|{'|'.join(_MODES)}"
        )
    return conf_value


def pin_iteration(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize one iteration's state per the deployment policy
    (module docstring). Local-mode default is ``localCheckpoint`` —
    identical to the historical hard-coded behavior."""
    spark = df.sparkSession
    sc = spark.sparkContext
    mode = resolve_pin_mode(
        spark.conf.get("spark.razulibs.iterPin", "auto"),
        sc.master,
        sc._jsc.sc().getCheckpointDir().isDefined(),
    )
    if mode == "checkpoint":
        return df.checkpoint(eager=eager)
    if mode == "persist":
        pinned = df.persist()
        if eager:
            pinned.count()
        return pinned
    return df.localCheckpoint(eager=eager)
