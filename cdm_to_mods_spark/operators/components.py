"""Distributed connected components — alternating large-star / small-star.

The O(log n)-round MapReduce formulation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SOCC'14): repeatedly rewire every
node toward the minimum id in its neighborhood —

* **large-star**: for each node u, let m = min(Γ(u) ∪ {u}); reattach every
  STRICTLY LARGER neighbor v > u to m (emit edge (v, m));
* **small-star**: direct edges to the smaller endpoint; for each u, with
  smaller-neighbors Γ⁻(u) and m = min(Γ⁻(u) ∪ {u}), attach u and all of
  Γ⁻(u) minus {m} to m.

The sequence converges to star graphs (every node → its component's min
id) in O(log n) alternations — against min-label propagation's
O(diameter) rounds, the difference between ~40 and ~10 shuffles on a
chain-shaped component of 10^12 edges. Each round is two hash
aggregations + a join, all key-partitioned; lineage is truncated per
round with ``localCheckpoint`` so the plan never grows.

Convergence detection: the canonical edge multiset's (count, hash-sum)
signature is compared between rounds — one tiny aggregate per round, no
driver-side edge materialization ever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canon(e: DataFrame) -> DataFrame:
    """undirected edge set, canonical direction (big, small), no loops."""
    return (
        e.filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    d = _canon(e)  # u > v for every edge
    m = d.groupBy("u").agg(F.min("v").alias("m"))
    moved = (
        d.join(m, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return moved.union(m.select("u", F.col("m").alias("v")))


def _signature(e: DataFrame) -> tuple:
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        # exact (decimal) hash-sum + xor — no float truncation, so equal
        # signatures mean equal multisets up to 128-bit-collision odds
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        F.expr("bit_xor(xxhash64(u, v))").alias("x"),
    ).collect()[0]
    return (row["n"], row["h"], row["x"])


def connected_components(
    edges: DataFrame, max_rounds: int = 40
) -> DataFrame:
    """``edges(u,v)`` undirected → ``(node, component)`` where component is
    the minimum node id of the node's connected component. Covers every
    node incident to at least one edge (callers union isolated nodes as
    self-components if needed)."""
    def _free_ckpt(df) -> None:
        """Release one round's localCheckpoint blocks as soon as the next
        round is materialized — without this, up to max_rounds full
        copies of the edge set pin executor memory/disk until the JVM's
        ContextCleaner happens to GC them (exactly on the long
        chain-shaped inputs that need many rounds). The checkpointed RDD
        is addressed through ITS OWN plan (LogicalRDD.rdd), never a
        global persistent-RDD diff, so concurrent jobs' caches are
        untouchable. Best-effort: the accessor is Spark-internal, so any
        failure falls back to the GC behavior."""
        try:
            df._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:
            pass

    e = _canon(edges.select("u", "v"))
    e = e.localCheckpoint(eager=True)
    sig = _signature(e)
    for _ in range(max_rounds):
        e2 = _small_star(_large_star(e)).distinct().localCheckpoint(eager=True)
        sig2 = _signature(e2)
        _free_ckpt(e)  # e2 is materialized; the previous round's copy
        e = e2         # is dead weight (the LAST e stays live — the
        # returned star graph reads from it)
        if sig2 == sig:
            break
        sig = sig2
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            "alternations — not expected for any graph of < 2^max_rounds nodes"
        )
    # star graphs: every edge is (node, root); roots map to themselves
    return (
        e.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .union(
            e.select(F.col("v").alias("node"), F.col("v").alias("component"))
        )
        .distinct()
    )
