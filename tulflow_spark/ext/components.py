"""Distributed connected components over candidate-pair edge lists.

Near-duplicate *pairs* (MinHash-LSH, SimHash, exact n-gram Jaccard — see
:mod:`tulflow_spark.ext.dedup`) are only half of deduplication: the pairs
form a graph whose connected components are the duplicate *clusters*, and
the production policy is "keep one representative per cluster".  The greedy
pairwise rule used by :func:`tulflow_spark.ext.curation.curate_near_dup`
(drop the higher id of every pair) keeps every *local* minimum — the global
minimum of each component always survives, but so does any member that
happens never to be the larger end of a candidate pair.  Resolving clusters
exactly requires transitive closure, i.e. connected components.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014) — the standard
shuffle-bounded formulation:

- ``large-star``: every node connects its larger neighbors to the smallest
  member of its neighborhood (including itself).
- ``small-star``: every node connects its smaller-or-equal neighbors (and
  itself) to the smallest of them.

Both steps strictly preserve connectivity, never increase the number of
edges beyond O(|E|), and alternate to a fixpoint in O(log^2 n) rounds
(a handful in practice) where every surviving edge points a node directly
at its component minimum.

Shape at 100 TB:

- Each round is ONE ``groupBy(node).min`` (partial-aggregatable, so hot
  nodes in giant components combine map-side) plus one same-key join — the
  edge list, never document payloads, is all that shuffles.
- ``localCheckpoint`` after every round truncates lineage, keeping the plan
  O(1) per round instead of O(rounds) (on a multi-executor cluster with
  unreliable storage, substitute ``spark.sparkContext.setCheckpointDir`` +
  ``checkpoint`` — same call shape, durable blocks).
- Convergence is detected with an order-insensitive (count, hash-sum)
  fingerprint: one scalar to the driver per round, no edge data.

There is no reference-repo analogue (the reference dedups nothing); this is
part of the LLM-pipeline extension surface, same tier as ext.dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """(u,v) edges -> for each node, attach strictly-larger neighbors to the
    minimum of its closed neighborhood.

    No internal dropDuplicates (r15): the only consumer is
    :func:`_small_star`, whose min-aggregate is duplicate-insensitive and
    whose own terminal dropDuplicates re-canonicalizes the round's edge
    set — so the round output (and with it the convergence fingerprint
    and every result row) is identical, one full dedup shuffle per round
    cheaper.  Duplicate carry-through cannot compound across rounds (each
    round re-dedups) and cannot blow up within one (output here is at
    most one row per symmetrized input edge); the duplicates combine
    map-side in the next min-aggregate."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mn"))
        .select("u", F.least("u", "_mn").alias("_m"))
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """(u,v) edges -> orient each edge large->small, then attach each node's
    small neighbors (and the node itself) to the smallest of them."""
    d = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = d.groupBy("u").agg(F.min("v").alias("_m"))
    neighbor_edges = (
        d.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    self_edges = mins.select("u", F.col("_m").alias("v"))
    return neighbor_edges.union(self_edges).dropDuplicates()


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """Exact connected components of the undirected graph given by
    ``edges[src, dst]``.

    Returns ``(node, component)`` for every node incident to at least one
    edge, where ``component`` is the minimum node id of its component
    (components are therefore stable, deterministic labels).  Isolated
    nodes never appear in an edge list; callers wanting total coverage
    left-join this result and ``coalesce(component, id)`` — see
    :func:`assign_components`.

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iters`` alternating rounds (the bound is O(log^2 n); 25 rounds
    covers any graph this engine will meet — hitting it means the input
    violates the numeric-id contract, and a silent partial clustering would
    corrupt a dedup downstream).
    """
    sc = edges.sparkSession.sparkContext

    def _persistent_ids() -> set:
        return {
            int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()
        }

    def _unpersist(ids: set) -> None:
        jmap = sc._jsc.getPersistentRDDs()
        for rid in ids:
            jrdd = jmap.get(rid)
            if jrdd is not None:
                jrdd.unpersist(False)

    # Materialize the canonical edge list up front: every star round
    # references its input several times (symmetrize-union, min-aggregate,
    # join-back), so an un-checkpointed upstream lineage — often a full
    # candidate-pair pipeline — would be re-evaluated 3-4x in round one.
    #
    # Checkpoint-block hygiene: each round's localCheckpoint persists
    # blocks for the session; once the NEXT round has materialized, the
    # previous round's blocks are dead weight, so they are unpersisted as
    # the loop advances (identified by diffing the persistent-RDD registry
    # around each checkpoint — assumes no concurrent persist activity in
    # the same session during the rounds, which holds for a batch job).
    # Only the FINAL round's blocks stay: the returned DataFrame reads
    # them, and a lazily-returned frame has no sound internal unpersist
    # point (same doctrine as ext.curation's no-internal-persist rule).
    pre_existing = _persistent_ids()
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    own_ids = _persistent_ids() - pre_existing

    prev: tuple | None = None
    converged = False
    for _ in range(max_iters):
        # LAZY checkpoint: the fingerprint aggregate below is the round's
        # one action — it materializes the checkpoint blocks AND returns
        # the convergence scalar in the same job, instead of paying a
        # separate eager-checkpoint job per round
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        # order-insensitive, overflow-free (ANSI mode) edge-set fingerprint:
        # xor over xxhash64 of the (distinct) edges + the edge count
        sig = tuple(
            e.agg(
                F.count(F.lit(1)),
                F.bit_xor(F.xxhash64("u", "v")),
            ).first()
        )
        now = _persistent_ids() - pre_existing
        _unpersist(own_ids)
        own_ids = now - own_ids
        if sig == prev:
            converged = True
            break
        prev = sig
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds"
        )
    # Fixpoint: every edge is (node -> component minimum); minima have no
    # outgoing edge, so they are exactly the distinct v values.
    children = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = e.select(
        F.col("v").alias("node"), F.col("v").alias("component")
    ).dropDuplicates()
    return children.union(roots).dropDuplicates()


def assign_components(
    df: DataFrame,
    id_col: str,
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    out_col: str = "component",
    max_iters: int = 25,
) -> DataFrame:
    """Label every row of ``df`` with its duplicate-cluster id: the
    component minimum for rows reachable through ``edges``, the row's own
    id otherwise.  One broadcast-sized join against the (small) component
    map — document payloads never shuffle."""
    comp = connected_components(edges, src, dst, max_iters).select(
        F.col("node").alias("_cc_node"), F.col("component").alias("_cc_comp")
    )
    joined = df.join(comp, df[id_col] == comp["_cc_node"], "left")
    return joined.withColumn(
        out_col, F.coalesce(F.col("_cc_comp"), F.col(id_col).cast("long"))
    ).drop("_cc_node", "_cc_comp")
