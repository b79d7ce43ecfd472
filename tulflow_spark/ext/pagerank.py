"""PageRank over a link graph — the iterative companion to the
connected-components operator (ext/components.py), consuming the edge
lists the HTML extraction stage produces (ext/html.py links).

Public algorithm (Page et al. 1999).  Spark shaping per iteration:

- contributions = edges ⋈ ranks on src (shuffles (src, rank) — edge-sized,
  never node payloads), each edge carries rank/outdeg;
- new rank = (1-d)/n + d · Σ contributions, as a map-side-combinable
  groupBy(dst) — ONE shuffle per iteration;
- ranks re-join the node list (left, fill (1-d)/n) so nodes with no
  in-links keep the teleport mass;
- lineage truncated every few iterations (localCheckpoint) like the
  components loop — iteration count is small (O(log n) mixing for real
  graphs), state is one (node, rank) row per node.

Determinism for the oracle: the per-edge division is a plain double op
(identical IEEE on both engines) and the per-node sum accumulates in
DECIMAL(30,18), so results are partitioning-insensitive and hash-equal to
the DuckDB mirror (unrolled k iterations of the same algebra).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(30,18)"


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(src, dst) edges + (node) list → (node, rank) after ``n_iter``
    synchronous iterations from the uniform start.  Dangling nodes (no
    out-edges) contribute nothing (their mass exits, the teleport term
    keeps ranks positive) — the variant both sides of the oracle pin."""
    n = nodes.count()
    teleport = (1.0 - damping) / n
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = edges.join(out_deg, "src").select("src", "dst", "outdeg")
    ranks = nodes.select(
        F.col("node"), F.lit(1.0 / n).cast("double").alias("rank")
    )
    for i in range(n_iter):
        contribs = (
            ed.join(ranks, ed.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum(F.col("c").cast(_DEC)).cast("double").alias("in_sum"))
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("in_sum"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def pagerank_sql(
    nodes_cte: str, edges_cte: str, n: str, n_iter: int = 3,
    damping: float = 0.85,
) -> str:
    """DuckDB mirror: unrolled iterations of the same decimal-summed
    algebra.  ``nodes_cte``/``edges_cte`` are CTE bodies providing
    (node) and (src, dst); ``n`` is a SQL expression for the node count."""
    d = repr(damping)
    tele = f"((1.0 - {d}) / ({n}))"
    parts = [
        f"nodes AS ({nodes_cte})",
        f"edges AS ({edges_cte})",
        "outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, CAST(1.0 / ({n}) AS DOUBLE) AS rank FROM nodes)",
    ]
    for i in range(n_iter):
        parts.append(
            f"""r{i + 1} AS (
              SELECT nodes.node,
                     {tele} + {d} * COALESCE(s.in_sum, 0.0) AS rank
              FROM nodes LEFT JOIN (
                SELECT e.dst,
                       CAST(SUM(CAST(r.rank / o.outdeg AS DECIMAL(30,18)))
                            AS DOUBLE) AS in_sum
                FROM edges e
                  JOIN r{i} r ON e.src = r.node
                  JOIN outdeg o ON e.src = o.src
                GROUP BY e.dst
              ) s ON nodes.node = s.dst
            )"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, rank FROM r{n_iter}"
    )
