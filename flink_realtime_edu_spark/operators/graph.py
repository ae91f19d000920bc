"""Connected components over a pair list — dedup-cluster closure.

The reference family has no graph operator [R — SURVEY.md §0]; this
is a north-star addition (BASELINE.json LLM-pipeline dedup): near-dup
detection (operators/dedup.py) emits PAIRS, but "keep one document
per duplicate group" needs the transitive closure of those pairs —
A~B and B~C must land A, B, C in one cluster even when A~C was never
emitted. The canonical label is the component's minimum node id,
matching the keep-smallest-doc_id convention of exact_dedup_docs.

Spark-first shape: hash-min label propagation.

- labels start as (node, node); each round every node takes the min
  of its own label and its neighbors' labels — one equi-join on the
  symmetrized edge list plus one (node)-keyed min aggregate, both
  plain shuffles on keys Catalyst plans as hash joins/aggs. No
  driver-side graph: the driver holds only one decimal per round.
- labels are monotonically non-increasing, so the exact decimal SUM
  of labels is a convergence witness: unchanged sum ⇔ fixpoint
  (cheaper than a change-count join, and deterministic).
- `materialize(eager=True)` (session.py knob; localCheckpoint
  locally) truncates lineage each round —
  iterative self-referential plans otherwise grow exponentially.
- localCheckpoint surfaces UnknownPartitioning, so each round
  re-shuffles both sides (visible in plans/near_dup_clusters.txt).
  Fine at dedup-graph edge counts (edges ≪ corpus); for huge edge
  lists, persist a (node)-bucketed table per round instead so the
  join and the min-agg reuse one partitioning.
- rounds needed = graph diameter (+1 to observe the fixpoint).
  Dedup graphs are near-cliques (duplicates of one source document
  all pair with each other), so diameter is ~2 in practice. For
  adversarially long chains at 100 TB, switch to alternating
  large-star/small-star (Kiveris et al., "Connected Components in
  MapReduce and Beyond") which converges in O(log² n) rounds; the
  per-round plan here is the building block either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_realtime_edu_spark.session import materialize as _materialize

_DEC = "decimal(38,0)"


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 30,
) -> DataFrame:
    """(node bigint, component bigint) for every node with ≥1 edge;
    component = the minimum node id in the node's connected component.

    Nodes absent from `edges` (singletons) are each their own
    component and are simply not emitted — union them back with
    component = node id if the caller needs total coverage.

    Raises RuntimeError if the fixpoint is not reached within
    ``max_iters`` rounds (diameter + 1 rounds are required).
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    sym = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    sym = _materialize(sym, eager=True)

    labels = sym.select(F.col("src").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    prev_sum = None
    for _ in range(max_iters):
        neighbor_min = (
            sym.alias("e")
            .join(labels.alias("l"), F.col("e.dst") == F.col("l.node"))
            .select(
                F.col("e.src").alias("node"),
                F.col("l.component").alias("component"),
            )
        )
        labels = (
            labels.unionByName(neighbor_min)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .transform(lambda d: _materialize(d, eager=True))
        )
        total = labels.agg(
            F.sum(F.col("component").cast(_DEC)).alias("s")
        ).collect()[0]["s"]
        if total == prev_sum:
            return labels
        prev_sum = total
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds "
        "(graph diameter too large — use large-star/small-star)"
    )
