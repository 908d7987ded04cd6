"""k-core decomposition by iterative peeling.

The k-core of an undirected graph is the maximal subgraph in which
every vertex has degree >= k. Peeling computes it as a fixpoint:
repeatedly drop vertices whose degree *among surviving vertices* falls
below k. A fixed k's core is the standard screen a link-graph pipeline
runs before community detection — it strips the low-degree periphery
(dangling pages, one-off citers) that contributes noise communities
(the reference's experiments run on pre-cleaned SuiteSparse matrices;
main.sh:30-41 — this operator is the cleaning step re-expressed as a
first-class dataflow op).

Scale design: the edge table is filtered to non-self-loops, partitioned
ONCE on its per-round join key (`dst`) and persisted; each peel round
makes ONE pass shaped like the components round: join the vertex-sized
alive set on `dst` (edges never move), groupBy(src).count() with full
map-side combine (the exchange is bounded by distinct-src-per-partition,
vertex-sized), then a vertex-sized semi-join to require the src itself
alive. Joining alive on BOTH endpoints directly would reshuffle the
edge-sized intermediate on the second key every round — the formulation
here counts dead-src edges and discards them one join later instead,
trading a few counted-then-dropped rows for an O(E)-per-round exchange.
Alive sets are eagerly localCheckpointed to truncate the per-round
lineage (same pattern as components/labelprop).
Round count is bounded by the peeling depth, which is small on
power-law graphs (most low-degree vertices fall in the first rounds);
the pathological O(V/k) chain case is bounded by `max_iter`.

The DuckDB oracle twin unrolls the identical dynamics to a fixed depth
with a loud convergence sentinel (see __spark_entry__._kcore_sql),
mirroring the g_components oracle strategy.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .transforms import vertices


@dataclass
class KCoreResult:
    core: DataFrame  # (id long, deg_in_core long)
    iterations: int


def kcore(edges: DataFrame, k: int, max_iter: int = 500) -> KCoreResult:
    """Vertices of the k-core with their within-core degree.

    `edges` is the usual symmetric directed representation (both
    (u,v) and (v,u) present), so out-degree over surviving endpoints
    equals undirected degree. Self-loops are ignored (they contribute
    no peer support). Returns an empty frame when no k-core exists.
    """
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .repartition("dst")
        .persist()
    )
    alive = vertices(edges).localCheckpoint(eager=True)
    n_alive = alive.count()
    it = 0
    deg = None
    while it < max_iter and n_alive > 0:
        it += 1
        # one components-shaped round: edges stay put (partitioned on
        # dst), only vertex-sized frames move — alive into the dst
        # join, the combined per-src counts into the agg exchange,
        # alive again into the src semi-join
        deg = (
            e.join(alive.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.count("*").alias("deg_in_core"))
            .join(alive, "id")
            .where(F.col("deg_in_core") >= k)
            .localCheckpoint(eager=True)
        )
        n_next = deg.count()
        if n_next == n_alive:
            break
        alive = deg.select("id")
        n_alive = n_next
    e.unpersist()
    if deg is None or n_alive == 0:
        # no vertex survives: an empty, correctly-typed frame
        spark = edges.sparkSession
        return KCoreResult(
            spark.createDataFrame([], "id long, deg_in_core long"), it
        )
    return KCoreResult(deg.select("id", "deg_in_core"), it)
