"""Hub-heavy adversarial fixture: per-row width / state-size bounds.

Web graphs are power-law — one vertex can carry a million-edge
adjacency. These tests pin, on a 10k-edge star fixture, that the
operators behind g_walks16 / g_harmonic8 / g_egonet2 keep their
per-row and per-state footprints bounded the way their docstrings
claim (the max_pivot_degree discussion, linkpred.py):

- walks: the adjacency array row is capped by ``max_neighbors``
  BEFORE collection (no hub-wide aggregation buffer), and capped
  walks stay valid + deterministic.
- harmonic / eccentricity: multi-source BFS state is ROW-based —
  no array column anywhere in the plan; visited rows are bounded by
  n_sources x |reachable| exactly.
- egonet: induced-subgraph extraction is join-based — no
  collect_list in the physical plan, output rows = induced edges.
"""

from pyspark.sql import functions as F

from louvain_communities_openmp_spark.operators.centrality import (
    harmonic_centrality,
    multi_source_bfs,
)
from louvain_communities_openmp_spark.operators.walks import (
    _adjacency,
    deterministic_walks,
)
from louvain_communities_openmp_spark.sources.edges import edges_from_list


def _hub_fixture(spark, n=5000):
    """Star: hub 0 <-> 1..n (10k directed edges), plus a short tail
    42 <-> 43 <-> 44 so 2-hop structure exists beyond the star."""
    pairs = [(0, i) for i in range(1, n + 1)] + [(42, n + 10), (n + 10, n + 20)]
    und = [(s, d, 1.0) for s, d in pairs] + [(d, s, 1.0) for s, d in pairs]
    return edges_from_list(spark, und).persist()


def test_walks_hub_cap_bounds_array_width(spark):
    e = _hub_fixture(spark)
    cap = 64
    adj = _adjacency(e, cap)
    widths = adj.agg(F.max(F.size("nbrs")).alias("m")).first()["m"]
    assert widths == cap  # the hub row is cut to exactly the cap
    # uncapped control: the hub row really is fixture-sized
    full = _adjacency(e, None)
    assert full.agg(F.max(F.size("nbrs"))).first()[0] == 5000
    # the capped plan never aggregates the full adjacency: the filter
    # runs BEFORE the collect_list aggregate
    plan = adj._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" in plan
    assert plan.index("row_number") > 0  # window cap present
    # capped walks are valid and only visit retained (smallest-id)
    # neighbors when stepping off the hub
    w = deterministic_walks(e, n_sources=4, walk_len=4, max_neighbors=cap)
    rows = w.collect()
    assert rows, "walks must produce steps"
    hub_steps = {
        r["v"]
        for r in rows
        if r["step"] > 0 and r["v"] != 0 and r["v"] <= 5000
    }
    # any non-hub vertex reached must be one of the hub's 64 retained
    # (smallest-id) neighbors or a source itself
    sources = {r["v"] for r in rows if r["step"] == 0}
    assert all(v <= cap or v in sources for v in hub_steps), sorted(hub_steps)[:8]
    # determinism: same input -> identical walk set
    w2 = deterministic_walks(e, n_sources=4, walk_len=4, max_neighbors=cap)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, w2.collect()))


def test_harmonic_bfs_state_is_row_bounded(spark):
    e = _hub_fixture(spark)
    n_sources = 4
    visited, rounds = multi_source_bfs(e, n_sources=n_sources, max_iter=16)
    n_vertices = 5003
    # exact bound: one row per (source, reached vertex), never more
    assert visited.count() <= n_sources * n_vertices
    assert visited.groupBy("s", "id").count().agg(F.max("count")).first()[0] == 1
    # star diameter is 2 from the hub side; BFS terminates in a few
    # rounds, not O(V)
    assert rounds <= 5
    # no array column in the BFS state or the harmonic plan
    res = harmonic_centrality(e, n_sources=n_sources)
    plan = res.scores._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan and "collect_set" not in plan


def test_egonet_is_join_based_no_arrays(spark):
    from louvain_communities_openmp_spark.operators.bfs import bfs
    from louvain_communities_openmp_spark.operators.transforms import vertices

    e = _hub_fixture(spark)
    src = vertices(e).agg(F.min("id").alias("id"))
    vis = bfs(e, src, max_iter=2).distances.select("id")
    ego = (
        e.join(vis.withColumnRenamed("id", "src"), "src")
        .join(vis.withColumnRenamed("id", "dst"), "dst")
        .select("src", "dst", "w")
    )
    # min id = 0 = the hub: 2-hop egonet is the whole star + nothing of
    # the tail beyond distance 2
    got = ego.count()
    # star edges (both directions) + tail edge 42<->5010 (within 2 hops
    # of hub via 42); 5010<->5020 is 3 hops out and must be excluded
    assert got == 2 * 5000 + 2
    plan = ego._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan and "collect_set" not in plan
