"""Structural utilities: describe, synthetic deltas, community checks."""

from louvain_communities_openmp_spark.oracle import toy5, two_cliques
from louvain_communities_openmp_spark.oracle.graphs import disconnected
from louvain_communities_openmp_spark.operators.structure import (
    describe_graph,
    disconnected_communities,
    generate_edge_deltas,
    intra_community_components,
)
from louvain_communities_openmp_spark.operators.transforms import apply_batch
from louvain_communities_openmp_spark.sources.edges import edges_from_list


def test_describe(spark):
    r = describe_graph(edges_from_list(spark, toy5())).collect()[0]
    assert (r["order"], r["size"], r["total_weight"], r["self_loops"]) == (5, 12, 12.0, 0)


def test_generate_deltas_deterministic_and_tidy(spark):
    e = edges_from_list(spark, two_cliques()).persist()
    d1, i1 = generate_edge_deltas(e, 0.3, 0.3, salt=7)
    d2, i2 = generate_edge_deltas(e, 0.3, 0.3, salt=7)
    assert sorted(map(tuple, d1.collect())) == sorted(map(tuple, d2.collect()))
    assert sorted(map(tuple, i1.collect())) == sorted(map(tuple, i2.collect()))
    # deletions exist in the graph; insertions do not
    assert d1.join(e.select("src", "dst"), ["src", "dst"], "left_anti").count() == 0
    assert i1.join(e.select("src", "dst"), ["src", "dst"], "left_semi").count() == 0
    # applying keeps a valid edge table
    e2 = apply_batch(e, d1, i1)
    assert e2.count() == e.count() - d1.count() + i1.count()


def test_disconnected_communities(spark):
    edges, n = disconnected(8, 0)  # two K8s, no bridge
    e = edges_from_list(spark, edges)
    # membership that lumps both cliques into one community → disconnected
    mem = spark.createDataFrame([(i, 0) for i in range(16)], "id long, com long")
    bad = disconnected_communities(e, mem).collect()
    assert len(bad) == 1 and bad[0]["com"] == 0 and bad[0]["n_parts"] == 2
    # correct 2-community membership → none disconnected
    mem2 = spark.createDataFrame(
        [(i, 0 if i < 8 else 1) for i in range(16)], "id long, com long"
    )
    assert disconnected_communities(e, mem2).count() == 0
    icc = intra_community_components(e, mem2)
    assert icc.count() == 16


def test_refine_partition_splits_disconnected(spark):
    from louvain_communities_openmp_spark.operators.properties import modularity
    from louvain_communities_openmp_spark.operators.structure import (
        refine_partition,
    )

    edges, n = disconnected(8, 0)  # two K8s, no bridge
    e = edges_from_list(spark, edges).persist()
    # one community lumping both cliques → refinement must split it
    mem = spark.createDataFrame([(i, 0) for i in range(16)], "id long, com long")
    ref = refine_partition(e, mem).persist()
    rows = ref.collect()
    assert len(rows) == 16
    # refined labels nest inside the original community
    assert all(r["com"] == 0 for r in rows)
    labels = {r["refined"] for r in rows}
    assert labels == {0, 8}  # min-id canonical per clique
    # every refined community is internally connected now
    from pyspark.sql import functions as F

    refined_mem = ref.select("id", F.col("refined").alias("com"))
    assert disconnected_communities(e, refined_mem).count() == 0
    # splitting a disconnected community strictly increases modularity
    q_before = modularity(e, mem)
    q_after = modularity(e, refined_mem)
    assert q_after > q_before


def test_refine_partition_identity_on_connected(spark):
    from louvain_communities_openmp_spark.operators.structure import (
        refine_partition,
    )

    edges, n = disconnected(8, 0)
    e = edges_from_list(spark, edges)
    mem2 = spark.createDataFrame(
        [(i, 0 if i < 8 else 1) for i in range(16)], "id long, com long"
    )
    ref = refine_partition(e, mem2).collect()
    # partition unchanged: refined labels are the min-id canonical of
    # the same two blocks
    blocks = {}
    for r in ref:
        blocks.setdefault(r["refined"], set()).add(r["id"])
    assert sorted(map(sorted, blocks.values())) == [
        list(range(8)),
        list(range(8, 16)),
    ]


def test_community_conductance_two_cliques(spark):
    from louvain_communities_openmp_spark.operators.properties import (
        community_conductance,
    )

    # two K4s + one bridge (0,4): vol = 13 per side, cut = 1 each
    e = edges_from_list(spark, two_cliques(4))
    mem = spark.createDataFrame(
        [(i, i // 4) for i in range(8)], "id long, com long"
    )
    rows = {
        r["com"]: r for r in community_conductance(e, mem).collect()
    }
    assert set(rows) == {0, 1}
    for c in (0, 1):
        assert rows[c]["vol_w"] == 13.0
        assert rows[c]["cut_w"] == 1.0
        assert rows[c]["conductance"] == round(1 / 13, 6)


def test_avg_neighbor_degree_toy5(spark):
    from louvain_communities_openmp_spark.operators.structure import (
        avg_neighbor_degree,
    )

    rows = {
        r["deg"]: r
        for r in avg_neighbor_degree(edges_from_list(spark, toy5())).collect()
    }
    # degrees: 0,1,3,4 have deg 2 (each with neighbor-deg sum 6); 2 has deg 4
    assert rows[2]["n_vertices"] == 4
    assert rows[2]["sum_nb_deg"] == 24
    assert rows[2]["knn"] == 3.0
    assert rows[4]["n_vertices"] == 1
    assert rows[4]["sum_nb_deg"] == 8
    assert rows[4]["knn"] == 2.0


def test_partition_similarity_hand_computed(spark):
    # A = {0,1,2 | 3,4}, B = {0,1 | 2,3,4}: contingency (2,1;0,2) —
    # NMI and ARI recomputed here from first principles
    import math

    from louvain_communities_openmp_spark.operators.properties import (
        partition_similarity,
    )

    a = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 1), (4, 1)], "id long, ca long"
    )
    b = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1), (4, 1)], "id long, cb long"
    )
    row = partition_similarity(a, b).collect()[0]
    n = 5.0
    h = -(3 / n) * math.log(3 / n) - (2 / n) * math.log(2 / n)
    mi = (
        (2 / n) * math.log(n * 2 / (3 * 2))
        + (1 / n) * math.log(n * 1 / (3 * 3))
        + (2 / n) * math.log(n * 2 / (2 * 3))
    )
    want_nmi = 2 * mi / (h + h)
    # pair counts: ab = 1+0+1, a = 3+1, b = 1+3, total = C(5,2) = 10
    exp = 4 * 4 / 10.0
    want_ari = (2 - exp) / ((4 + 4) / 2.0 - exp)
    assert (row["n_items"], row["n_a"], row["n_b"]) == (5, 2, 2)
    assert math.isclose(row["nmi"], want_nmi, abs_tol=1e-6)
    assert math.isclose(row["ari"], want_ari, abs_tol=1e-6)


def test_partition_similarity_degenerate_single_cluster(spark):
    # one side a single cluster: H = 0 → NMI defined as 0, ARI 0
    from louvain_communities_openmp_spark.operators.properties import (
        partition_similarity,
    )

    a = spark.createDataFrame([(i, 0) for i in range(4)], "id long, ca long")
    b = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "id long, cb long"
    )
    row = partition_similarity(a, b).collect()[0]
    assert row["nmi"] == 0.0
    assert row["ari"] == 0.0
