"""Native (C) local-move kernel: bit-identity vs the pure-Python sweep.

The r6 optimization compiles the sequential local-move sweep to native
code (oracle/_cmove.py). These tests pin the contract: identical
membership, modularity, iteration counts, and pass logs vs the
pure-Python path (which itself is pinned against the slow reference
oracle in test_oracle.py), on fixtures covering the hub path boundary,
non-uniform float weights (summation-order sensitivity), warm starts,
and frontier seeding.
"""

from __future__ import annotations

import importlib
import os

import numpy as np
import pytest

_cm = importlib.import_module(
    "louvain_communities_openmp_spark.oracle._cmove"
)
_ls = importlib.import_module(
    "louvain_communities_openmp_spark.oracle.louvain_seq"
)


def _both(s2, d2, w2, **kw):
    """Run louvain_seq_fast with the Python sweep and the C sweep."""
    os.environ["LOUVAIN_NO_CKERNEL"] = "1"
    try:
        cm = importlib.reload(_cm)
        ls = importlib.reload(_ls)
        r_py = ls.louvain_seq_fast(s2.copy(), d2.copy(), w2.copy(), **kw)
    finally:
        del os.environ["LOUVAIN_NO_CKERNEL"]
    cm = importlib.reload(_cm)
    ls = importlib.reload(_ls)
    if cm.get_local_move() is None:
        pytest.skip("no C compiler available in this environment")
    r_c = ls.louvain_seq_fast(s2.copy(), d2.copy(), w2.copy(), **kw)
    return r_py, r_c


def _assert_identical(r_py, r_c):
    assert r_py.membership == r_c.membership
    assert r_py.modularity == r_c.modularity  # exact float equality
    assert r_py.iterations == r_c.iterations
    assert r_py.passes == r_c.passes
    assert r_py.pass_log == r_c.pass_log


def _sym(src, dst, w):
    return (
        np.concatenate([src, dst]).astype(np.int64),
        np.concatenate([dst, src]).astype(np.int64),
        np.concatenate([w, w]).astype(np.float64),
    )


def test_ckernel_random_graph_bit_identical():
    rs = np.random.RandomState(42)
    src = rs.randint(0, 3000, 60000)
    dst = rs.randint(0, 3000, 60000)
    m = src != dst
    s2, d2, w2 = _sym(src[m], dst[m], np.ones(int(m.sum())))
    _assert_identical(*_both(s2, d2, w2))


def test_ckernel_hub_and_float_weights_bit_identical():
    # a 6000-degree hub crosses the Python path's _SMALL_DEG=4096
    # boundary; non-uniform float weights make accumulation order
    # observable in the low bits
    rs = np.random.RandomState(7)
    hub_d = (np.arange(1, 6001) % 8000).astype(np.int64)
    hub_s = np.zeros(6000, dtype=np.int64)
    rest_s = rs.randint(1, 8000, 40000)
    rest_d = rs.randint(1, 8000, 40000)
    m = rest_s != rest_d
    src = np.concatenate([hub_s, rest_s[m]])
    dst = np.concatenate([hub_d, rest_d[m]])
    w = (rs.rand(len(src)) * 3 + 0.1).round(3)
    s2, d2, w2 = _sym(src, dst, w)
    _assert_identical(*_both(s2, d2, w2))


def test_ckernel_warm_start_and_frontier_bit_identical():
    rs = np.random.RandomState(11)
    src = rs.randint(0, 2000, 30000)
    dst = rs.randint(0, 2000, 30000)
    m = src != dst
    s2, d2, w2 = _sym(src[m], dst[m], np.ones(int(m.sum())))
    S = int(max(s2.max(), d2.max())) + 1
    init = rs.randint(0, 40, S).astype(np.int64)
    aff = rs.choice(S, 200, replace=False).astype(np.int64)
    _assert_identical(*_both(s2, d2, w2, init_com=init, init_aff=aff))


def test_ckernel_vs_slow_reference_oracle():
    # anchor the C path directly to the dict-walk reference oracle
    rs = np.random.RandomState(3)
    src = rs.randint(0, 500, 4000)
    dst = rs.randint(0, 500, 4000)
    m = src != dst
    s2, d2, w2 = _sym(src[m], dst[m], np.ones(int(m.sum())))
    cm = importlib.reload(_cm)
    ls = importlib.reload(_ls)
    if cm.get_local_move() is None:
        pytest.skip("no C compiler available in this environment")
    r_c = ls.louvain_seq_fast(s2.copy(), d2.copy(), w2.copy())
    S = int(max(s2.max(), d2.max())) + 1
    adj = [[] for _ in range(S)]
    order = np.lexsort((d2, s2))
    seen = set()
    for i in order:
        k = (int(s2[i]), int(d2[i]))
        if k in seen:
            continue
        seen.add(k)
        adj[int(s2[i])].append((int(d2[i]), float(w2[i])))
    r_slow = ls.louvain_seq(adj)
    assert list(r_slow.membership) == list(r_c.membership)
    assert r_slow.passes == r_c.passes
