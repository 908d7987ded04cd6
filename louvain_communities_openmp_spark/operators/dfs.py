"""Depth-first search (SURVEY.md §2.5 L12).

Reference: dfs.hxx:19-41 (`dfsVisitedForEachU`) — recursive preorder
from a start vertex, neighbors explored in adjacency (ascending-dst)
order, with an optional per-vertex visit predicate.

DFS is inherently sequential (each step depends on the full history of
the walk), so there is no distributed formulation — the reference
itself only uses it as a driver-scale utility. Like ``louvain_exact``
this flows the edge table through distributed plumbing into a
single-partition kernel: ids are dense-remapped, the adjacency is
CSR-packed with numpy (sort + reduceat bounds — no per-edge Python),
and only the walk itself is an explicit stack loop, mirroring the
reference's recursion without its stack-depth hazard.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def _dfs_kernel_factory(source: int):
    def kernel(batches):
        import numpy as np

        out_schema = {
            "id": pd.Series(dtype="int64"),
            "ord": pd.Series(dtype="int64"),
        }
        chunks = list(batches)
        if not chunks:  # empty input ⇒ zero Arrow batches
            yield pd.DataFrame(out_schema)
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if len(pdf) == 0:
            yield pd.DataFrame(out_schema)
            return
        src = pdf["src"].to_numpy(dtype=np.int64)
        dst = pdf["dst"].to_numpy(dtype=np.int64)
        ids = np.unique(np.concatenate([src, dst]))
        n = len(ids)
        s_pos = np.searchsorted(ids, source)
        if s_pos >= n or ids[s_pos] != source:
            yield pd.DataFrame(out_schema)  # source not in the graph
            return
        ls = np.searchsorted(ids, src)
        ld = np.searchsorted(ids, dst)
        # CSR: edges sorted by (src, dst) ⇒ neighbor order == the
        # reference's forEachEdgeKey order on its sorted adjacency
        o = np.lexsort((ld, ls))
        ls, ld = ls[o], ld[o]
        starts = np.searchsorted(ls, np.arange(n))
        ends = np.searchsorted(ls, np.arange(n) + 1)

        vis = np.zeros(n, dtype=bool)
        order = np.empty(n, dtype=np.int64)
        cnt = 0
        # iterative preorder with visited-check at pop: pushing each
        # vertex's neighbors in REVERSED adjacency order makes the pop
        # sequence identical to dfs.hxx's recursion (first neighbor's
        # subtree fully explored before the second is considered)
        stack = [int(s_pos)]
        while stack:
            u = stack.pop()
            if vis[u]:
                continue
            vis[u] = True
            order[cnt] = u
            cnt += 1
            lo, hi = starts[u], ends[u]
            if hi > lo:
                stack.extend(ld[lo:hi][::-1].tolist())
        vids = order[:cnt]
        yield pd.DataFrame(
            {
                "id": pd.Series(ids[vids], dtype="int64"),
                "ord": pd.Series(np.arange(cnt), dtype="int64"),
            }
        )

    return kernel


def dfs_order(edges: DataFrame, source: int) -> DataFrame:
    """Preorder DFS from ``source`` → (id, ord) over reachable
    vertices, ord = 0-based visit position. → dfs.hxx:19-41."""
    return (
        edges.select("src", "dst")
        .repartition(1)
        .mapInPandas(_dfs_kernel_factory(int(source)), "id long, ord long")
    )
