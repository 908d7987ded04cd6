"""Sequential oracles for the companion operators (PageRank, connected
components, label propagation, triangle count).

The reference repo ships only Louvain; these companions are mandated by
BASELINE.json's north rule over the same edge table. The definitions
below ARE the engine's specification — the Spark operators must match
them exactly (components/labels) or allclose 1e-6 (pagerank).
"""

from __future__ import annotations

from collections import deque


def pagerank_seq(adj, alpha: float = 0.85, tol: float = 1e-10, max_iter: int = 200):
    """Weighted PageRank with uniform teleport and dangling-mass
    redistribution.

    r_{t+1}(v) = (1−α)/N + α·(Σ_{u→v} r_t(u)·w(u,v)/vtot(u) + D_t/N)
    where D_t = Σ_{dangling u} r_t(u). Converges on L1 < tol.
    """
    n = len(adj)
    if n == 0:
        return [], 0
    vtot = [sum(w for _, w in row) for row in adj]
    r = [1.0 / n] * n
    for it in range(1, max_iter + 1):
        nxt = [0.0] * n
        dangling = 0.0
        for u, row in enumerate(adj):
            if vtot[u] == 0.0:
                dangling += r[u]
                continue
            ru = r[u] / vtot[u]
            for v, w in row:
                nxt[v] += ru * w
        base = (1.0 - alpha) / n + alpha * dangling / n
        nxt = [base + alpha * x for x in nxt]
        err = sum(abs(a - b) for a, b in zip(nxt, r))
        r = nxt
        if err < tol:
            return r, it
    return r, max_iter


def connected_components_seq(adj):
    """comp[u] = min vertex id reachable from u (undirected reachability)."""
    n = len(adj)
    comp = [-1] * n
    for s in range(n):
        if comp[s] != -1:
            continue
        comp[s] = s
        q = deque([s])
        while q:
            u = q.popleft()
            for v, _ in adj[u]:
                if comp[v] == -1:
                    comp[v] = s
                    q.append(v)
    return comp


def label_propagation_seq(adj, max_iter: int = 10):
    """Synchronous weighted label propagation.

    Each round every vertex simultaneously takes the label with the
    largest total incident edge weight among its neighbors (self-loops
    ignored); ties break to the smallest label id; isolated vertices
    keep their own label. Runs `max_iter` rounds or until a fixpoint.
    Deterministic by construction.
    """
    n = len(adj)
    labels = list(range(n))
    for _ in range(max_iter):
        nxt = labels[:]
        changed = False
        for u, row in enumerate(adj):
            acc: dict = {}
            for v, w in row:
                if v == u:
                    continue
                lv = labels[v]
                acc[lv] = acc.get(lv, 0.0) + w
            if not acc:
                continue
            best = min((-wt, l) for l, wt in acc.items())[1]
            if best != labels[u]:
                changed = True
            nxt[u] = best
        labels = nxt
        if not changed:
            break
    return labels


def triangle_count_seq(adj):
    """Per-vertex triangle counts + global total.

    Counted on the simple undirected graph: self-loops dropped,
    duplicate edges collapsed, each triangle {a<b<c} counted once
    globally and credited once to each corner vertex.
    """
    n = len(adj)
    nbr = [set(v for v, _ in row if v != u) for u, row in enumerate(adj)]
    per = [0] * n
    total = 0
    for a in range(n):
        for b in nbr[a]:
            if b <= a:
                continue
            common = nbr[a] & nbr[b]
            for c in common:
                if c > b:
                    per[a] += 1
                    per[b] += 1
                    per[c] += 1
                    total += 1
    return per, total
