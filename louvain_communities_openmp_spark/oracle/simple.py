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


def hits_seq(adj, iters: int = 4):
    """Fixed-iteration L1-normalized HITS (operators/hits.py twin):
    h ← A·a, normalize; a ← Aᵀ·h, normalize. Returns (hubs, auths)."""
    n = len(adj)
    if n == 0:
        return [], []
    a = [1.0 / n] * n
    h = [0.0] * n
    for _ in range(iters):
        h = [0.0] * n
        for u, row in enumerate(adj):
            h[u] = sum(w * a[v] for v, w in row)
        z = sum(h) or 1.0
        h = [x / z for x in h]
        a = [0.0] * n
        for u, row in enumerate(adj):
            for v, w in row:
                a[v] += w * h[u]
        z = sum(a) or 1.0
        a = [x / z for x in a]
    return h, a


def ktruss_seq(pairs, k: int = 4):
    """Synchronous-peeling k-truss (operators/ktruss.py twin): each
    round drops every edge with support < k-2 simultaneously. Returns
    (sorted [(src, dst, support)], rounds) — rounds includes the final
    no-drop confirmation round, matching the engine's count."""
    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    rounds = 0
    while edges:
        nbrs = {}
        for a, b in edges:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        sup = {e: len(nbrs[e[0]] & nbrs[e[1]]) for e in edges}
        drop = {e for e, s in sup.items() if s < k - 2}
        rounds += 1
        if not drop:
            return sorted((a, b, sup[(a, b)]) for a, b in edges), rounds
        edges -= drop
    return [], rounds


def betweenness_seq(adj_pairs, sources, max_depth: int = 8):
    """Truncated Brandes (operators/betweenness.py twin): BFS with
    path counting from each source, dependency accumulation over
    levels, paths capped at ``max_depth`` hops. ``adj_pairs`` is a
    directed (u, v) edge list (parallel edges collapsed). Returns
    {v: betweenness} over every vertex that appears."""
    out_nbrs: dict = {}
    verts = set()
    for u, v in set(adj_pairs):
        out_nbrs.setdefault(u, []).append(v)
        verts.add(u)
        verts.add(v)
    bc = {v: 0.0 for v in verts}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1.0}
        levels = [[s]]
        while len(levels) - 1 < max_depth and levels[-1]:
            nxt: dict = {}
            for v in levels[-1]:
                for w in out_nbrs.get(v, ()):
                    if w not in dist:
                        nxt[w] = nxt.get(w, 0.0) + sigma[v]
            for w, c in nxt.items():
                dist[w] = len(levels)
                sigma[w] = c
            levels.append(list(nxt))
        delta = {v: 0.0 for v in dist}
        for t in range(len(levels) - 2, -1, -1):
            for v in levels[t]:
                acc = 0.0
                for w in out_nbrs.get(v, ()):
                    if dist.get(w) == t + 1:
                        acc += sigma[v] / sigma[w] * (1.0 + delta[w])
                delta[v] = acc
                if v != s:
                    bc[v] += acc
    return bc


def ktruss_peel_seq(pairs, k: int = 4, rounds: int = 4):
    """Fixed-round peeling (operators/ktruss.py ktruss_peel twin):
    exactly ``rounds`` synchronous drop rounds, then support recomputed
    on the survivors, returned unfiltered as sorted (src, dst, sup)."""
    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}

    def support(es):
        nbrs = {}
        for a, b in es:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        return {e: len(nbrs[e[0]] & nbrs[e[1]]) for e in es}

    for _ in range(rounds):
        sup = support(edges)
        edges = {e for e in edges if sup[e] >= k - 2}
    sup = support(edges)
    return sorted((a, b, sup[(a, b)]) for a, b in edges)


def sssp_seq(weighted_edges, sources, rounds: int = 6):
    """Fixed-round Bellman-Ford (operators/sssp.py twin): full
    relaxation, ``rounds`` rounds. ``weighted_edges`` is directed
    (u, v, w). Returns {(s, v): dist} for reached pairs."""
    dist = {(s, s): 0.0 for s in sources}
    for _ in range(rounds):
        nxt = dict(dist)
        for u, v, w in weighted_edges:
            for s in sources:
                du = dist.get((s, u))
                if du is not None and du + w < nxt.get((s, v), float("inf")):
                    nxt[(s, v)] = du + w
        if nxt == dist:
            break
        dist = nxt
    return dist


def scc_seq(directed_pairs):
    """Iterative Tarjan SCC (directed). ``directed_pairs`` is (u, v)
    tuples; vertices = all endpoints. Returns {v: min id in SCC(v)} —
    the canonical-label contract of operators/scc.py."""
    adj: dict[int, list[int]] = {}
    verts: set[int] = set()
    for u, v in directed_pairs:
        verts.add(u)
        verts.add(v)
        if u != v:
            adj.setdefault(u, []).append(v)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    out: dict[int, int] = {}
    counter = [0]

    def strongconnect(root: int) -> None:
        # explicit DFS stack: (vertex, iterator position)
        work = [(root, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            nbrs = adj.get(v, ())
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if not recurse:
                if low[v] == index[v]:
                    comp = []
                    while True:
                        w = stack.pop()
                        on_stack.discard(w)
                        comp.append(w)
                        if w == v:
                            break
                    m = min(comp)
                    for w in comp:
                        out[w] = m
                if work:
                    parent = work[-1][0]
                    low[parent] = min(low[parent], low[v])

    for v in sorted(verts):
        if v not in index:
            strongconnect(v)
    return out
