"""Deterministic graph fixtures (FIXTURES.md §2).

Every fixture returns a *directed symmetric* edge list
``[(src, dst, w), ...]`` — both directions stored, matching the
reference's convention of storing an undirected graph as a
symmetricized digraph (reference: main.cxx:102, symmetricize.hxx:72-82)
with total undirected weight ``M = Σw / 2`` (reference: main.cxx:67).

All generation is seed-free and hash-arithmetic deterministic: no
``random``, no wall clock.
"""

from __future__ import annotations


def undirected(pairs, w: float = 1.0):
    """Symmetric closure of an undirected edge list.

    ``pairs`` may be ``(u, v)`` or ``(u, v, w)`` tuples. Self-loops are
    emitted once (a self-loop is its own reverse in the reference's
    digraph storage).
    """
    out = []
    for p in pairs:
        if len(p) == 3:
            u, v, wt = p
        else:
            u, v = p
            wt = w
        out.append((u, v, float(wt)))
        if u != v:
            out.append((v, u, float(wt)))
    return out


def adjacency(edges, n: int | None = None):
    """Adjacency list ``adj[u] = [(v, w), ...]`` sorted by ``v``.

    Matches the reference's pass-0 graph: LazyBitset rows are sorted by
    destination id (_bitset.hxx:227-262). Duplicate (u,v) edges collapse
    keeping the *last* weight (LazyBitset set-union-last semantics,
    _bitset.hxx:245-262).
    """
    if n is None:
        n = 1 + max(max(u, v) for u, v, _ in edges) if edges else 0
    rows: list[dict] = [dict() for _ in range(n)]
    for u, v, w in edges:
        rows[u][v] = float(w)  # last write wins
    return [sorted(r.items()) for r in rows]


def toy5():
    """5 vertices, 2 triangles sharing vertex 2."""
    return undirected([(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (2, 4)])


def toy5_selfloops():
    """toy5 plus self-loops (u,u,2.0) on vertices 0 and 2."""
    return toy5() + [(0, 0, 2.0), (2, 2, 2.0)]


def toy5_weighted():
    """toy5 with deterministic weights, equal both directions."""
    pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (2, 4)]
    out = []
    for u, v in pairs:
        w = ((u * 31 + v) % 5 + 1) / 2.0
        out.append((u, v, w))
        out.append((v, u, w))
    return out


def two_cliques(k: int = 8, bridge: bool = True):
    """Two K_k cliques joined by a single bridge edge (0, k)."""
    pairs = []
    for base in (0, k):
        for i in range(k):
            for j in range(i + 1, k):
                pairs.append((base + i, base + j))
    if bridge:
        pairs.append((0, k))
    return undirected(pairs)


def disconnected(k: int = 8, isolated: int = 3):
    """two_cliques without the bridge; `isolated` extra degree-0 vertices.

    Returns (edges, n) since isolated vertices don't appear in edges.
    """
    return two_cliques(k, bridge=False), 2 * k + isolated


def ring_of_cliques(k: int = 16, c: int = 8):
    """k cliques of size c in a ring; one bridge between adjacent cliques."""
    pairs = []
    for q in range(k):
        base = q * c
        for i in range(c):
            for j in range(i + 1, c):
                pairs.append((base + i, base + j))
        nxt = ((q + 1) % k) * c
        pairs.append((base, nxt + 1 if k > 1 else nxt))
    return undirected(pairs)


# Zachary's karate club — 34 vertices, 78 undirected edges (public data;
# the classic community-detection benchmark). 1-indexed pairs below.
_KARATE_1IDX = [
    (1, 2), (1, 3), (1, 4), (1, 5), (1, 6), (1, 7), (1, 8), (1, 9),
    (1, 11), (1, 12), (1, 13), (1, 14), (1, 18), (1, 20), (1, 22), (1, 32),
    (2, 3), (2, 4), (2, 8), (2, 14), (2, 18), (2, 20), (2, 22), (2, 31),
    (3, 4), (3, 8), (3, 9), (3, 10), (3, 14), (3, 28), (3, 29), (3, 33),
    (4, 8), (4, 13), (4, 14),
    (5, 7), (5, 11),
    (6, 7), (6, 11), (6, 17),
    (7, 17),
    (9, 31), (9, 33), (9, 34),
    (10, 34),
    (14, 34),
    (15, 33), (15, 34),
    (16, 33), (16, 34),
    (19, 33), (19, 34),
    (20, 34),
    (21, 33), (21, 34),
    (23, 33), (23, 34),
    (24, 26), (24, 28), (24, 30), (24, 33), (24, 34),
    (25, 26), (25, 28), (25, 32),
    (26, 32),
    (27, 30), (27, 34),
    (28, 34),
    (29, 32), (29, 34),
    (30, 33), (30, 34),
    (31, 33), (31, 34),
    (32, 33), (32, 34),
    (33, 34),
]


def karate():
    return undirected([(u - 1, v - 1) for u, v in _KARATE_1IDX])


def _mix64(x: int) -> int:
    """splitmix64 finalizer — deterministic hash arithmetic."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def power_law(n: int = 10_000, m: int = 4):
    """Deterministic Barabási–Albert-style preferential attachment.

    Vertex i (i ≥ m) attaches to m distinct earlier vertices chosen by
    hashing into the running endpoint list (endpoint frequency ∝ degree
    → preferential attachment) — hub vertices emerge with degree ≫ mean,
    exercising the skew paths.
    """
    targets = list(range(m))  # seed clique endpoints
    pairs = []
    for i in range(m, n):
        chosen: set[int] = set()
        j = 0
        while len(chosen) < min(m, i):
            t = targets[_mix64(i * 1_000_003 + j) % len(targets)]
            j += 1
            if t != i:
                chosen.add(t)
        for t in sorted(chosen):
            pairs.append((i, t))
            targets.append(i)
            targets.append(t)
    return undirected(pairs)


def random_directed(n: int = 200, m: int = 600, seed: int = 1):
    """Deterministic directed multigraph via splitmix64 draws: m edge
    slots, endpoints hashed from (seed, slot). Self-loops skipped.
    Produces web-like structure at m/n ≳ 2 (one mid-size SCC plus
    IN/OUT periphery and singleton tendrils)."""
    pairs = []
    for k in range(m):
        u = _mix64(seed * 7_368_787 + 2 * k) % n
        v = _mix64(seed * 9_479_113 + 2 * k + 1) % n
        if u != v:
            pairs.append((u, v))
    return pairs


def bowtie(c1: int = 6, c2: int = 5, tail: int = 3):
    """Two directed cycles (sizes c1, c2) joined by a one-way bridge,
    plus a DAG tail off the second cycle — the minimal Broder bow-tie."""
    a = [(i, (i + 1) % c1) for i in range(c1)]
    b = [(c1 + i, c1 + (i + 1) % c2) for i in range(c2)]
    bridge = [(0, c1)]
    t0 = c1 + c2
    t = [(c1 + i % c2, t0 + i) for i in range(tail)]
    return a + b + bridge + t
