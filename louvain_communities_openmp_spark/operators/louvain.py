"""Louvain community detection — PySpark-native.

Re-expresses the reference's algorithm (louvain.hxx) as iterative
DataFrame super-steps + a CSR-blocked vectorized kernel. Two modes:

- ``exact``: the *sequential reference semantics* end-to-end. The edge
  table flows through a single-partition ``mapInPandas`` kernel that
  runs the faithful oracle (ascending-id sweep, immediate updates,
  first-max tie-break, community-0 quirk — oracle/louvain_seq.py, each
  rule cited to louvain.hxx there). Distributed plumbing, sequential
  semantics — this is the test-scale mode that satisfies "community
  assignments exact vs the reference's sequential Louvain".

- ``dist``: the scale mode (the analog of louvainMoveOmpW,
  louvain.hxx:587-609). Each local-move iteration: annotate edges with
  endpoint communities + weights via joins, hash-block by src, and run
  an asynchronous sequential sweep *within each block* through
  ``applyInPandas`` (block ≙ OpenMP thread chunk: threads read stale
  remote state, exactly like `schedule(dynamic,2048)` threads do);
  between iterations membership/ctot re-sync globally by shuffle
  (shuffle ≙ the reference's atomics). Aggregation phase is a pure
  DataFrame contraction: edges ⋈ membership(src) ⋈ membership(dst) →
  groupBy(csrc,cdst).sum(w)   (louvain.hxx:865-912), dense renumber in
  ascending-community order (louvain.hxx:923-928), dendrogram flatten
  via one hash join per pass (louvain.hxx:825-829).

- ``auto``: dist passes while the graph is large, then finishes with
  the exact kernel once the coarsened graph fits comfortably in one
  task (the reference itself swaps graph representations between
  passes, louvain.hxx:1174-1176).

Every pass checkpoints coarsened edges + flattened membership +
metrics/lineage to a RunDir, so any pass is resumable (north rule).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..oracle.louvain_seq import louvain_seq
from ..plans.run import RunDir
from .properties import modularity as modularity_op
from .properties import total_weight_m, vertex_weights


@dataclass
class LouvainOptions:
    """Defaults mirror the reference (louvain.hxx:60-61)."""

    resolution: float = 1.0
    tolerance: float = 1e-2
    tolerance_drop: float = 10.0
    max_iterations: int = 20
    max_passes: int = 10
    aggregation_tolerance: float = 0.8
    mode: str = "auto"  # exact | dist | auto
    num_blocks: int | None = None
    # auto mode: below this many (directed) edges, finish sequentially
    small_graph_edges: int = 500_000
    run_dir: str | None = None
    resume: bool = False


@dataclass
class LouvainResult:
    membership: DataFrame  # (id long, com long)
    modularity: float
    passes: int
    iterations: int
    pass_log: list = field(default_factory=list)


MEMBERSHIP_SCHEMA = "id long, com long"
# kernel emission: one row per block-owned vertex (authoritative com)
# plus rows flagging movers' neighbors (com null). vaff = affected flag
# for the NEXT iteration (louvain.hxx:534-539 semantics).
_MOVE_SCHEMA = "id long, com long, gain double, vaff boolean"


def _exact_kernel_factory(opts: LouvainOptions):
    res, tol, drop = opts.resolution, opts.tolerance, opts.tolerance_drop
    li, lp, at = opts.max_iterations, opts.max_passes, opts.aggregation_tolerance

    def kernel(batches):
        import numpy as np

        pdf = pd.concat(list(batches), ignore_index=True)
        if len(pdf) == 0:
            yield pd.DataFrame(
                {"id": pd.Series(dtype="int64"), "com": pd.Series(dtype="int64")}
            )
            return
        pdf = pdf.sort_values(["src", "dst"], kind="mergesort")
        ids = np.unique(np.concatenate([pdf["src"].values, pdf["dst"].values]))
        pos = {int(v): i for i, v in enumerate(ids)}
        adj: list = [[] for _ in range(len(ids))]
        for u, v, w in zip(pdf["src"].values, pdf["dst"].values, pdf["w"].values):
            adj[pos[int(u)]].append((pos[int(v)], float(w)))
        r = louvain_seq(
            adj, resolution=res, tolerance=tol, tolerance_drop=drop,
            max_iterations=li, max_passes=lp, aggregation_tolerance=at,
        )
        yield pd.DataFrame(
            {"id": ids.astype("int64"), "com": np.asarray(r.membership, dtype="int64")}
        )

    return kernel


def louvain_exact(edges: DataFrame, opts: LouvainOptions | None = None) -> DataFrame:
    """Sequential-reference-semantics Louvain through distributed plumbing.

    Ids need not be dense: the kernel remaps through ascending-id order
    (order-preserving, so on dense inputs it is bit-identical to the
    reference's indexing). Returned community ids are dense ranks.
    """
    opts = opts or LouvainOptions()
    return (
        edges.select("src", "dst", "w")
        .repartition(1)
        .mapInPandas(_exact_kernel_factory(opts), MEMBERSHIP_SCHEMA)
    )


def _mix64(x: int) -> int:
    """splitmix64 finalizer (same as oracle.graphs._mix64)."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _block_sweep(pdf: pd.DataFrame, rnd: int = 0, gate: int = 1) -> pd.DataFrame:
    """Asynchronous local-move sweep within one block (≙ one OpenMP
    thread chunk, louvain.hxx:594-605).

    Input columns: src, dst, w, dcom, scom, vtot_s, ctot_d, ctot_s,
    m2, res. Local vertices = distinct src in the block (each vertex's
    full out-adjacency is present because blocking is by src). Remote
    community state is the snapshot taken at round start; local moves
    update the local view immediately (async semantics).

    ``gate`` > 1 makes only vertices with hash(u, rnd) % gate == 0
    attempt a move this round — the distributed substitute for the
    reference's atomics: synchronous rounds would otherwise let two
    neighbors swap communities forever (both compute a gain assuming
    the other stays put). A round-varying deterministic hash breaks the
    symmetry while keeping the run reproducible.

    Deterministic: ascending-src sweep, tie-break (max ΔQ, min com).

    Frontier bookkeeping is fused into the kernel (no extra Spark jobs):
    processing clears a vertex's flag, a move flags all its neighbors —
    in-block AND out-of-block (emitted as com-null rows) — and gated
    vertices keep their flag (still unprocessed). The driver just
    groupBy(id)-merges the emissions.
    """
    import numpy as np

    if len(pdf) == 0:
        return pd.DataFrame(
            {
                "id": pd.Series(dtype="int64"),
                "com": pd.Series(dtype="Int64"),
                "gain": pd.Series(dtype="float64"),
                "vaff": pd.Series(dtype="bool"),
            }
        )
    pdf = pdf.sort_values(["src", "dst"], kind="mergesort")
    src = pdf["src"].values
    dst = pdf["dst"].values
    w = pdf["w"].values
    dcom = pdf["dcom"].values
    m = float(pdf["m2"].values[0]) / 2.0
    resolution = float(pdf["res"].values[0])

    comm: dict = {}
    ctot: dict = {}
    for v, c, ct in zip(dst, dcom, pdf["ctot_d"].values):
        comm[int(v)] = int(c)
        ctot[int(c)] = float(ct)
    scom = pdf["scom"].values
    for u, c, ct in zip(src, scom, pdf["ctot_s"].values):
        comm[int(u)] = int(c)
        ctot[int(c)] = float(ct)

    bounds = np.flatnonzero(np.r_[True, src[1:] != src[:-1], True])
    vtot_s = pdf["vtot_s"].values
    flags: dict = {}  # explicit flag updates this round (vaff)
    out_id, out_com, out_gain = [], [], []
    owned: set = set()
    for k in range(len(bounds) - 1):
        lo, hi = int(bounds[k]), int(bounds[k + 1])
        u = int(src[lo])
        owned.add(u)
        if gate > 1 and _mix64(u * 1_000_003 + rnd) % gate != 0:
            # gated out: stays marked for a later round
            flags.setdefault(u, True)
            out_id.append(u)
            out_com.append(comm[u])
            out_gain.append(0.0)
            continue
        flags[u] = False  # processing clears the flag (louvain.hxx:534)
        vtot_u = float(vtot_s[lo])
        d = comm[u]
        vcout: dict = {}
        for i in range(lo, hi):
            v = int(dst[i])
            if v == u:
                continue  # SELF=false scan (louvain.hxx:407)
            c = comm[v]
            vcout[c] = vcout.get(c, 0.0) + float(w[i])
        kud = vcout.get(d, 0.0)
        ctot_d_ = ctot.get(d, vtot_u)
        best_c, best_e = -1, 0.0
        for c, kuc in vcout.items():
            if c == d:
                continue
            e = (kuc - kud) / m - resolution * vtot_u * (
                vtot_u + ctot.get(c, 0.0) - ctot_d_
            ) / (2.0 * m * m)
            if e > best_e or (e == best_e and e > 0.0 and c < best_c):
                best_e, best_c = e, c
        if best_e > 0.0:
            ctot[d] = ctot.get(d, vtot_u) - vtot_u
            ctot[best_c] = ctot.get(best_c, 0.0) + vtot_u
            comm[u] = best_c
            # a move flags every neighbor (louvain.hxx:538-539)
            for i in range(lo, hi):
                v = int(dst[i])
                if v != u:
                    flags[v] = True
        out_id.append(u)
        out_com.append(comm[u])
        out_gain.append(best_e)
    out_vaff = [bool(flags.get(u, False)) for u in out_id]
    # out-of-block neighbors flagged by movers: com-null emissions
    for v, fl in flags.items():
        if fl and v not in owned:
            out_id.append(v)
            out_com.append(None)
            out_gain.append(0.0)
            out_vaff.append(True)
    return pd.DataFrame(
        {
            "id": pd.Series(out_id, dtype="int64"),
            "com": pd.Series(out_com, dtype="Int64"),
            "gain": pd.Series(out_gain, dtype="float64"),
            "vaff": pd.Series(out_vaff, dtype="bool"),
        }
    )


def _local_move_round(
    edges: DataFrame,
    membership: DataFrame,
    vtot: DataFrame,
    ctot: DataFrame,
    m: float,
    resolution: float,
    num_blocks: int,
    rnd: int = 0,
    gate: int = 1,
    frontier: DataFrame | None = None,
):
    """One distributed local-move iteration → (state, Σ gains).

    The cogroup/aggregate formulation of louvainScanCommunitiesW
    (louvain.hxx:405-438): joins materialize (u, neighbor-community,
    weight, snapshot ctot) tuples; the Arrow kernel does the sequential
    argmax sweep per block, emitting new communities AND next-round
    affected flags in one pass.

    Returned ``state`` is a single eagerly-checkpointed frame
    (id, com, vaff, gain) — the whole iteration is ONE Spark job (plus
    the trivial gain sum over the checkpointed result). This matters:
    the driver loop runs O(passes × iterations) rounds, so per-round
    job count, not data size, dominates latency on all but the largest
    graphs.
    """
    md = membership.select(F.col("id").alias("dst"), F.col("com").alias("dcom"))
    ms = membership.select(F.col("id").alias("src"), F.col("com").alias("scom"))
    vt = vtot.select(F.col("id").alias("src"), F.col("vtot").alias("vtot_s"))
    ctd = ctot.select(F.col("com").alias("dcom"), F.col("ctot").alias("ctot_d"))
    cts = ctot.select(F.col("com").alias("scom"), F.col("ctot").alias("ctot_s"))
    if frontier is not None:
        # affected-vertex pruning (vaff, louvain.hxx:534-539): only
        # flagged vertices are re-scanned; the semi-join prunes their
        # adjacency before the expensive annotation joins
        edges = edges.join(
            frontier.withColumnRenamed("id", "src"), "src", "left_semi"
        )
    annotated = (
        edges.join(md, "dst")
        .join(ms, "src")
        .join(vt, "src")
        .join(ctd, "dcom")
        .join(cts, "scom")
        .withColumn("m2", F.lit(2.0 * m))
        .withColumn("res", F.lit(resolution))
        .withColumn("block", F.pmod(F.hash("src"), F.lit(num_blocks)))
    )
    emitted = annotated.groupBy("block").applyInPandas(
        lambda _, p: _block_sweep(p, rnd, gate), _MOVE_SCHEMA
    )
    # merge kernel emissions: authoritative com from the owning block
    # (max over exactly one non-null), vaff = any block flagged it
    agg = emitted.groupBy("id").agg(
        F.max("com").alias("_nc"),
        F.sum("gain").alias("_gain"),
        F.max("vaff").alias("_vaff"),
    )
    # localCheckpoint truncates the logical plan — without it every
    # iteration's plan embeds all previous iterations and Catalyst
    # planning time grows superlinearly with rounds
    state = (
        membership.join(agg, "id", "left")
        .select(
            "id",
            F.coalesce("_nc", "com").alias("com"),
            F.coalesce("_vaff", F.lit(False)).alias("vaff"),
            F.coalesce("_gain", F.lit(0.0)).alias("gain"),
        )
        .localCheckpoint(eager=True)
    )
    el = state.agg(F.sum("gain").alias("el")).collect()[0]["el"] or 0.0
    return state, float(el)


def _renumber(membership: DataFrame) -> DataFrame:
    """Dense renumber, ascending old community id — the same order as
    the reference's exclusive scan over the existence bitmap
    (louvain.hxx:923-928)."""
    from ..sources.edges import dense_ids

    mapping = dense_ids(membership.select("com"), "com", "new_com")
    return membership.join(mapping, "com").select(
        "id", F.col("new_com").alias("com")
    )


def _contract(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """Graph coarsening: groupBy-community edge contraction, SELF=true
    (self-loops kept so total weight is conserved, louvain.hxx:874)."""
    ms = membership.select(F.col("id").alias("src"), F.col("com").alias("csrc"))
    md = membership.select(F.col("id").alias("dst"), F.col("com").alias("cdst"))
    return (
        edges.join(ms, "src")
        .join(md, "dst")
        .groupBy(F.col("csrc").alias("src"), F.col("cdst").alias("dst"))
        .agg(F.sum("w").alias("w"))
    )


def _compose(ucom: DataFrame | None, mem: DataFrame) -> DataFrame:
    """ucom ∘ mem: re-point original vertices through the current level
    (dendrogram flatten, louvain.hxx:825-829). ucom=None ≡ identity."""
    if ucom is None:
        return mem
    lvl = mem.select(F.col("id").alias("com"), F.col("com").alias("_c2"))
    return ucom.join(lvl, "com").select("id", F.col("_c2").alias("com"))


def louvain(edges: DataFrame, opts: LouvainOptions | None = None) -> LouvainResult:
    """Run Louvain over a symmetric edge DataFrame (src, dst, w).

    Pass-loop orchestration mirrors louvainInvoke (louvain.hxx:1009-1106):
    init singletons → local-move to tolerance → stop on m≤1 / p≥P /
    CN/GN ≥ aggregationTolerance → renumber → flatten → contract →
    re-init → E /= toleranceDrop.
    """
    opts = opts or LouvainOptions()
    spark = edges.sparkSession
    if opts.mode == "exact":
        mem = louvain_exact(edges, opts).persist()
        q = modularity_op(edges, mem, opts.resolution)
        return LouvainResult(mem, q, -1, -1, [{"mode": "exact"}])

    run = RunDir(opts.run_dir) if opts.run_dir else None
    num_blocks = opts.num_blocks or max(
        int(spark.conf.get("spark.sql.shuffle.partitions")), 1
    )
    original_edges = edges
    m_total = total_weight_m(edges)
    if m_total <= 0:
        return LouvainResult(
            spark.createDataFrame([], MEMBERSHIP_SCHEMA), 0.0, 0, 0, []
        )

    p = 0
    ucom: DataFrame | None = None  # original vertex → current-level vertex
    if opts.resume and run is not None:
        last = run.last_completed_pass()
        if last is not None:
            edges, ucom, manifest = run.load_pass(spark, last)
            edges = edges.persist()
            ucom = ucom.persist()
            if manifest.get("done"):
                q = modularity_op(original_edges, ucom, opts.resolution)
                return LouvainResult(
                    ucom, q, last + 1, manifest.get("total_iterations", -1),
                    [{"resumed_finished": True}],
                )
            p = last + 1

    pass_log: list = []
    total_iters = 0
    final_mem: DataFrame | None = None
    while p < opts.max_passes:
        E = opts.tolerance / (opts.tolerance_drop ** p)
        n_edges = edges.count()
        # ---- auto fast path: finish sequentially on the small remainder
        if opts.mode == "auto" and n_edges <= opts.small_graph_edges:
            sub = LouvainOptions(
                resolution=opts.resolution, tolerance=E,
                tolerance_drop=opts.tolerance_drop,
                max_iterations=opts.max_iterations,
                max_passes=opts.max_passes - p,
                aggregation_tolerance=opts.aggregation_tolerance,
            )
            mem = louvain_exact(edges, sub).persist()
            final_mem = _compose(ucom, mem).persist()
            pass_log.append({"pass": p, "mode": "exact_finish", "edges": n_edges})
            p += 1
            break

        t0 = time.time()
        vtot = vertex_weights(edges).persist()
        gn = vtot.count()
        mem = vtot.select("id", F.col("id").alias("com")).localCheckpoint(eager=True)
        ctot = vtot.select(F.col("id").alias("com"), F.col("vtot").alias("ctot"))
        iters = 0
        low_rounds = 0
        el_pass = 0.0
        frontier: DataFrame | None = None  # None ≙ all marked (static fm)
        _dbg = os.environ.get("LOUVAIN_DEBUG_TIMING")
        while iters < opts.max_iterations:
            _t_it = time.time()
            state, el = _local_move_round(
                edges, mem, vtot, ctot, m_total, opts.resolution, num_blocks,
                rnd=iters, gate=2, frontier=frontier,
            )
            # state is checkpointed: these are zero-cost projections
            mem = state.select("id", "com")
            frontier = state.where("vaff").select("id")
            ctot = vtot.join(mem, "id").groupBy("com").agg(F.sum("vtot").alias("ctot"))
            iters += 1
            el_pass += el
            if _dbg:
                print(
                    f"[louvain] pass={p} it={iters} {time.time() - _t_it:.1f}s "
                    f"el={el:.5f}",
                    flush=True,
                )
            # gated rounds: require two consecutive below-tolerance
            # rounds (each round only half the vertices may move)
            low_rounds = low_rounds + 1 if el <= E else 0
            if low_rounds >= 2 or el == 0.0:
                break
        t_move = time.time() - t0
        total_iters += iters
        rec = {"pass": p, "iterations": iters, "edges": n_edges,
               "vertices": gn, "t_move": round(t_move, 3)}
        p += 1
        # pass made essentially no progress → stop (reference's m≤1,
        # louvain.hxx:1186, adapted to gated rounds)
        if el_pass <= E or p >= opts.max_passes:
            final_mem = _compose(ucom, mem).persist()
            pass_log.append(rec)
            break
        cn = mem.select("com").distinct().count()
        rec["communities"] = cn
        pass_log.append(rec)
        if cn / gn >= opts.aggregation_tolerance:
            final_mem = _compose(ucom, mem).persist()
            break
        t1 = time.time()
        mem_r = _renumber(mem).persist()
        # eager localCheckpoints: truncate cross-pass lineage (the
        # DataFrame analog of the reference's per-pass CSR rebuild,
        # louvain.hxx:1174-1176)
        new_ucom = _compose(ucom, mem_r).localCheckpoint(eager=True)
        new_edges = _contract(edges, mem_r).localCheckpoint(eager=True)
        rec["t_agg"] = round(time.time() - t1, 3)
        if run is not None:
            run.save_pass(
                p - 1, new_edges, new_ucom,
                {"iterations": iters, "communities": cn, "total_iterations": total_iters},
            )
        if ucom is not None:
            ucom.unpersist()
        ucom = new_ucom
        edges = new_edges
        vtot.unpersist()
        mem_r.unpersist()

    if final_mem is None:
        final_mem = (ucom if ucom is not None else edges.sparkSession.createDataFrame([], MEMBERSHIP_SCHEMA)).persist()
    if run is not None:
        run.save_pass(p - 1, edges, final_mem, {"done": True, "total_iterations": total_iters})
    q = modularity_op(original_edges, final_mem, opts.resolution)
    return LouvainResult(final_mem, q, p, total_iters, pass_log)
