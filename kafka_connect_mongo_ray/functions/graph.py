"""Distributed connected components over an edge Dataset.

Near-dup pipelines need one more step than pair detection: grouping the
pairs into duplicate CLUSTERS and electing a canonical document per
cluster (the reference's analog of neutralizing duplicates is per-key
upsert, ``sink/MongoSinkTask.kt:71-79`` — per-PAIR thinking; clusters
need a graph pass). This is min-label propagation with pointer jumping,
the classic MapReduce connected-components loop (cf. Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14):

- every node starts labeled with itself;
- each round ships every node's current label to its neighbours and
  keeps the per-node minimum, then POINTER-JUMPS (``comp[v] ←
  comp[comp[v]]``) so labels hop doubling distances instead of one edge
  per round — O(log diameter) rounds instead of O(diameter);
- labels only ever decrease, so the global label sum is a monotone
  convergence metric: a round that leaves the sum unchanged is the
  fixed point (label = min node id of the component). The sum is
  computed EXACTLY (Python-int precision) from four 16-bit limb
  partial sums, so the early exit cannot alias via int64 wrap even
  past 2^31 nodes — each limb sum stays below 2^63 for up to 2^55
  label rows.

Execution shape (deliberate): every step is a SINGLE-shuffle plan — a
union of two tagged map_batches branches into one ``groupby`` — and the
node-sized label table is materialized between steps. Joins are avoided
on purpose: chaining several un-materialized all-to-all operators into
one lazy plan starves under the streaming executor's per-operator
resource reservation (measured 99 s vs 3 s for one tiny round), the
same effect documented for the staged near-dup pipeline
(``pipelines/queries.py::verified_near_dup_pairs``). Per-round driver
state is one scalar (the label sum).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["connected_components", "pagerank", "triangle_count"]

_KEY = "__cc_key"
_NODE = "__cc_node"
_COMP = "__cc_comp"


def _emit_neighbour_labels(g: pa.Table) -> pa.Table:
    """Group = one node's rows: its single label row (comp non-null)
    plus one row per neighbour (node non-null). Every neighbour — and
    the node itself — receives the node's current label."""
    comp = pc.min(g[_COMP]).as_py()
    others = g[_NODE].filter(pc.is_valid(g[_NODE])).combine_chunks()
    key = pa.concat_arrays([others.cast(pa.int64()),
                            pa.array([g[_KEY][0].as_py()], pa.int64())])
    return pa.table({_KEY: key,
                     _COMP: pa.array(np.full(len(key), comp, np.int64))})


def _emit_jumped(g: pa.Table) -> pa.Table:
    """Group key k = a label value. Contains the single label row OF
    node k (comp non-null → k's own label) and the nodes currently
    labeled k (node non-null). Rewrite each to k's label."""
    comp = pc.min(g[_COMP]).as_py()
    nodes = g[_NODE].filter(pc.is_valid(g[_NODE])).combine_chunks()
    return pa.table({_NODE: nodes.cast(pa.int64()),
                     _COMP: pa.array(np.full(len(nodes), comp, np.int64))})


def _exact_label_sum(labels) -> int:
    """Exact (arbitrary-precision) sum of the label column.

    Eight 8-bit limb partial sums — each below 2^63 for up to 2^55
    label rows — recombined with Python ints on the driver, so the
    convergence early-exit in :func:`connected_components` cannot
    alias through int64 wrap at any realistic node count. Assumes
    non-negative node ids (enforced by the caller's contract)."""
    from ray.data.aggregate import Sum

    def limbs(batch: pa.Table) -> pa.Table:
        comp = pc.cast(batch[_COMP], pa.int64())
        return pa.table({
            f"l{i}": pc.bit_wise_and(pc.shift_right(comp, 8 * i), 0xFF)
            for i in range(8)
        })

    row = labels.map_batches(limbs, batch_format="pyarrow").aggregate(
        *[Sum(f"l{i}", alias_name=f"l{i}") for i in range(8)])
    return sum(int(row[f"l{i}"]) << (8 * i) for i in range(8))


def connected_components(edges_ds, *, src: str = "id_a", dst: str = "id_b",
                         node_col: str = "node", comp_col: str = "component",
                         num_buckets: int = 16, max_iters: int = 50):
    """Label every node of the undirected graph ``edges_ds`` with the
    smallest node id reachable from it (= a canonical component id).
    Node ids must be non-negative integers (the exact-sum convergence
    check decomposes labels into unsigned limbs). Returns a Dataset
    (node_col, comp_col) covering every node that appears in an edge."""
    from ray.data.aggregate import Min

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = pc.cast(batch[src], pa.int64()).combine_chunks()
        b = pc.cast(batch[dst], pa.int64()).combine_chunks()
        return pa.table({_KEY: pa.concat_arrays([a, b]),
                         _NODE: pa.concat_arrays([b, a])})

    # edge-sized, re-read every round: materialize once
    sym = edges_ds.map_batches(symmetrize, batch_format="pyarrow").materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        u = pc.unique(batch[_KEY])
        return pa.table({_KEY: u, _COMP: u})

    labels = (sym.map_batches(init_labels, batch_format="pyarrow")
              .groupby(_KEY, num_partitions=num_buckets)
              .aggregate(Min(_COMP, alias_name=_COMP))
              .materialize())

    def edges_with_null_comp(batch: pa.Table) -> pa.Table:
        return batch.append_column(_COMP, pa.nulls(batch.num_rows, pa.int64()))

    def labels_with_null_node(batch: pa.Table) -> pa.Table:
        return pa.table({_KEY: batch[_KEY],
                         _NODE: pa.nulls(batch.num_rows, pa.int64()),
                         _COMP: batch[_COMP]})

    def labels_keyed_by_comp(batch: pa.Table) -> pa.Table:
        return pa.table({_KEY: batch[_COMP], _NODE: batch[_KEY],
                         _COMP: pa.nulls(batch.num_rows, pa.int64())})

    def labels_keyed_by_node(batch: pa.Table) -> pa.Table:
        return pa.table({_KEY: batch[_KEY],
                         _NODE: pa.nulls(batch.num_rows, pa.int64()),
                         _COMP: batch[_COMP]})

    prev_sum = None
    for _ in range(max_iters):
        # 1) propagate: each node's label reaches all its neighbours
        #    (shuffle by source node), then keep the per-node minimum
        #    (shuffle by target node)
        cands = (sym.map_batches(edges_with_null_comp, batch_format="pyarrow")
                 .union(labels.map_batches(labels_with_null_node,
                                           batch_format="pyarrow"))
                 .groupby(_KEY, num_partitions=num_buckets)
                 .map_groups(_emit_neighbour_labels, batch_format="pyarrow"))
        labels = (cands.groupby(_KEY, num_partitions=num_buckets)
                  .aggregate(Min(_COMP, alias_name=_COMP))
                  .repartition(num_buckets)
                  .materialize())

        # 2) pointer jump: comp[v] ← comp[comp[v]] — group label rows by
        #    their comp VALUE together with the label row OF that comp
        labels = (labels.map_batches(labels_keyed_by_comp,
                                     batch_format="pyarrow")
                  .union(labels.map_batches(labels_keyed_by_node,
                                            batch_format="pyarrow"))
                  .groupby(_KEY, num_partitions=num_buckets)
                  .map_groups(_emit_jumped, batch_format="pyarrow")
                  .map_batches(lambda t: t.rename_columns([_KEY, _COMP]),
                               batch_format="pyarrow")
                  # the two-branch union doubles the block count every
                  # round — without this coalesce the per-block fixed
                  # cost grows exponentially with round number
                  .repartition(num_buckets)
                  .materialize())

        # early exit; labels strictly decrease until fixed point, so an
        # unchanged sum means converged. Computed exactly via limb
        # partial sums (no int64-wrap aliasing); max_iters bounds the
        # loop regardless: pointer jumping converges in O(log n) rounds.
        cur_sum = _exact_label_sum(labels)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return labels.map_batches(
        lambda t: t.rename_columns([node_col, comp_col]),
        batch_format="pyarrow")


_PR_BROADCAST_MAX_NODES = 200_000


def pagerank(edges_ds, *, src: str = "src", dst: str = "dst",
             iterations: int = 2, damping: float = 0.85,
             num_buckets: int = 16, round_to: int = 9):
    """Fixed-iteration PageRank over a DIRECTED edge Dataset (pass both
    directions for an undirected graph — that also guarantees no
    dangling nodes, so no teleport-mass redistribution is needed):

        r_{t+1}(v) = (1-d)/N + d * Σ_{u→v} r_t(u) / outdeg(u)

    with uniform r_0 = 1/N over the nodes that have an out-edge.
    Returns (node, rank) with rank rounded half-away-from-zero to
    ``round_to`` (mirror the literal op order in SQL:
    ``(1-d)/N + d * SUM(r/outdeg)``; per-group sum order differs
    between engines by ~1 ULP, nine decades under the grid at any
    realistic N).

    Two physical plans, picked by a node-count size guard (the repo's
    ``_SUPP_BROADCAST_MAX_ROWS`` pattern, fallback pinned equal by
    test):

    - **broadcast state** (node domain ≤ ``_PR_BROADCAST_MAX_NODES``):
      the (node, outdeg, rank) state lives in one object-store ref;
      each iteration is ONE streaming pass over the materialized edges
      (searchsorted rank lookup, batch-local per-dst partial sums) and
      one node-domain exchange — no joins at all. Driver state is
      node-domain-bounded by the guard, the same contract the repo's
      other dimension-sized driver tables use.
    - **join fallback** (bigger graphs): per iteration ONE bucketed
      edges⋈state join (fact-sized), batch-local per-dst partials, one
      dst-domain exchange, then a node-domain join to re-attach
      outdeg — state is node-domain and MATERIALIZED between rounds
      (the NEXT.md #2 multi-all-to-all staging rule). Driver state:
      two scalars."""
    from ray.data.aggregate import Count, Sum

    from kafka_connect_mongo_ray.stages.join import hash_join

    edges = edges_ds.map_batches(
        lambda t: pa.table({"src": pc.cast(t[src], pa.int64()),
                            "dst": pc.cast(t[dst], pa.int64())}),
        batch_format="pyarrow").materialize()  # consumed every round

    outdeg = edges.groupby("src").aggregate(Count()).map_batches(
        lambda t: pa.table({"src": t["src"],
                            "d": pc.cast(t["count()"], pa.int64())}),
        batch_format="pyarrow").materialize()
    n = outdeg.count()
    base = (1.0 - damping) / n
    r0 = 1.0 / n

    if n <= _PR_BROADCAST_MAX_NODES:
        return _pagerank_broadcast(edges, outdeg, n=n, base=base, r0=r0,
                                   iterations=iterations, damping=damping,
                                   round_to=round_to)

    state = outdeg.map_batches(
        lambda t: t.append_column(
            "r", pa.array(np.full(t.num_rows, r0, np.float64))),
        batch_format="pyarrow").materialize()

    for _ in range(iterations):
        joined = hash_join(edges, state, on=["src"],
                           num_buckets=num_buckets)

        def contrib_partial(batch: pa.Table) -> pa.Table:
            c = (np.asarray(batch["r"], dtype=np.float64)
                 / np.asarray(batch["d"], dtype=np.float64))
            g = pa.table({"dst": batch["dst"],
                          "c": pa.array(c, pa.float64())}
                         ).group_by("dst").aggregate([("c", "sum")])
            return g.rename_columns(["dst", "c"])

        # stage the dst-domain sums: join → groupby → join chained
        # lazily is the NEXT.md #2 starvation case (measured 143 s →
        # 9 s at the sf0.001 gate with this and the ranks staging)
        sums = (joined.map_batches(contrib_partial, batch_format="pyarrow")
                .groupby("dst").aggregate(Sum("c", alias_name="c"))
                .materialize())

        def finish(t: pa.Table) -> pa.Table:
            r = base + damping * np.asarray(t["c"], dtype=np.float64)
            return pa.table({"src": t["dst"],
                             "r": pa.array(r, pa.float64())})

        ranks = sums.map_batches(finish, batch_format="pyarrow")
        state = hash_join(outdeg, ranks, on=["src"],
                          num_buckets=num_buckets).materialize()

    def emit(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["src"],
            "rank": pc.round(t["r"], round_to,
                             round_mode="half_towards_infinity"),
        })

    return state.map_batches(emit, batch_format="pyarrow")


def _pagerank_broadcast(edges, outdeg, *, n: int, base: float, r0: float,
                        iterations: int, damping: float, round_to: int):
    """Small-node-domain PageRank plan: state broadcast via ``ray.put``
    (read once per task, never re-shipped per batch), contributions
    computed by a sorted-array ``searchsorted`` lookup inside one
    streaming edge pass, ONE node-domain Sum exchange per iteration,
    state folded driver-side (node-domain-bounded by the caller's size
    guard). Emits the identical values as the join plan: the same
    ``r/outdeg`` divisions feed the same batch-local + exchange Sum
    kernels, and inner-join semantics are preserved (a node with no
    in-edge drops out of state — impossible on undirected-doubled
    input)."""
    import ray
    from ray.data.aggregate import Sum

    od = outdeg.to_pandas()
    nodes = od["src"].to_numpy(dtype=np.int64)
    order = np.argsort(nodes, kind="stable")
    nodes = nodes[order]
    deg = od["d"].to_numpy(dtype=np.int64)[order].astype(np.float64)
    ranks = np.full(len(nodes), r0, np.float64)

    for _ in range(iterations):
        state_ref = ray.put((nodes, ranks / deg))

        def contrib_partial(batch: pa.Table) -> pa.Table:
            snodes, srd = ray.get(state_ref)
            s = np.asarray(batch["src"], dtype=np.int64)
            idx = np.searchsorted(snodes, s)
            # inner-join semantics, mirroring the join plan: after the
            # first iteration state holds RECEIVING nodes only, so on a
            # directed graph an edge whose src has no in-edges is not in
            # snodes — drop it (unguarded srd[idx] would IndexError past
            # the end or silently read a neighbor's rank)
            hit = (idx < len(snodes)) & (
                snodes[np.minimum(idx, len(snodes) - 1)] == s)
            dst = np.asarray(batch["dst"], dtype=np.int64)[hit]
            g = pa.table({"dst": pa.array(dst),
                          "c": pa.array(srd[idx[hit]], pa.float64())}
                         ).group_by("dst").aggregate([("c", "sum")])
            return g.rename_columns(["dst", "c"])

        sums = (edges.map_batches(contrib_partial, batch_format="pyarrow")
                .groupby("dst").aggregate(Sum("c", alias_name="c"))
                .to_pandas())
        dst = sums["dst"].to_numpy(dtype=np.int64)
        c = sums["c"].to_numpy(dtype=np.float64)
        # inner-join semantics: state becomes the receiving nodes only
        keep = np.searchsorted(nodes, dst)
        in_state = (keep < len(nodes)) & (nodes[np.minimum(
            keep, len(nodes) - 1)] == dst)
        dst, c, keep = dst[in_state], c[in_state], keep[in_state]
        order = np.argsort(dst, kind="stable")
        nodes = dst[order]
        deg = deg[keep[order]]
        ranks = base + damping * c[order]

    out = pa.table({
        "node": pa.array(nodes),
        "rank": pc.round(pa.array(ranks, pa.float64()), round_to,
                         round_mode="half_towards_infinity"),
    })
    import ray.data as rd

    return rd.from_arrow(out)


def triangle_count(edges_ds, *, src: str = "src", dst: str = "dst",
                   num_buckets: int = 16) -> int:
    """Exact triangle count of an undirected graph given CANONICAL
    edges (src < dst, distinct) — the wedge-join algorithm: every
    ordered wedge u<v<w comes from joining (u,v)⋈(v,w) on the middle
    vertex, and a wedge closes iff (u,w) is an edge, so the count is
    one edges⋈edges hash join plus one semi join — each triangle is
    counted exactly once via the total order.

    Scale note: wedge volume is Σ_v deg_hi(v)·deg_lo(v) and skews on
    high-degree vertices; the wedge join is hash-bucketed so the work
    distributes, but a single celebrity vertex's wedge set can
    dominate a bucket — at that scale shard the middle vertex by the
    (u mod k) trick before the join (not needed for bounded-degree
    graphs like co-occurrence-within-small-groups)."""
    from kafka_connect_mongo_ray.stages.join import hash_join

    edges = edges_ds.map_batches(
        lambda t: pa.table({"u": pc.cast(t[src], pa.int64()),
                            "v": pc.cast(t[dst], pa.int64())}),
        batch_format="pyarrow").materialize()

    # wedges: (u,v) ⋈ (v,w) on the middle vertex — rename to join keys
    left = edges.map_batches(
        lambda t: pa.table({"mid": t["v"], "u": t["u"]}),
        batch_format="pyarrow")
    right = edges.map_batches(
        lambda t: pa.table({"mid": t["u"], "w": t["v"]}),
        batch_format="pyarrow")
    wedges = hash_join(left, right, on=["mid"], num_buckets=num_buckets
                       ).map_batches(
        lambda t: pa.table({"u": t["u"], "v": t["w"]}),
        batch_format="pyarrow").materialize()  # stage before the 2nd join

    closed = hash_join(wedges, edges, on=["u", "v"], how="semi",
                       num_buckets=num_buckets)
    return closed.count()
