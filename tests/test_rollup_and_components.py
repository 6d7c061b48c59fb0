"""functions/rollup.py and functions/graph.py against in-process
references (pandas multi-level groupby; union-find) on random inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.mark.parametrize("seed", [0, 5])
def test_rollup_matches_pandas(seed):
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.rollup import rollup_aggregate

    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "k1": rng.choice(["a", "b", "c"], 200),
        "k2": rng.integers(0, 4, 200).astype(np.int64),
        "v": rng.integers(-100, 100, 200).astype(np.int64),
    })
    out = rollup_aggregate(
        rd.from_pandas(df).repartition(4), keys=["k1", "k2"],
        sum_cols=["v"], num_partitions=3).to_pandas()

    fin = df.groupby(["k1", "k2"], as_index=False).agg(
        n=("v", "size"), v=("v", "sum"))
    l1 = df.groupby(["k1"], as_index=False).agg(n=("v", "size"), v=("v", "sum"))
    l1["k2"] = np.int64(-1)
    l0 = pd.DataFrame({"k1": ["ALL"], "k2": np.array([-1], np.int64),
                       "n": [len(df)], "v": [df["v"].sum()]})
    want = pd.concat([fin, l1, l0], ignore_index=True)[
        ["k1", "k2", "n", "v"]]
    want["n"] = want["n"].astype(np.int64)

    key = lambda d: d.sort_values(["k1", "k2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(out), key(want), check_dtype=False)
    assert out["v"].dtype == np.int64


def _uf_components(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 30, 25), (4, 60, 40),
                                                  (7, 12, 60)])
def test_connected_components_matches_union_find(seed, n_nodes, n_edges):
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.graph import connected_components

    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    edges = pa.table({"id_a": a, "id_b": b})
    got = connected_components(
        rd.from_arrow(edges).repartition(3), num_buckets=4).to_pandas()
    want = _uf_components(zip(a.tolist(), b.tolist()))
    assert dict(zip(got["node"], got["component"])) == want


def test_connected_components_long_chain_converges():
    """A path graph is the worst case for min propagation (diameter
    rounds) — every node must still end at label 0."""
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.graph import connected_components

    n = 20
    edges = pa.table({"id_a": pa.array(range(n - 1), pa.int64()),
                      "id_b": pa.array(range(1, n), pa.int64())})
    got = connected_components(rd.from_arrow(edges), num_buckets=2).to_pandas()
    assert set(got["component"]) == {0} and len(got) == n


def test_connected_components_huge_node_ids_exact_sum():
    """Node ids far above 2^31 exercise the limb-based exact label sum
    (the old int64 Sum aggregate was the documented wrap risk). Two
    components with ids near 2^62 must converge and keep exact labels."""
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.graph import (
        _exact_label_sum,
        connected_components,
    )

    base = 1 << 62
    edges = pa.table({
        "id_a": pa.array([base, base + 1, base + 5, base + 6], pa.int64()),
        "id_b": pa.array([base + 1, base + 2, base + 6, base + 7], pa.int64()),
    })
    got = connected_components(rd.from_arrow(edges), num_buckets=2).to_pandas()
    comps = dict(zip(got["node"], got["component"]))
    assert comps == {base: base, base + 1: base, base + 2: base,
                     base + 5: base + 5, base + 6: base + 5,
                     base + 7: base + 5}

    # the exact sum must be bit-exact at magnitudes where naive int64
    # accumulation of many rows would wrap: check against Python ints
    labels = rd.from_arrow(pa.table({"__cc_key": pa.array(
        [base + i for i in range(6)], pa.int64()),
        "__cc_comp": pa.array([base + i for i in range(6)], pa.int64())}))
    assert _exact_label_sum(labels) == sum(base + i for i in range(6))


@pytest.mark.parametrize("explicit_cats", [None, ["a", "b", "zz_absent"]])
def test_pivot_counts_matches_pandas(explicit_cats):
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.rollup import pivot_counts

    rng = np.random.default_rng(13)
    df = pd.DataFrame({"k": rng.integers(0, 20, 300).astype(np.int64),
                       "c": rng.choice(["a", "b", "c"], 300)})
    out = pivot_counts(rd.from_pandas(df).repartition(4), key="k",
                       pivot_col="c", categories=explicit_cats,
                       prefix="n_", num_partitions=3).to_pandas()
    cats = explicit_cats or ["a", "b", "c"]
    want = (df.groupby(["k", "c"]).size().unstack(fill_value=0)
            .reindex(columns=cats, fill_value=0))
    out = out.sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == sorted(df["k"].unique())
    for c in cats:
        assert out[f"n_{c}"].tolist() == want[c].tolist(), c
    if explicit_cats:
        assert (out["n_zz_absent"] == 0).all()


def test_cube_mode_matches_pandas():
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.rollup import rollup_aggregate

    rng = np.random.default_rng(17)
    df = pd.DataFrame({
        "k1": rng.choice(["a", "b"], 120),
        "k2": rng.integers(0, 3, 120).astype(np.int64),
        "v": rng.integers(0, 50, 120).astype(np.int64),
    })
    out = rollup_aggregate(rd.from_pandas(df).repartition(3),
                           keys=["k1", "k2"], sum_cols=["v"],
                           mode="cube").to_pandas()
    # cube = finest + (k1) + (k2) + grand total
    fin = df.groupby(["k1", "k2"]).size()
    assert len(out) == len(fin) + df["k1"].nunique() + df["k2"].nunique() + 1
    k2_only = out[(out["k1"] == "ALL") & (out["k2"] != -1)]
    want = df.groupby("k2").agg(n=("v", "size"), v=("v", "sum"))
    got = k2_only.sort_values("k2").reset_index(drop=True)
    assert got["n"].tolist() == want["n"].tolist()
    assert got["v"].tolist() == want["v"].tolist()
    total = out[(out["k1"] == "ALL") & (out["k2"] == -1)]
    assert total["n"].iloc[0] == len(df) and total["v"].iloc[0] == df["v"].sum()


def test_melt_inverts_pivot():
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.rollup import melt, pivot_counts

    rng = np.random.default_rng(21)
    df = pd.DataFrame({"k": rng.integers(0, 10, 200).astype(np.int64),
                       "c": rng.choice(["x", "y", "z"], 200)})
    wide = pivot_counts(rd.from_pandas(df).repartition(3), key="k",
                        pivot_col="c", prefix="n_")
    long = melt(wide, key="k", value_cols=["n_x", "n_y", "n_z"],
                var_col="c", value_col="n",
                var_names={"n_x": "x", "n_y": "y", "n_z": "z"},
                drop_zero=True).to_pandas()
    want = (df.groupby(["k", "c"], as_index=False).size()
            .rename(columns={"size": "n"}))
    key = lambda d: d.sort_values(["k", "c"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(long), key(want), check_dtype=False)


def test_pagerank_matches_local_reference(ray_session):
    """Fixed-iteration PageRank == the same recurrence computed locally
    in numpy on a small undirected (doubled) graph; ranks sum to ~1."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.graph import pagerank

    und = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 0)]
    src = [a for a, b in und] + [b for a, b in und]
    dst = [b for a, b in und] + [a for a, b in und]
    edges = pa.table({"src": pa.array(src, pa.int64()),
                      "dst": pa.array(dst, pa.int64())})
    got = (pagerank(rd.from_arrow(edges), iterations=3, damping=0.85,
                    num_buckets=4).to_pandas()
           .sort_values("node").reset_index(drop=True))

    nodes = sorted(set(src))
    n = len(nodes)
    out = {u: sum(1 for s in src if s == u) for u in nodes}
    r = {u: 1.0 / n for u in nodes}
    for _ in range(3):
        nxt = {}
        for v in nodes:
            incoming = [u for u, w in zip(src, dst) if w == v]
            nxt[v] = 0.15 / n + 0.85 * sum(r[u] / out[u] for u in incoming)
        r = nxt
    want = np.round([r[v] for v in nodes], 9)
    assert got["node"].tolist() == nodes
    np.testing.assert_allclose(got["rank"].to_numpy(), want, atol=2e-9)
    assert abs(got["rank"].sum() - 1.0) < 1e-6


def test_pagerank_join_fallback_matches_broadcast(ray_session, monkeypatch):
    """The size-guarded broadcast-state plan and the bucketed join plan
    must produce identical ranks (same divisions, same exchange Sum
    kernel, same 9-dp rounding grid) on a random undirected graph."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kafka_connect_mongo_ray.functions import graph

    rng = np.random.default_rng(7)
    und = {(int(a), int(b)) for a, b in rng.integers(0, 40, (120, 2))
           if a != b}
    src = [a for a, b in und] + [b for a, b in und]
    dst = [b for a, b in und] + [a for a, b in und]
    edges = pa.table({"src": pa.array(src, pa.int64()),
                      "dst": pa.array(dst, pa.int64())})

    broadcast = (graph.pagerank(rd.from_arrow(edges), iterations=2,
                                num_buckets=4).to_pandas()
                 .sort_values("node").reset_index(drop=True))
    monkeypatch.setattr(graph, "_PR_BROADCAST_MAX_NODES", 0)
    joined = (graph.pagerank(rd.from_arrow(edges), iterations=2,
                             num_buckets=4).to_pandas()
              .sort_values("node").reset_index(drop=True))
    assert broadcast["node"].tolist() == joined["node"].tolist()
    np.testing.assert_allclose(broadcast["rank"].to_numpy(),
                               joined["rank"].to_numpy(), atol=2e-9)


def test_triangle_count_matches_local_reference(ray_session):
    """Wedge-join triangle count == brute-force enumeration on a graph
    with known triangles (two triangles sharing an edge + a pendant)."""
    import itertools

    import pyarrow as pa
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.graph import triangle_count

    und = [(0, 1), (1, 2), (0, 2), (2, 3), (0, 3), (3, 4)]
    edges = pa.table({"src": pa.array([a for a, b in und], pa.int64()),
                      "dst": pa.array([b for a, b in und], pa.int64())})
    es = set(und)
    want = sum(1 for a, b, c in itertools.combinations(range(5), 3)
               if (a, b) in es and (b, c) in es and (a, c) in es)
    assert want == 2
    assert triangle_count(rd.from_arrow(edges), num_buckets=4) == want

    # triangle-free graph (a path)
    path = pa.table({"src": pa.array([0, 1, 2], pa.int64()),
                     "dst": pa.array([1, 2, 3], pa.int64())})
    assert triangle_count(rd.from_arrow(path), num_buckets=4) == 0


def test_pagerank_directed_source_only_nodes(ray_session, monkeypatch):
    """On a DIRECTED graph, nodes with out-edges but no in-edges drop
    out of the broadcast plan's state after iteration 1; their edges
    must be dropped from later contribution passes (inner-join
    semantics), not read out of bounds.  Node 9 > max(state) makes the
    unguarded searchsorted an IndexError pre-fix; node 0 < max(state)
    is the silent-wrong-rank case.  Both plans must agree."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kafka_connect_mongo_ray.functions import graph

    directed = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 1), (9, 1), (9, 3)]
    edges = pa.table({
        "src": pa.array([a for a, b in directed], pa.int64()),
        "dst": pa.array([b for a, b in directed], pa.int64()),
    })

    broadcast = (graph.pagerank(rd.from_arrow(edges), iterations=3,
                                num_buckets=4).to_pandas()
                 .sort_values("node").reset_index(drop=True))
    monkeypatch.setattr(graph, "_PR_BROADCAST_MAX_NODES", 0)
    joined = (graph.pagerank(rd.from_arrow(edges), iterations=3,
                             num_buckets=4).to_pandas()
              .sort_values("node").reset_index(drop=True))
    assert broadcast["node"].tolist() == joined["node"].tolist()
    np.testing.assert_allclose(broadcast["rank"].to_numpy(),
                               joined["rank"].to_numpy(), atol=2e-9)
