"""Persisted IVF index (state/ann_index.py): build/commit contract,
directory-level pruning, and the exact-degenerate equivalence."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _queries(n=5):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from kafka_connect_mongo_ray.utils import embedding_matrix

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    t = t.filter(pc.less(t["vec_id"], n)).sort_by("vec_id")
    return embedding_matrix(t["embedding"]), np.asarray(t["vec_id"])


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    import ray.data as rd

    from kafka_connect_mongo_ray.state.ann_index import build_ivf_index

    d = str(tmp_path_factory.mktemp("annix") / "ivf")
    ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    build_ivf_index(ds, d, num_cells=8, seed=42)
    return d


def test_nprobe_all_cells_equals_brute_force(index_dir):
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.similarity import brute_force_topk
    from kafka_connect_mongo_ray.state.ann_index import ivf_index_topk

    q, ids = _queries()
    approx = ivf_index_topk(index_dir, q, ids, k=10, nprobe=8)
    ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    exact = brute_force_topk(ds, q, ids, k=10)
    pd.testing.assert_frame_equal(
        approx.reset_index(drop=True),
        exact[["query_id", "rank", "neighbor_id"]].reset_index(drop=True))


def test_query_opens_only_probed_cells(index_dir, tmp_path):
    """Poison every UNPROBED cell directory: the query must still run
    — proof the index is pruned at the directory level and unprobed
    cells never leave disk."""
    import json

    from kafka_connect_mongo_ray.state.ann_index import (
        _normalize,
        ivf_index_topk,
    )

    work = str(tmp_path / "ivf")
    shutil.copytree(index_dir, work)
    q, ids = _queries(2)
    centroids = np.load(os.path.join(work, "centroids.npy"))
    nprobe = 2
    probed = set(np.argsort(-(_normalize(np.asarray(q, np.float64))
                              @ centroids.T), axis=1)[:, :nprobe].ravel())
    n_poisoned = 0
    for c in range(json.load(open(os.path.join(work, "manifest.json")))
                   ["num_cells"]):
        cdir = os.path.join(work, "cells", f"ivf_cell={c}")
        if c in probed or not os.path.isdir(cdir):
            continue
        for f in os.listdir(cdir):
            if f.endswith(".parquet"):
                with open(os.path.join(cdir, f), "wb") as fh:
                    fh.write(b"not parquet")
                n_poisoned += 1
    assert n_poisoned > 0, "every cell probed — widen num_cells"
    out = ivf_index_topk(work, q, ids, k=10, nprobe=nprobe)
    assert set(out["query_id"]) == set(int(i) for i in ids)
    assert (out.groupby("query_id").size() == 10).all()


def test_uncommitted_index_refused(ray_session, tmp_path):
    """A build that crashed before the manifest write must be refused
    (the commit-marker contract)."""
    from kafka_connect_mongo_ray.state.ann_index import ivf_index_topk

    d = str(tmp_path / "crashed")
    os.makedirs(os.path.join(d, "cells", "ivf_cell=0"), exist_ok=True)
    q, ids = _queries(1)
    with pytest.raises(FileNotFoundError):
        ivf_index_topk(d, q, ids, k=5)


def test_rebuild_overwrites_cleanly(ray_session, tmp_path):
    import ray.data as rd

    from kafka_connect_mongo_ray.state.ann_index import (
        build_ivf_index,
        ivf_index_topk,
    )

    d = str(tmp_path / "ivf2")
    ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    m1 = build_ivf_index(ds, d, num_cells=4, seed=1)
    ds2 = rd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    m2 = build_ivf_index(ds2, d, num_cells=8, seed=42)
    assert (m1["num_cells"], m2["num_cells"]) == (4, 8)
    q, ids = _queries(2)
    out = ivf_index_topk(d, q, ids, k=5, nprobe=8)
    assert (out.groupby("query_id").size() == 5).all()


def _halves():
    import pyarrow.compute as pc
    import ray.data as rd

    def half(parity):
        ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        return ds.filter(lambda r, p=parity: r["vec_id"] % 2 == p)

    return half(0), half(1)


def test_append_generation_reaches_queries(ray_session, tmp_path):
    """Build on evens, append odds: nprobe=all must exactly match the
    full-corpus brute force — the appended generation is visible and
    nothing is double-counted."""
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.similarity import brute_force_topk
    from kafka_connect_mongo_ray.state.ann_index import (
        append_ivf_index,
        build_ivf_index,
        ivf_index_topk,
    )

    d = str(tmp_path / "ivfg")
    evens, odds = _halves()
    m0 = build_ivf_index(evens, d, num_cells=8, seed=42)
    m1 = append_ivf_index(odds, d)
    assert m1["generations"] == 1 and m1["rows"] > m0["rows"]

    q, ids = _queries(3)
    approx = ivf_index_topk(d, q, ids, k=10, nprobe=8)
    full = rd.read_parquet(f"{SF}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    exact = brute_force_topk(full, q, ids, k=10)
    pd.testing.assert_frame_equal(
        approx.reset_index(drop=True),
        exact[["query_id", "rank", "neighbor_id"]].reset_index(drop=True))


def test_append_requires_committed_index(ray_session, tmp_path):
    from kafka_connect_mongo_ray.state.ann_index import append_ivf_index

    evens, _ = _halves()
    with pytest.raises(FileNotFoundError):
        append_ivf_index(evens, str(tmp_path / "absent"))


def test_uncommitted_generation_invisible_and_overwritten(ray_session,
                                                          tmp_path):
    """A crash AFTER generation files land but BEFORE the manifest
    update leaves the generation invisible to queries; the next append
    overwrites it and commits."""
    import json

    from kafka_connect_mongo_ray.state.ann_index import (
        append_ivf_index,
        build_ivf_index,
        ivf_index_topk,
    )

    d = str(tmp_path / "ivfc")
    evens, odds = _halves()
    build_ivf_index(evens, d, num_cells=4, seed=42)

    # simulate the crashed append: generation dir exists, manifest not
    # updated (poisoned files prove they are never opened)
    crash = os.path.join(d, "cells_g1", "ivf_cell=0")
    os.makedirs(crash)
    with open(os.path.join(crash, "junk.parquet"), "wb") as f:
        f.write(b"not parquet")

    q, ids = _queries(2)
    out = ivf_index_topk(d, q, ids, k=5, nprobe=4)  # must not read junk
    assert (out.groupby("query_id").size() == 5).all()

    m = append_ivf_index(odds, d)  # recovery: overwrite + commit
    assert m["generations"] == 1
    assert json.load(open(os.path.join(d, "manifest.json")))[
        "generations"] == 1
    assert not os.path.exists(os.path.join(crash, "junk.parquet"))
    out2 = ivf_index_topk(d, q, ids, k=5, nprobe=4)
    assert (out2.groupby("query_id").size() == 5).all()


def test_compact_folds_generations_and_answers_identically(ray_session,
                                                           tmp_path):
    import json
    import os

    from kafka_connect_mongo_ray.state.ann_index import (
        append_ivf_index,
        build_ivf_index,
        compact_ivf_index,
        ivf_index_topk,
    )

    d = str(tmp_path / "ivfk")
    evens, odds = _halves()
    build_ivf_index(evens, d, num_cells=4, seed=42)
    append_ivf_index(odds, d)
    q, ids = _queries(3)
    before = ivf_index_topk(d, q, ids, k=10, nprobe=4)

    out = compact_ivf_index(d)
    assert out["compacted"] and out["generations"] == 0
    assert out["base"] == "cells_v2" and out["rows"] == 500
    assert not os.path.exists(os.path.join(d, "cells"))
    assert not os.path.exists(os.path.join(d, "cells_g1"))
    after = ivf_index_topk(d, q, ids, k=10, nprobe=4)
    pd.testing.assert_frame_equal(before.reset_index(drop=True),
                                  after.reset_index(drop=True))

    # idempotent: nothing to fold on a compacted index
    out2 = compact_ivf_index(d)
    assert out2["compacted"] is False
    # a crashed prior attempt's leftover target dir is cleared
    os.makedirs(os.path.join(d, "cells_v3", "ivf_cell=0"), exist_ok=True)
    append_ivf_index(odds, d)  # make a generation so compact runs
    out3 = compact_ivf_index(d)
    assert out3["compacted"] and out3["base"] == "cells_v3"
    assert json.load(open(os.path.join(d, "manifest.json")))[
        "rows"] == 750


def test_randomized_append_compact_campaign(ray_session, tmp_path):
    """Randomized generation campaign: a seeded sequence of APPEND
    (disjoint vector slices) and COMPACT operations; after every op an
    nprobe==cells query must equal the brute-force baseline over the
    union ingested so far — generations and compaction are invisible
    to exact-mode queries at any interleaving."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.similarity import brute_force_topk
    from kafka_connect_mongo_ray.state.ann_index import (
        append_ivf_index,
        build_ivf_index,
        compact_ivf_index,
        ivf_index_topk,
    )

    rng = np.random.default_rng(29)
    dim, chunk = 16, 40
    vecs = rng.standard_normal((240, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    def tbl(lo, hi):
        return pa.table({
            "vec_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
            "embedding": pa.array([v.tolist() for v in vecs[lo:hi]],
                                  pa.list_(pa.float32())),
        })

    d = str(tmp_path / "ivf")
    build_ivf_index(rd.from_arrow(tbl(0, chunk)), d, num_cells=4, seed=7)
    ingested = chunk
    qids = np.array([0, 5, 11], dtype=np.int64)
    qmat = vecs[qids]

    def check():
        approx = ivf_index_topk(d, qmat, qids, k=5, nprobe=4)
        exact = brute_force_topk(rd.from_arrow(tbl(0, ingested)),
                                 qmat, qids, k=5)
        pd.testing.assert_frame_equal(
            approx.reset_index(drop=True),
            exact[["query_id", "rank", "neighbor_id"]
                  ].reset_index(drop=True))

    check()
    for step in range(6):
        if rng.random() < 0.6 and ingested < len(vecs):
            append_ivf_index(rd.from_arrow(tbl(ingested, ingested + chunk)),
                             d, total_rows=chunk, tag=f"step={step}")
            ingested += chunk
        else:
            compact_ivf_index(d)
        check()
