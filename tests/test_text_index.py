"""Persisted BM25 inverted index (state/text_index.py): build/commit
contract, term-bucket directory pruning, and full-scan equivalence."""

import json
import os
import shutil

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TERMS = ["hash", "stream", "window"]


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    import ray.data as rd

    from kafka_connect_mongo_ray.state.text_index import build_bm25_index

    d = str(tmp_path_factory.mktemp("bm25ix") / "idx")
    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    build_bm25_index(ds, d, num_buckets=8)
    return d


def test_matches_full_scan_bm25(index_dir):
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.retrieval import bm25_topk
    from kafka_connect_mongo_ray.state.text_index import bm25_index_topk

    got = bm25_index_topk(index_dir, TERMS, k=10).to_pandas()
    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    want = bm25_topk(ds, terms=TERMS, k=10).to_pandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))


def test_query_opens_only_probed_buckets(index_dir, tmp_path):
    """Poison every bucket directory the query terms do NOT hash to:
    the query must still run — proof of directory-level pruning."""
    import pyarrow as pa

    from kafka_connect_mongo_ray.state.text_index import bm25_index_topk
    from kafka_connect_mongo_ray.utils import stable_hash_buckets

    work = str(tmp_path / "idx")
    shutil.copytree(index_dir, work)
    nb = json.load(open(os.path.join(work, "manifest.json")))["num_buckets"]
    probe = pa.table({"term": pa.array(TERMS, pa.string())})
    probed = set(stable_hash_buckets(probe, ["term"], nb).tolist())
    n_poisoned = 0
    for c in range(nb):
        cdir = os.path.join(work, "postings", f"term_bucket={c}")
        if c in probed or not os.path.isdir(cdir):
            continue
        for f in os.listdir(cdir):
            if f.endswith(".parquet"):
                with open(os.path.join(cdir, f), "wb") as fh:
                    fh.write(b"not parquet")
                n_poisoned += 1
    assert n_poisoned > 0, "every bucket probed — widen num_buckets"
    out = bm25_index_topk(work, TERMS, k=10).to_pandas()
    assert len(out) == 10 and (out["score"] > 0).all()


def test_uncommitted_index_refused(ray_session, tmp_path):
    from kafka_connect_mongo_ray.state.text_index import bm25_index_topk

    d = str(tmp_path / "crashed")
    os.makedirs(os.path.join(d, "postings", "term_bucket=0"), exist_ok=True)
    with pytest.raises(FileNotFoundError):
        bm25_index_topk(d, TERMS, k=5)


def test_absent_terms_empty_result(index_dir):
    from kafka_connect_mongo_ray.state.text_index import bm25_index_topk

    out = bm25_index_topk(index_dir, ["zzzznotaterm"], k=5).to_pandas()
    assert len(out) == 0
