"""Degenerate-bucket safety: a mass-duplicate corpus must not make the
LSH pair generators go O(bucket²) (VERDICT r2 #3). The capped topology
(star to the min id + consecutive chain) keeps every duplicate
connected to its cluster anchor, so the REMOVAL SET — ids that appear
as id_b in a verified pair — is unchanged vs the uncapped run."""

import numpy as np
import pandas as pd
import pyarrow as pa

N_DUP = 200  # identical docs — uncapped all-pairs would be 19,900 pairs
DUP_TEXT = "the quick brown fox jumps over the lazy dog " * 8


def _corpus():
    ids = list(range(N_DUP)) + [1000, 1001, 2000]
    texts = [DUP_TEXT] * N_DUP + [
        "a completely different document about ray data pipelines xyz",
        "a completely different document about ray data pipelines abc",
        "unrelated third text with no similarity to anything else here",
    ]
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _removal_set(pairs_df: pd.DataFrame) -> set:
    return set(pairs_df["id_b"].tolist())


def test_minhash_batch_parity_with_scalar():
    """signatures_batch (chunked minimum.reduceat) is bit-identical to
    the per-doc scalar reference across chunk boundaries."""
    from kafka_connect_mongo_ray.functions.dedup import MinHasher

    mh = MinHasher(num_hashes=32, k=5, seed=7)
    texts = [DUP_TEXT, "", "short", "äöü multi-byte ßtring " * 3,
             "another document entirely " * 10, None]
    got = mh.signatures_batch(texts)
    for i, t in enumerate(texts):
        assert (got[i] == mh.signature(t or "")).all()
    # force multiple reduceat chunks
    mh._CHUNK_SHINGLES = 50
    got2 = mh.signatures_batch(texts)
    assert (got2 == got).all()


def test_minhash_bucket_cap_bounds_pairs_and_keeps_removals():
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.dedup import (
        minhash_lsh_candidates,
        verify_pairs_jaccard,
    )

    docs = rd.from_arrow(_corpus()).repartition(4)
    capped = minhash_lsh_candidates(docs, num_bands=8, bucket_cap=32)
    capped_df = capped.to_pandas()
    # bounded: star+chain is ≤ 2n-3 distinct pairs per cluster (plus the
    # real near-dup pair), nowhere near n(n-1)/2 = 19,900
    assert len(capped_df) <= 2 * N_DUP + 10
    verified = verify_pairs_jaccard(
        capped, rd.from_arrow(_corpus()), threshold=0.6, num_buckets=8
    ).to_pandas()
    # every duplicate is still removable: connected to a smaller id
    assert _removal_set(verified) >= set(range(1, N_DUP))
    # the genuine (non-degenerate) near-dup pair is still found
    assert ((verified["id_a"] == 1000) & (verified["id_b"] == 1001)).any()

    uncapped = minhash_lsh_candidates(docs, num_bands=8, bucket_cap=10**9)
    verified_u = verify_pairs_jaccard(
        uncapped, rd.from_arrow(_corpus()), threshold=0.6, num_buckets=8
    ).to_pandas()
    assert len(verified_u) > len(verified)  # uncapped really is quadratic
    assert _removal_set(verified_u) == _removal_set(verified)


def test_embedding_lsh_bucket_cap_bounds_pairs_and_keeps_removals():
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.dedup import embedding_near_dup_lsh

    rng = np.random.default_rng(7)
    n_dup, dim = 150, 16
    base = rng.normal(size=dim)
    dups = np.tile(base, (n_dup, 1))
    others = rng.normal(size=(20, dim))  # random: almost surely distinct
    vecs = np.vstack([dups, others])
    ids = np.arange(len(vecs), dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.ravel(), pa.float32()), dim),
    })
    ds = rd.from_arrow(tbl).repartition(3)
    capped = embedding_near_dup_lsh(
        ds, threshold=0.95, num_planes=2, bucket_cap=16).to_pandas()
    assert len(capped) <= 2 * n_dup + 10  # not n(n-1)/2 = 11,175
    assert _removal_set(capped) >= set(range(1, n_dup))
    uncapped = embedding_near_dup_lsh(
        ds, threshold=0.95, num_planes=2, bucket_cap=10**9).to_pandas()
    assert len(uncapped) > len(capped)
    assert _removal_set(uncapped) >= _removal_set(capped)
    # precision stays 1: every capped pair is a real cosine hit
    assert set(map(tuple, capped[["id_a", "id_b"]].to_numpy())) <= set(
        map(tuple, uncapped[["id_a", "id_b"]].to_numpy()))


def test_expand_pairs_merge_bound_fallback_recall_complete():
    """A key above _MERGE_GROUP_BOUND on the UNCAPPED path must fall
    back to the per-key triu expansion (bounding the self-merge's n^2
    cross-product memory) and still emit every pair."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.dedup import (
        _MERGE_GROUP_BOUND,
        _expand_pairs_bucketed,
    )

    n_big = _MERGE_GROUP_BOUND + 60
    t = pa.table({
        "key": pa.array(["hot"] * n_big + ["cold"] * 3),
        "doc_id": pa.array(list(range(n_big)) + [9001, 9002, 9003],
                           pa.int64()),
    })
    out = _expand_pairs_bucketed(rd.from_arrow(t).repartition(5),
                                 key_cols=["key"], id_col="doc_id",
                                 cap=None, num_partitions=4).to_pandas()
    want = n_big * (n_big - 1) // 2 + 3
    assert len(out) == want
    assert (out["id_a"] < out["id_b"]).all()
    # spot-check extremes of the big key's triu
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (0, n_big - 1) in pairs and (9001, 9003) in pairs
