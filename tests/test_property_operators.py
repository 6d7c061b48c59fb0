"""Property-based tests (hypothesis) for the round-2 operator kernels:
vectorized paths must equal their scalar references on arbitrary
inputs, and the algebraic invariants (symmetry, mergeability,
join-equivalence) must hold."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

texts = st.lists(
    st.one_of(st.none(), st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF),
        max_size=60)),
    min_size=1, max_size=12)


@settings(max_examples=60, deadline=None)
@given(texts)
def test_simhash_batch_equals_scalar(ts):
    from kafka_connect_mongo_ray.functions.dedup import SimHasher

    sh = SimHasher()
    got = [int(x) for x in sh.simhash_batch(ts)]
    want = [sh.simhash64(t) for t in ts]
    assert got == want


@settings(max_examples=60, deadline=None)
@given(texts)
def test_simhash_sparse_fallback_equals_dense(ts):
    from kafka_connect_mongo_ray.functions.dedup import SimHasher

    dense = SimHasher()
    sparse = SimHasher()
    sparse._DENSE_LIMIT = 0
    assert list(dense.simhash_batch(ts)) == list(sparse.simhash_batch(ts))


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=80), st.text(max_size=80))
def test_ngram_jaccard_properties(a, b):
    from kafka_connect_mongo_ray.functions.dedup import ngram_jaccard

    j = ngram_jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == ngram_jaccard(b, a)  # symmetric
    assert ngram_jaccard(a, a) == 1.0  # reflexive


@settings(max_examples=60, deadline=None)
@given(texts)
def test_langid_batch_equals_scalar(ts):
    from kafka_connect_mongo_ray.functions.text import LanguageId

    li = LanguageId()
    got = li.classify_batch(pa.array(
        [t if t is not None else None for t in ts], pa.string())).to_pylist()
    want = [li.classify(t or "") for t in ts]
    assert got == want


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10_000),
                min_size=1, max_size=400),
       st.lists(st.integers(min_value=0, max_value=10_000),
                min_size=1, max_size=400))
def test_hll_merge_equals_union(xs, ys):
    """Mergeability: merge(HLL(xs), HLL(ys)) == HLL(xs ∪ ys) exactly
    (register-wise), so distributed partial sketches lose nothing."""
    from kafka_connect_mongo_ray.functions.sketch import HyperLogLog

    a = HyperLogLog(10)
    a.add_values(np.asarray(xs, dtype=object))
    b = HyperLogLog(10)
    b.add_values(np.asarray(ys, dtype=object))
    u = HyperLogLog(10)
    u.add_values(np.asarray(xs + ys, dtype=object))
    assert (a.merge(b).registers == u.registers).all()
    # serialization round-trips
    assert (HyperLogLog.deserialize(a.serialize()).registers == a.registers).all()


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=12),
       st.integers(min_value=0, max_value=255))
def test_ppm_roundtrip(w, h, v):
    from kafka_connect_mongo_ray.functions.multimodal import decode_ppm, encode_ppm

    assert decode_ppm(encode_ppm(w, h, v)) == (w, h, float(v))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=-32768, max_value=32767),
                min_size=0, max_size=500),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip(samples, rate):
    from kafka_connect_mongo_ray.functions.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    arr = np.asarray(samples, dtype=np.int16)
    got = decode_wav_pcm16(encode_wav_pcm16(arr, rate))
    expect_amp = int(np.abs(arr.astype(np.int32)).max()) if len(arr) else 0
    assert got == (rate, len(arr), len(arr) * 1_000_000 // rate, expect_amp)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(st.floats(min_value=-1, max_value=1,
                                   allow_nan=False, width=32),
                         min_size=4, max_size=4),
                min_size=1, max_size=50))
def test_embedding_matrix_roundtrip(vecs):
    from kafka_connect_mongo_ray.utils import embedding_matrix

    col = pa.array(vecs, pa.list_(pa.float32()))
    m = embedding_matrix(col)
    assert m.shape == (len(vecs), 4)
    want = np.asarray(vecs, dtype=np.float32).astype(np.float64)
    assert np.allclose(m, want)
    # sliced (nonzero offset) columns must read identically
    if len(vecs) > 1:
        m2 = embedding_matrix(col.slice(1))
        assert np.allclose(m2, want[1:])
    # fixed-size list: same answers, including under a slice offset
    fcol = pa.FixedSizeListArray.from_arrays(
        pa.array(np.asarray(vecs, dtype=np.float32).ravel()), 4)
    assert np.allclose(embedding_matrix(fcol), want)
    if len(vecs) > 1:
        assert np.allclose(embedding_matrix(fcol.slice(1)), want[1:])


def test_embedding_matrix_rejects_nulls():
    from kafka_connect_mongo_ray.utils import embedding_matrix

    col = pa.array([[1.0, 2.0], None], pa.list_(pa.float32(), 2))
    with pytest.raises(ValueError, match="null"):
        embedding_matrix(col)
    vcol = pa.array([[1.0, 2.0], None], pa.list_(pa.float32()))
    with pytest.raises(ValueError, match="null"):
        embedding_matrix(vcol)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 1000)),
             min_size=1, max_size=60),
    # right min_size=1: a fully EMPTY Ray dataset loses its schema
    # (ds.schema() is None); empty-right-per-group is still exercised
    # because keys 0..4 rarely all appear on the right
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 1000)),
             min_size=1, max_size=60),
)
def test_asof_join_matches_pandas_reference(direction, left_rows, right_rows):
    """Distributed asof_join == pandas merge_asof on arbitrary keyed
    time series (duplicate timestamps deduped to keep the reference
    deterministic)."""
    import pandas as pd

    import ray.data as rd

    from kafka_connect_mongo_ray.stages.join import asof_join

    left_rows = list({(k, t): None for k, t in left_rows})
    right_rows = list({(k, t): None for k, t in right_rows})
    left = pa.table({
        "k": pa.array([r[0] for r in left_rows], pa.int64()),
        "t": pa.array([r[1] for r in left_rows], pa.int64()),
        "lv": pa.array(range(len(left_rows)), pa.int64()),
    })
    right = pa.table({
        "k": pa.array([r[0] for r in right_rows], pa.int64()),
        "t": pa.array([r[1] for r in right_rows], pa.int64()),
        "rv": pa.array(range(len(right_rows)), pa.int64()),
    })
    got = asof_join(rd.from_arrow(left).repartition(2),
                    rd.from_arrow(right).repartition(2),
                    by=["k"], on="t", num_buckets=4,
                    direction=direction).to_pandas()
    want = pd.merge_asof(
        left.to_pandas().sort_values("t", kind="mergesort"),
        right.to_pandas().sort_values("t", kind="mergesort"),
        on="t", by="k", direction=direction)
    key = ["k", "t", "lv"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want[got.columns].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)
    # exact output types: left columns restore to int64 always (never
    # null post-left-join); rv restores to int64 unless a group had no
    # match (then it carries real nulls and pandas reads it as float64)
    assert [str(got[c].dtype) for c in key] == ["int64"] * 3
    assert str(got["rv"].dtype) == ("float64" if want["rv"].isna().any()
                                    else "int64")


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 1000)),
             min_size=1, max_size=60),
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 1000)),
             min_size=1, max_size=60),
    st.integers(0, 200),
)
def test_asof_join_tolerance_matches_pandas_reference(left_rows, right_rows,
                                                      tol):
    """tolerance= drops nearest matches farther than the bound exactly
    like pandas merge_asof's tolerance."""
    import pandas as pd

    import ray.data as rd

    from kafka_connect_mongo_ray.stages.join import asof_join

    left_rows = list({(k, t): None for k, t in left_rows})
    right_rows = list({(k, t): None for k, t in right_rows})
    left = pa.table({
        "k": pa.array([r[0] for r in left_rows], pa.int64()),
        "t": pa.array([r[1] for r in left_rows], pa.int64()),
        "lv": pa.array(range(len(left_rows)), pa.int64()),
    })
    right = pa.table({
        "k": pa.array([r[0] for r in right_rows], pa.int64()),
        "t": pa.array([r[1] for r in right_rows], pa.int64()),
        "rv": pa.array(range(len(right_rows)), pa.int64()),
    })
    got = asof_join(rd.from_arrow(left).repartition(2),
                    rd.from_arrow(right).repartition(2),
                    by=["k"], on="t", num_buckets=4,
                    tolerance=tol).to_pandas()
    want = pd.merge_asof(
        left.to_pandas().sort_values("t", kind="mergesort"),
        right.to_pandas().sort_values("t", kind="mergesort"),
        on="t", by="k", tolerance=tol)
    key = ["k", "t", "lv"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want[got.columns].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)
