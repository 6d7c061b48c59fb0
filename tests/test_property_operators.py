"""Property-based tests (hypothesis) for the round-2 operator kernels:
vectorized paths must equal their scalar references on arbitrary
inputs, and the algebraic invariants (symmetry, mergeability,
join-equivalence) must hold."""

import numpy as np
import pyarrow as pa
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
