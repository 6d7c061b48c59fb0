"""Training-data operators over the sf0.001 testdata tables."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_tbl():
    return pq.read_table(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb_tbl():
    return pq.read_table(f"{SF}/embeddings.parquet")


def docs_ds(tbl):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(4)


def test_token_and_quality(docs_tbl):
    from kafka_connect_mongo_ray.functions.text import quality_score_batch, token_count_batch

    out = token_count_batch(docs_tbl)
    # documents text is single-space separated words
    expect = [len(t.split()) for t in docs_tbl["text"].to_pylist()[:50]]
    assert out["n_tokens"].to_pylist()[:50] == expect
    q = quality_score_batch(docs_tbl)
    assert q["q_n_chars"].to_pylist() == docs_tbl["n_chars"].to_pylist()
    assert all(0 <= r <= 1 for r in q["q_alpha_ratio"].to_pylist())


def test_tokenizer_and_langid(docs_tbl):
    from kafka_connect_mongo_ray.functions.text import LanguageId, TokenizerStage

    tok = TokenizerStage()
    out = tok(docs_tbl.slice(0, 20))
    assert all(n > 0 for n in out["n_bpe_tokens"].to_pylist())
    lid = LanguageId()
    out2 = lid(docs_tbl.slice(0, 50))
    assert set(out2["lang_pred"].to_pylist()) <= {"en", "es", "de", "fr", "zh", "unknown"}


def test_fingerprints_deterministic(docs_tbl):
    from kafka_connect_mongo_ray.functions.text import (
        md5_fingerprint_batch,
        rolling_fingerprint_batch,
    )
    import hashlib

    out = md5_fingerprint_batch(docs_tbl.slice(0, 10))
    assert out["fingerprint"][0].as_py() == hashlib.md5(
        docs_tbl["text"][0].as_py().encode()
    ).hexdigest()
    r1 = rolling_fingerprint_batch(docs_tbl.slice(0, 10))
    r2 = rolling_fingerprint_batch(docs_tbl.slice(0, 10))
    assert r1["rolling_fp"].to_pylist() == r2["rolling_fp"].to_pylist()


def test_exact_dedup(docs_tbl):
    from kafka_connect_mongo_ray.functions.dedup import exact_dedup

    # inject exact duplicates with higher ids
    dup = docs_tbl.slice(0, 5).set_column(
        docs_tbl.schema.get_field_index("doc_id"),
        "doc_id",
        pa.array([10_000 + i for i in range(5)], pa.int64()),
    )
    both = pa.concat_tables([docs_tbl, dup])
    out = exact_dedup(docs_ds(both)).to_pandas()
    assert len(out) == docs_tbl.num_rows  # dups collapsed
    assert not (out["doc_id"] >= 10_000).any()  # min id survives


def test_minhash_lsh_finds_near_dups(docs_tbl):
    import ray

    from kafka_connect_mongo_ray.functions.dedup import (
        JaccardVerifier,
        minhash_lsh_candidates,
        ngram_jaccard,
    )

    # append a lightly-edited copy of doc 0 with id 9999
    text0 = docs_tbl["text"][0].as_py()
    edited = text0 + " tail"
    near = pa.table(
        {
            "doc_id": pa.array([9999], pa.int64()),
            "text": pa.array([edited], pa.string()),
            "lang": pa.array(["en"]),
            "source": pa.array(["srcX"]),
            "n_chars": pa.array([len(edited)], pa.int64()),
        }
    )
    both = pa.concat_tables([docs_tbl.select(near.column_names), near])
    cands = minhash_lsh_candidates(docs_ds(both), seed=7)
    texts = {i: t for i, t in zip(both["doc_id"].to_pylist(), both["text"].to_pylist())}
    tref = ray.put(texts)
    verified = cands.map_batches(
        JaccardVerifier,
        fn_constructor_kwargs={"texts_ref": tref, "threshold": 0.6},
        batch_format="pyarrow",
        concurrency=1,
    ).to_pandas()
    pairs = set(zip(verified["id_a"], verified["id_b"]))
    assert (0, 9999) in pairs
    assert ngram_jaccard(text0, edited) > 0.8


def test_simhash_near_dup(docs_tbl):
    from kafka_connect_mongo_ray.functions.dedup import SimHasher, hamming64

    t0 = docs_tbl["text"][0].as_py()
    h0 = SimHasher.simhash64(t0)
    h_near = SimHasher.simhash64(t0 + " tail")
    h_far = SimHasher.simhash64(docs_tbl["text"][7].as_py())
    assert hamming64(h0, h_near) < hamming64(h0, h_far)


def test_brute_force_topk_matches_numpy(emb_tbl):
    from kafka_connect_mongo_ray.functions.similarity import brute_force_topk

    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in emb_tbl["embedding"].to_pylist()])
    ids = np.asarray(emb_tbl["vec_id"])
    q = vecs[:3]
    out = brute_force_topk(docs_ds(emb_tbl), q, ids[:3], k=5)
    # numpy reference
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    nq = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = nq @ nv.T
    for qi in range(3):
        expect = set(ids[np.argsort(-sims[qi])[:5]].tolist())
        got = set(out[out["query_id"] == ids[qi]]["neighbor_id"].tolist())
        assert got == expect
    # each query's top hit is itself
    top1 = out[out["rank"] == 1]
    assert (top1["query_id"].to_numpy() == top1["neighbor_id"].to_numpy()).all()


def test_embedding_near_dup_pairs(emb_tbl):
    import ray

    from kafka_connect_mongo_ray.functions.dedup import EmbeddingNearDup

    # guarantee at least one near-dup: clone vec 0 under id 9001
    clone = pa.table(
        {
            "vec_id": pa.array([9001], pa.int64()),
            "embedding": emb_tbl["embedding"].slice(0, 1).combine_chunks(),
            "label": pa.array([0], pa.int32()),
        }
    )
    emb_tbl = pa.concat_tables([emb_tbl.select(clone.column_names), clone])
    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in emb_tbl["embedding"].to_pylist()])
    ids = np.asarray(emb_tbl["vec_id"])
    mref, iref = ray.put(vecs), ray.put(ids)
    out = docs_ds(emb_tbl).map_batches(
        EmbeddingNearDup,
        fn_constructor_kwargs={"matrix_ref": mref, "ids_ref": iref, "threshold": 0.99},
        batch_format="pyarrow",
        concurrency=1,
    ).to_pandas()
    # exact reference
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = nv @ nv.T
    expect = {(int(ids[i]), int(ids[j]))
              for i in range(len(ids)) for j in range(len(ids))
              if ids[j] > ids[i] and sims[i, j] >= 0.99}
    assert set(zip(out["id_a"], out["id_b"])) == expect


def test_lsh_bucketer_deterministic(emb_tbl):
    from kafka_connect_mongo_ray.functions.similarity import LshBucketer

    b = LshBucketer(dim=64, seed=3)
    o1 = b(emb_tbl.slice(0, 100))["lsh_bucket"].to_pylist()
    o2 = LshBucketer(dim=64, seed=3)(emb_tbl.slice(0, 100))["lsh_bucket"].to_pylist()
    assert o1 == o2


def test_multimodal_stub_pipeline(docs_tbl):
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.multimodal import DecodeStub, FrameSampleStub

    media = pa.table(
        {
            "media_id": docs_tbl["doc_id"][:50],
            "mime": pa.array(["image/fake"] * 50),
            "payload": pa.array([t.encode() for t in docs_tbl["text"][:50].to_pylist()], pa.binary()),
            "meta_json": pa.array(['{"w":1,"h":1}'] * 50),
        }
    )
    ds = rd.from_arrow(media)
    feats = ds.map_batches(
        DecodeStub, fn_constructor_kwargs={"feature_dim": 8},
        batch_format="pyarrow", batch_size=16, concurrency=1,
    ).take_all()
    assert len(feats) == 50 and len(feats[0]["features"]) == 8
    frames = ds.map_batches(
        FrameSampleStub, fn_constructor_kwargs={"frames_per_clip": 3},
        batch_format="pyarrow", batch_size=16, concurrency=1,
    ).count()
    assert frames == 150
    with pytest.raises(NotImplementedError):
        DecodeStub(fake=False)(media.slice(0, 1))


def test_ivf_topk_self_hit_and_recall(emb_tbl):
    from kafka_connect_mongo_ray.functions.similarity import brute_force_topk, ivf_topk

    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in emb_tbl["embedding"].to_pylist()])
    ids = np.asarray(emb_tbl["vec_id"])
    q, qids = vecs[:3], ids[:3]
    approx = ivf_topk(docs_ds(emb_tbl), q, qids, k=5, num_cells=8, nprobe=3, seed=9)
    # rank-1 self hit for every query (its own cell is always probed)
    top1 = approx[approx["rank"] == 1]
    assert (top1["query_id"].to_numpy() == top1["neighbor_id"].to_numpy()).all()
    # reasonable recall vs exact
    exact = brute_force_topk(docs_ds(emb_tbl), q, qids, k=5)
    rec = 0
    for qid in qids:
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        rec += len(a & e) / len(e)
    assert rec / len(qids) >= 0.4  # nprobe=3/8 cells: partial recall by design


def test_embedding_near_dup_lsh_precision(emb_tbl):
    from kafka_connect_mongo_ray.functions.dedup import embedding_near_dup_lsh

    # clone vec 0 so at least one true near-dup pair exists in-bucket
    clone = pa.table(
        {
            "vec_id": pa.array([9002], pa.int64()),
            "embedding": emb_tbl["embedding"].slice(0, 1).combine_chunks(),
            "label": pa.array([0], pa.int32()),
        }
    )
    both = pa.concat_tables([emb_tbl.select(clone.column_names), clone])
    got = embedding_near_dup_lsh(docs_ds(both), threshold=0.99, num_planes=3).to_pandas()
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert (0, 9002) in pairs  # identical vectors share every hyperplane side
    # precision: every reported pair is a true >= threshold pair
    vecs = {i: np.asarray(v, dtype=np.float64)
            for i, v in zip(both["vec_id"].to_pylist(), both["embedding"].to_pylist())}
    for a, b in pairs:
        va, vb = vecs[a], vecs[b]
        cos = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        assert cos >= 0.99 - 1e-9


def test_text_edge_cases():
    from kafka_connect_mongo_ray.functions.text import (
        LanguageId,
        TokenizerStage,
        md5_fingerprint_batch,
        quality_score_batch,
        token_count_batch,
    )

    edge = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                     "text": pa.array(["", None, "   "], pa.string())})
    t = token_count_batch(edge)
    # empty string → 1 "token": matches DuckDB array_length(string_split)
    # for the oracle; corpora with runs of whitespace would diverge (the
    # testdata has none — verified single-space separated)
    assert t["n_tokens"].to_pylist()[:1] == [1]
    q = quality_score_batch(edge)
    assert q["q_n_chars"][0].as_py() == 0
    fp = md5_fingerprint_batch(edge)
    assert len(set(fp["fingerprint"].to_pylist())) >= 1  # None -> md5("")
    tok = TokenizerStage()(edge)
    assert tok["n_bpe_tokens"].to_pylist() == [0, 0, 0]
    lid = LanguageId()(edge)
    assert lid["lang_pred"].to_pylist() == ["unknown"] * 3


def test_dedup_edge_empty_and_short_text():
    from kafka_connect_mongo_ray.functions.dedup import SimHasher, ngram_jaccard

    assert ngram_jaccard("", "") == 1.0
    assert 0.0 <= ngram_jaccard("ab", "xy") <= 1.0
    assert SimHasher.simhash64("") == 0


def test_hll_approx_distinct(docs_tbl):
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.sketch import HyperLogLog, approx_distinct

    # mergeability: split adds == single add
    a, b, c = HyperLogLog(10), HyperLogLog(10), HyperLogLog(10)
    vals = [f"v{i}" for i in range(5000)]
    a.add_values(vals)
    b.add_values(vals[:2500]); c.add_values(vals[2500:])
    assert b.merge(c).estimate() == a.estimate()
    # accuracy on the events user_id column vs exact
    ev = pq.read_table("/root/testdata/sf0.01/events.parquet", columns=["user_id"])
    exact = len(set(ev["user_id"].to_pylist()))
    est = approx_distinct(rd.from_arrow(ev).repartition(4), "user_id", p=12)
    assert abs(est - exact) / exact < 0.05
    # serialization round-trip
    assert HyperLogLog.deserialize(a.serialize()).estimate() == a.estimate()


def test_multimodal_codecs_roundtrip_and_malformed():
    import numpy as np

    from kafka_connect_mongo_ray.functions.multimodal import (
        PpmDecoder,
        WavDecoder,
        decode_ppm,
        decode_wav_pcm16,
        encode_ppm,
        encode_wav_pcm16,
    )

    assert decode_ppm(encode_ppm(5, 4, 77)) == (5, 4, 77.0)
    # header comments + whitespace grammar
    assert decode_ppm(b"P6\n# c\n 3 2\n255\n" + bytes([8]) * 18) == (3, 2, 8.0)
    r = decode_wav_pcm16(encode_wav_pcm16(np.full(80, -12, dtype=np.int16), 16000))
    assert r == (16000, 80, 80 * 1_000_000 // 16000, 12)
    # malformed payloads are skipped and counted, not raised
    import pyarrow as pa

    dec = PpmDecoder()
    out = dec(pa.table({"media_id": pa.array([1, 2], pa.int64()),
                        "payload": pa.array([encode_ppm(2, 2, 9), b"nope"],
                                            pa.binary())}))
    assert out.num_rows == 1 and dec.malformed == 1
    wdec = WavDecoder()
    out = wdec(pa.table({"media_id": pa.array([1, 2], pa.int64()),
                         "payload": pa.array(
                             [b"RIFFxxxx", encode_wav_pcm16(
                                 np.zeros(3, dtype=np.int16), 8000)],
                             pa.binary())}))
    assert out.num_rows == 1 and wdec.malformed == 1


def test_embedding_near_dup_exact_matches_bruteforce(emb_tbl):
    import numpy as np

    from kafka_connect_mongo_ray.functions.dedup import embedding_near_dup_exact
    from kafka_connect_mongo_ray.utils import embedding_matrix

    got = embedding_near_dup_exact(docs_ds(emb_tbl), threshold=0.5,
                                   block_rows=37)  # force many block pairs
    got_set = set(zip(got["id_a"].to_pylist(), got["id_b"].to_pylist()))
    m = embedding_matrix(emb_tbl["embedding"])
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    ids = np.asarray(emb_tbl["vec_id"])
    sims = m @ m.T
    ai, bi = np.where(np.triu(sims >= 0.5, k=1))
    want = set(zip(np.minimum(ids[ai], ids[bi]).tolist(),
                   np.maximum(ids[ai], ids[bi]).tolist()))
    assert got_set == want


def test_avi_codec_roundtrip_and_malformed():
    import numpy as np

    from kafka_connect_mongo_ray.functions.multimodal import (
        AviDecoder,
        decode_avi,
        encode_avi_rgb,
    )

    frames = [np.full((3, 4, 3), v, np.uint8) for v in (10, 20, 30)]
    w, h, n, upf, fr = decode_avi(encode_avi_rgb(frames, 4, 3, us_per_frame=40_000))
    assert (w, h, n, upf) == (4, 3, 3, 40_000)
    assert np.frombuffer(fr[0], np.uint8).mean() == 10
    assert np.frombuffer(fr[2], np.uint8).mean() == 30
    # odd-length chunk padding path
    assert decode_avi(encode_avi_rgb([np.full((1, 1, 3), 7, np.uint8)], 1, 1))[2] == 1
    import pytest

    with pytest.raises(ValueError):
        decode_avi(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        decode_avi(encode_avi_rgb(frames, 4, 3)[:-10])  # truncated
    import pyarrow as pa

    dec = AviDecoder()
    out = dec(pa.table({"media_id": pa.array([1, 2], pa.int64()),
                        "payload": pa.array(
                            [encode_avi_rgb(frames, 4, 3), b"junk"],
                            pa.binary())}))
    assert out.num_rows == 1 and dec.malformed == 1
    assert out["n_frames"][0].as_py() == 3


def test_group_centroids_matches_numpy_reference():
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.similarity import group_centroids

    rng = np.random.default_rng(5)
    n, d = 90, 8
    m = rng.normal(size=(n, d))
    groups = rng.choice(["p", "q", "r"], n)
    t = pa.table({"g": pa.array(groups),
                  "embedding": pa.array([list(map(float, r)) for r in m],
                                        pa.list_(pa.float32()))})
    out = group_centroids(rd.from_arrow(t).repartition(4), "g",
                          num_partitions=2).to_pandas()
    assert len(out) == 3 * d
    m32 = m.astype(np.float32).astype(np.float64)
    for g in ("p", "q", "r"):
        want = np.round(m32[groups == g].mean(axis=0), 6)
        got = (out[out["g"] == g].sort_values("dim")["value"].to_numpy())
        np.testing.assert_allclose(got, want, atol=2e-6)


def test_kmeans_cluster_summary_improves_on_single_cluster():
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.similarity import (
        kmeans_cluster_summary,
    )

    rng = np.random.default_rng(9)
    # three well-separated blobs: clustering must beat the k=1 baseline
    centers = rng.normal(size=(3, 16)) * 5
    vecs = np.concatenate([c + rng.normal(size=(40, 16)) * 0.2
                           for c in centers])
    t = pa.table({"vec_id": pa.array(range(len(vecs)), pa.int64()),
                  "embedding": pa.array([list(map(float, v)) for v in vecs],
                                        pa.list_(pa.float32()))})
    out = kmeans_cluster_summary(rd.from_arrow(t).repartition(3),
                                 k=3, sample_size=60).to_pandas()
    assert out["k"].iloc[0] == 3 and out["n"].iloc[0] == len(vecs)
    assert bool(out["improved"].iloc[0])


def test_pii_and_normalization_parity_with_duckdb():
    """Pin the RE2 parity the oracles rely on: Arrow kernels and DuckDB
    count/normalize identically on adversarial strings (nulls, unicode
    case, nested punctuation, boundary-length phones)."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from kafka_connect_mongo_ray.functions.text import (
        PII_PATTERNS,
        normalize_text_batch,
        pii_counts_batch,
    )

    texts = ["a.b@x-corp.co.uk and +1 (555) 123-4567", None, "",
             "ssn 123-45-6789; mail: A@B.IO", "555-1234 too short",
             "MIXED Case,,,  punct!!— ünïcode ÉÉ", "020 7946 0958",
             "two@mails.org one@more.net 999-99-0000"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    con = duckdb.connect()
    con.register("t", t)

    got = pii_counts_batch(t)
    for name, pat in PII_PATTERNS.items():
        want = con.sql(
            "SELECT len(regexp_extract_all(coalesce(text, ''), ?)) AS n "
            "FROM t", params=[pat]).df().n.tolist()
        assert np.asarray(got[name]).tolist() == want, name

    norm = normalize_text_batch(t)["norm"].to_pylist()
    want_norm = con.sql(
        "SELECT trim(regexp_replace(lower(coalesce(text, '')), "
        "'[^a-z0-9]+', ' ', 'g')) AS s FROM t").df().s.tolist()
    assert norm == want_norm


def test_ppm_resize_nearest_and_stage():
    import numpy as np
    import pyarrow as pa

    from kafka_connect_mongo_ray.functions.multimodal import (
        PpmResizer,
        decode_ppm_pixels,
        encode_ppm_pixels,
        resize_nearest,
    )

    # gradient plane: exact nearest mapping floor(X*w/out_w)
    w, h = 7, 5
    row = np.arange(w, dtype=np.uint8)
    pixels = np.ascontiguousarray(
        np.broadcast_to(row[None, :, None], (h, w, 3)))
    out = resize_nearest(pixels, 4, 3)
    assert out.shape == (3, 4, 3)
    assert out[0, :, 0].tolist() == [(x * w) // 4 for x in range(4)]
    # upscale also works (repeats samples)
    up = resize_nearest(pixels, 14, 10)
    assert up.shape == (10, 14, 3)
    # encoded round-trip preserves the resized plane exactly
    w2, h2, back = decode_ppm_pixels(encode_ppm_pixels(out))
    assert (w2, h2) == (4, 3) and np.array_equal(back, out)

    # actor stage: resized payload decodes to the resized plane;
    # malformed inputs skipped + counted
    stage = PpmResizer(out_w=4, out_h=3)
    res = stage(pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([encode_ppm_pixels(pixels), b"bad"], pa.binary()),
    }))
    assert res.num_rows == 1 and stage.malformed == 1
    assert res["out_width"][0].as_py() == 4
    assert res["payload_bytes"][0].as_py() == len(res["payload"][0].as_py())
    _, _, plane = decode_ppm_pixels(res["payload"][0].as_py())
    assert np.array_equal(plane, out)
    assert res["resized_mean"][0].as_py() == float(out.mean())


def test_audio_feature_extractor():
    import numpy as np
    import pyarrow as pa

    from kafka_connect_mongo_ray.functions.multimodal import (
        AudioFeatureExtractor,
        encode_wav_pcm16,
    )

    n, amp = 10, 25
    signs = np.where(np.arange(n) % 2 == 0, 1, -1)
    alternating = (amp * signs).astype(np.int16)
    ramp = np.array([0, 3, -4, 0, 5], dtype=np.int16)
    stage = AudioFeatureExtractor()
    res = stage(pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "payload": pa.array(
            [encode_wav_pcm16(alternating, 8000),
             encode_wav_pcm16(ramp, 8000),
             b"RIFFxxxxJUNK"], pa.binary()),
    }))
    assert res.num_rows == 2 and stage.malformed == 1
    r0 = {c: res[c][0].as_py() for c in res.column_names}
    assert r0 == {"media_id": 1, "n_samples": n, "rms": float(amp),
                  "peak": amp, "zero_crossings": n - 1}
    r1 = {c: res[c][1].as_py() for c in res.column_names}
    # ramp: crossings only where adjacent product < 0 (3,-4); zeros break runs
    assert r1["peak"] == 5 and r1["zero_crossings"] == 1
    assert r1["rms"] == float(np.sqrt((ramp.astype(np.int64) ** 2).mean()))
