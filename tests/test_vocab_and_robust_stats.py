"""Edge cases for functions/vocab.py and the quantile-band/MAD ops —
the oracle-parity gate covers the happy path at sf0.001; these pin the
degenerate shapes (empty/1-token docs, all-clean splits, hashed-gram
equivalence, constant columns)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from kafka_connect_mongo_ray.functions.vocab import (
    bigram_topk,
    ngram_contamination,
)


def _docs(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def test_bigram_topk_counts_and_ties():
    ds = _docs([(1, "a b a b"), (2, "a b c"), (3, "z"), (4, "")])
    out = bigram_topk(ds, k=10).to_pandas()
    got = dict(zip(out.bigram, out.n))
    # "a b" appears twice in doc1 ("a b", then "a b" after "b a") + once
    # in doc2; single-token and empty docs contribute nothing
    assert got == {"a b": 3, "b a": 1, "b c": 1}
    # deterministic tie order: count desc, bigram asc
    assert list(out.bigram) == ["a b", "b a", "b c"]


def test_bigram_topk_k_cuts_with_deterministic_boundary():
    ds = _docs([(1, "x y"), (2, "x z"), (3, "x y")])
    out = bigram_topk(ds, k=1).to_pandas()
    assert list(out.bigram) == ["x y"] and list(out.n) == [2]


def test_contamination_flags_only_shared_grams():
    # doc 2 (train) and doc 1 (test) share exactly one 3-gram
    # ("quick brown fox"); doc 3 (test) is clean; short docs
    # (<n tokens) produce no grams at all
    ds = _docs([
        (1, "the quick brown fox jumps"),
        (2, "a quick brown fox sat"),
        (3, "completely different text entirely here"),
        (5, "tiny"),
    ])
    out = ngram_contamination(ds, n=3).to_pandas()
    assert dict(zip(out.doc_id, out.n_contaminated)) == {1: 1}


def test_contamination_counts_distinct_grams_once():
    # the shared gram repeats inside the test doc — counted once
    ds = _docs([(0, "p q r"), (1, "p q r x p q r")])
    out = ngram_contamination(ds, n=3).to_pandas()
    assert dict(zip(out.doc_id, out.n_contaminated)) == {1: 1}


def test_contamination_hashed_matches_exact():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    # random tails rarely collide at 4 grams; guarantee overlap by
    # planting a shared phrase in a third of the docs (both parities)
    rows = [(i, ("shared contamination phrase here " if i % 3 == 0
                 else "") + " ".join(rng.choice(vocab, size=12)))
            for i in range(60)]
    ds = _docs(rows)
    exact = ngram_contamination(ds, n=4).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    hashed = ngram_contamination(ds, n=4, hash_grams=True).to_pandas(
    ).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(exact, hashed, check_dtype=False)
    assert len(exact) > 0  # the fixture actually exercises overlap


def test_contamination_all_clean_is_empty():
    ds = _docs([(0, "a b c d"), (1, "e f g h")])
    assert ngram_contamination(ds, n=3).count() == 0


def test_quantile_band_filter_constant_group_keeps_all():
    from kafka_connect_mongo_ray.functions.quantiles import (
        quantile_band_filter,
    )

    t = pa.table({"id": pa.array(range(10), pa.int64()),
                  "g": pa.array(["s"] * 10, pa.string()),
                  "v": pa.array([5.0] * 10, pa.float64())})
    out = quantile_band_filter(ray.data.from_arrow(t), "g", "v",
                               lo_q=0.1, hi_q=0.9, scale=1)
    assert out.count() == 10


def test_quantile_band_filter_trims_tails_per_group():
    from kafka_connect_mongo_ray.functions.quantiles import (
        quantile_band_filter,
    )

    vals_a = list(range(1, 11))          # p10=1, p90=9 (disc picks)
    vals_b = [100 * v for v in range(1, 11)]
    t = pa.table({
        "id": pa.array(range(20), pa.int64()),
        "g": pa.array(["a"] * 10 + ["b"] * 10, pa.string()),
        "v": pa.array([float(v) for v in vals_a + vals_b], pa.float64()),
    })
    out = quantile_band_filter(ray.data.from_arrow(t), "g", "v",
                               lo_q=0.1, hi_q=0.9, scale=1).to_pandas()
    by_g = out.groupby("g")["v"].agg(["min", "max", "count"])
    # quantile_disc(0.1) of 10 ascending values picks the 1st element,
    # quantile_disc(0.9) the 9th — only the max is trimmed
    assert by_g.loc["a"].tolist() == [1.0, 9.0, 9]
    assert by_g.loc["b"].tolist() == [100.0, 900.0, 9]


def test_grouped_mad_matches_numpy():
    from kafka_connect_mongo_ray.functions.quantiles import grouped_mad

    rng = np.random.default_rng(3)
    g = rng.choice(["x", "y"], size=400)
    v = np.round(rng.normal(50, 10, size=400), 2)
    t = pa.table({"g": pa.array(g, pa.string()),
                  "v": pa.array(v, pa.float64())})
    out = grouped_mad(ray.data.from_arrow(t), "g", "v",
                      scale=100).to_pandas().set_index("g")

    def disc_median(a):
        a = np.sort(a)
        return int(a[max(0, int(np.ceil(0.5 * len(a))) - 1)])

    for grp in ["x", "y"]:
        c = np.rint(v[g == grp] * 100).astype(np.int64)
        med = disc_median(c)
        assert out.loc[grp, "med_scaled"] == med
        assert out.loc[grp, "mad_scaled"] == disc_median(np.abs(c - med))


def test_char_entropy_vectorized_matches_reference():
    from collections import Counter

    from kafka_connect_mongo_ray.functions.text import char_entropy_batch

    texts = ["aab", "aaaa", "ábçá 漢字", "x", ""]
    batch = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    out = char_entropy_batch(batch).to_pandas()
    got = dict(zip(out.doc_id, out.ent))

    def ref(s):
        n = len(s)
        return round(-sum((c / n) * np.log2(c / n)
                          for c in Counter(s).values()), 6)

    # empty text yields no row (SQL GROUP BY over zero char rows)
    assert set(got) == {0, 1, 2, 3}
    for i in [0, 1, 2, 3]:
        assert got[i] == pytest.approx(ref(texts[i]), abs=1e-6)
    assert got[1] == 0.0  # constant text has zero entropy


def test_char_entropy_null_text_behaves_like_empty():
    from kafka_connect_mongo_ray.functions.text import char_entropy_batch

    batch = pa.table({"doc_id": pa.array([7, 8], pa.int64()),
                      "text": pa.array(["ok", None], pa.string())})
    out = char_entropy_batch(batch).to_pandas()
    assert list(out.doc_id) == [7]


def test_winsorized_sum_clamps_tails():
    from kafka_connect_mongo_ray.functions.quantiles import winsorized_sum

    # 20 values 1..20 in one group: disc p5 picks the 1st element,
    # disc p95 the 19th — only the max saturates (20 -> 19)
    t = pa.table({"g": pa.array(["a"] * 20, pa.string()),
                  "v": pa.array([float(v) for v in range(1, 21)],
                                pa.float64())})
    out = winsorized_sum(ray.data.from_arrow(t), "g", "v",
                         lo_q=0.05, hi_q=0.95, scale=1).to_pandas()
    assert out.n.tolist() == [20]
    assert out.winsorized.tolist() == [sum(range(1, 20)) + 19]


def test_bigram_total_mass_invariant():
    # Σ counts over ALL bigrams == Σ max(0, tokens(doc) - 1): checks the
    # boundary mask drops exactly the cross-document pairs, on a corpus
    # with short/empty/multi-token docs mixed across multiple blocks
    rng = np.random.default_rng(11)
    texts = []
    for i in range(200):
        ntok = int(rng.integers(0, 6))
        texts.append(" ".join(f"t{int(rng.integers(0, 8))}"
                              for _ in range(ntok)))
    ds = _docs(list(enumerate(texts))).repartition(8)
    out = bigram_topk(ds, k=10_000).to_pandas()
    expect = sum(max(0, len(t.split(" ")) - 1) for t in texts)
    assert out.n.sum() == expect


def test_contamination_matches_pure_python_reference():
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(12)]
    rows = [(i, " ".join(rng.choice(vocab, size=int(rng.integers(2, 10)))))
            for i in range(120)]
    n = 3
    got = ngram_contamination(_docs(rows).repartition(6), n=n).to_pandas()

    def grams(text):
        ws = text.split(" ")
        return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}

    train = set()
    for i, t in rows:
        if i % 2 == 0:
            train |= grams(t)
    want = {i: len(grams(t) & train)
            for i, t in rows if i % 2 == 1 and grams(t) & train}
    assert dict(zip(got.doc_id, got.n_contaminated)) == want


def test_null_group_rows_follow_equi_join_semantics():
    # the SQL mirrors of band filter / MAD / winsorize all JOIN the
    # bounds table back USING (group) — NULL groups never match, so
    # the engine must EXCLUDE them (grouped_exact_quantiles, which
    # mirrors plain GROUP BY, keeps them — asserted as the contrast)
    from kafka_connect_mongo_ray.functions.quantiles import (
        grouped_exact_quantiles,
        grouped_mad,
        quantile_band_filter,
        winsorized_sum,
    )

    t = pa.table({
        "g": pa.array(["a"] * 5 + [None] * 3, pa.string()),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 7.0, 8.0, 9.0],
                      pa.float64()),
    })
    ds = ray.data.from_arrow(t)

    trimmed = quantile_band_filter(ds, "g", "v", lo_q=0.0, hi_q=1.0,
                                   scale=1).to_pandas()
    assert len(trimmed) == 5 and trimmed.g.notna().all()

    mad = grouped_mad(ds, "g", "v", scale=1).to_pandas()
    assert list(mad.g) == ["a"]

    win = winsorized_sum(ds, "g", "v", lo_q=0.0, hi_q=1.0,
                         scale=1).to_pandas()
    assert list(win.g) == ["a"] and win.n.tolist() == [5]

    # GROUP BY semantics contrast: the quantile table keeps the NULL group
    qt = grouped_exact_quantiles(ds, "g", "v", [0.5], scale=1).to_pandas()
    assert len(qt) == 2


def test_incremental_dedup_three_windows(tmp_path):
    # cross-window dups drop forever; in-window dups keep the first id;
    # a window of all-seen content emits nothing; re-appended index
    # files accumulate without a manifest
    from kafka_connect_mongo_ray.state.dedup_index import (
        incremental_exact_dedup,
    )

    idx = str(tmp_path / "idx")
    w1 = incremental_exact_dedup(
        _docs([(2, "b"), (5, "b"), (3, "c")]), idx, num_buckets=4)
    assert sorted(w1.to_pandas().doc_id) == [2, 3]
    w2 = incremental_exact_dedup(
        _docs([(10, "b"), (11, "d"), (12, "d"), (13, "e")]), idx,
        num_buckets=4)
    assert sorted(w2.to_pandas().doc_id) == [11, 13]
    w3 = incremental_exact_dedup(
        _docs([(20, "b"), (21, "d"), (22, "e"), (23, "c")]), idx,
        num_buckets=4)
    assert w3.count() == 0


def test_incremental_minhash_dedup_windows(tmp_path):
    # near-dup and exact re-ingests drop against the persisted band
    # index; unrelated docs admit; first window admits everything
    from kafka_connect_mongo_ray.state.dedup_index import (
        incremental_minhash_dedup,
    )

    rng = np.random.default_rng(5)
    vocab = [f"tok{i}" for i in range(200)]

    def mk(n):
        return " ".join(rng.choice(vocab, size=n))

    base = mk(120)
    near = base[: len(base) - 8] + " extraz"
    idx = str(tmp_path / "mh_idx")
    w1 = incremental_minhash_dedup(
        _docs([(1, base), (2, mk(120))]), idx, num_buckets=4)
    assert sorted(w1.to_pandas().doc_id) == [1, 2]
    w2 = incremental_minhash_dedup(
        _docs([(10, near), (11, mk(120))]), idx, num_buckets=4)
    assert sorted(w2.to_pandas().doc_id) == [11]
    # exact re-ingest: identical text -> identical signature -> every
    # band collides -> guaranteed drop
    w3 = incremental_minhash_dedup(_docs([(20, base)]), idx,
                                   num_buckets=4)
    assert w3.count() == 0
