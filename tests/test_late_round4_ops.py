"""Late-round-4 operator family: RANK with ties, ordered string-agg,
funnel analysis, exact grouped COUNT DISTINCT, grouped z-score
outliers, calendar-month rollup, full-vocabulary TF-IDF, and the exact
edit-distance similarity join (Myers bit-parallel verifier).

Each test checks the DISTRIBUTED result against an independent local
ground truth (DuckDB SQL or a direct reference algorithm) on inputs
chosen to exercise the partitioning seams: ties across range buckets,
keys split across batches, cross-band candidate pairs."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(table: pa.Table, blocks: int = 4):
    import ray.data as rd

    return rd.from_arrow(table).repartition(blocks)


# ---------------------------------------------------------------------------
# rank_with_ties


def test_rank_with_ties_matches_sql_on_heavy_ties():
    rng = np.random.default_rng(11)
    v = rng.integers(0, 12, size=2000)  # 12 distinct values -> huge ties
    ids = np.arange(2000)
    t = pa.table({"id": pa.array(ids, pa.int64()),
                  "v": pa.array(v, pa.int64())})

    from kafka_connect_mongo_ray.functions.ranking import rank_with_ties

    got = (rank_with_ties(_ds(t, 8), order_col="v", num_buckets=8)
           .to_pandas().sort_values("id").reset_index(drop=True))
    want = duckdb.sql(
        "SELECT id, RANK() OVER (ORDER BY v) AS rnk FROM t ORDER BY id"
    ).df()
    assert (got.set_index("id")["rnk"] == want.set_index("id")["rnk"]).all()


def test_rank_with_ties_single_value():
    t = pa.table({"id": pa.array(range(50), pa.int64()),
                  "v": pa.array([7] * 50, pa.int64())})
    from kafka_connect_mongo_ray.functions.ranking import rank_with_ties

    got = rank_with_ties(_ds(t), order_col="v").to_pandas()
    assert (got["rnk"] == 1).all()


# ---------------------------------------------------------------------------
# group_string_agg


def test_group_string_agg_matches_sql():
    rng = np.random.default_rng(3)
    n = 800
    t = pa.table({
        "k": pa.array(rng.integers(0, 37, n), pa.int64()),
        "o": pa.array(rng.permutation(n), pa.int64()),
        "s": pa.array([f"w{int(x)}" for x in rng.integers(0, 9, n)],
                      pa.string()),
    })
    from kafka_connect_mongo_ray.functions.ranking import group_string_agg

    got = (group_string_agg(_ds(t, 8), key="k", order_cols=["o"],
                            val_col="s", sep="|", out_col="agg")
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = duckdb.sql(
        "SELECT k, STRING_AGG(s, '|' ORDER BY o) AS agg FROM t GROUP BY k "
        "ORDER BY k").df()
    pd.testing.assert_frame_equal(got, want)


# ---------------------------------------------------------------------------
# funnel_counts


def test_funnel_strict_ordering_and_missing_steps():
    # user 1 completes a->b->c in order; user 2 does b before a (b must
    # not count); user 3 has a only; user 4 does a,b at the SAME ts
    # (strictly-after excludes b); user 5 completes with interleaved
    # noise
    rows = [
        (1, 10, "a"), (1, 20, "b"), (1, 30, "c"),
        (2, 10, "b"), (2, 20, "a"), (2, 30, "c"),
        (3, 10, "a"),
        (4, 10, "a"), (4, 10, "b"),
        (5, 1, "x"), (5, 2, "a"), (5, 3, "b"), (5, 3, "x"), (5, 9, "c"),
    ]
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "ty": pa.array([r[2] for r in rows], pa.string()),
    })
    from kafka_connect_mongo_ray.functions.ranking import funnel_counts

    got = (funnel_counts(_ds(t, 4), key="u", ts_col="ts", type_col="ty",
                         steps=["a", "b", "c"])
           .to_pandas().sort_values("step"))
    # step1: users 1,2,3,4,5 have an 'a' -> 5
    # step2: b strictly after a: users 1,5 (2's b precedes a; 4 same-ts) -> 2
    # step3: c strictly after that b: users 1,5 -> 2
    assert got["users"].tolist() == [5, 2, 2]


def test_funnel_anchor_is_earliest():
    # user does a@10, b@15, a@20 — the anchor must be the EARLIEST a,
    # so b@15 counts even though a later 'a' exists after it
    t = pa.table({"u": pa.array([1, 1, 1], pa.int64()),
                  "ts": pa.array([10, 15, 20], pa.int64()),
                  "ty": pa.array(["a", "b", "a"], pa.string())})
    from kafka_connect_mongo_ray.functions.ranking import funnel_counts

    got = funnel_counts(_ds(t, 2), key="u", ts_col="ts", type_col="ty",
                        steps=["a", "b"]).to_pandas().sort_values("step")
    assert got["users"].tolist() == [1, 1]


# ---------------------------------------------------------------------------
# group_count_distinct


def test_group_count_distinct_exact_across_batches():
    rng = np.random.default_rng(5)
    g = rng.integers(0, 4, 5000)
    v = rng.integers(0, 300, 5000)
    t = pa.table({"g": pa.array([f"g{x}" for x in g], pa.string()),
                  "v": pa.array(v, pa.int64())})
    from kafka_connect_mongo_ray.functions.stats import group_count_distinct

    got = (group_count_distinct(_ds(t, 16), group_col="g", val_col="v")
           .to_pandas().sort_values("g").reset_index(drop=True))
    want = duckdb.sql(
        "SELECT g, CAST(COUNT(DISTINCT v) AS BIGINT) AS nd FROM t "
        "GROUP BY g ORDER BY g").df()
    pd.testing.assert_frame_equal(got, want)


# ---------------------------------------------------------------------------
# group_zscore_outliers


def test_group_zscore_matches_local_formula():
    rng = np.random.default_rng(9)
    g = np.repeat(["x", "y"], 500)
    v = np.concatenate([rng.integers(0, 100, 500),
                        rng.integers(1000, 1200, 500)]).astype(np.int64)
    t = pa.table({"id": pa.array(range(1000), pa.int64()),
                  "g": pa.array(g, pa.string()),
                  "v": pa.array(v, pa.int64())})
    from kafka_connect_mongo_ray.functions.stats import group_zscore_outliers

    got = group_zscore_outliers(_ds(t, 8), group_col="g", int_col="v",
                                id_cols=["id"], z_thresh=1.5).to_pandas()
    df = pd.DataFrame({"id": range(1000), "g": g, "v": v})
    keep = []
    for name, sub in df.groupby("g"):
        n, s1, s2 = float(len(sub)), float(sub.v.sum()), float((sub.v.astype(object) ** 2).sum())
        mean = s1 / n
        std = np.sqrt(s2 / n - mean * mean)
        z = (sub.v.to_numpy().astype(np.float64) - mean) / std
        keep.append(sub[np.abs(z) > 1.5])
    want_ids = set(pd.concat(keep)["id"])
    assert set(got["id"]) == want_ids


# ---------------------------------------------------------------------------
# edit-distance join


def test_myers_distance_against_reference_dp():
    rng = np.random.default_rng(17)

    def dp(a, b):
        prev = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            cur = [i] + [0] * len(b)
            for j in range(1, len(b) + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[len(b)]

    from kafka_connect_mongo_ray.functions.dedup import myers_distance

    alpha = "abcdef"
    for _ in range(200):
        a = "".join(rng.choice(list(alpha), rng.integers(0, 40)))
        b = "".join(rng.choice(list(alpha), rng.integers(0, 40)))
        assert myers_distance(a, b) == dp(a, b)


def test_edit_distance_pairs_recall_complete_cross_band():
    # corpus engineered so qualifying pairs STRADDLE length blocks:
    # base strings of lengths right at block boundaries, with k=5
    rng = np.random.default_rng(23)
    base = "".join(rng.choice(list("abcdefgh"), 60))
    texts = {
        0: base,                      # len 60 -> block 12
        1: base + "xy",               # len 62, dist 2 (same block)
        2: base + "xyzzz",            # len 65, dist 5 -> block 13 (cross)
        3: base[:-1],                 # len 59, dist 1 -> block 11 (cross)
        4: "".join(rng.choice(list("abcdefgh"), 61)),  # random, far
        5: base[:30] + "Q" * 3 + base[33:],  # 3 substitutions, same len
    }
    t = pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values()), pa.string()),
        "n_chars": pa.array([len(v) for v in texts.values()], pa.int64()),
    })
    from kafka_connect_mongo_ray.functions.dedup import (
        edit_distance_pairs,
        myers_distance,
    )

    docs = _ds(t, 3)
    got = edit_distance_pairs(docs.select_columns(["doc_id", "n_chars"]),
                              docs, max_dist=5).to_pandas()
    got_pairs = {(a, b): d for a, b, d in
                 zip(got["id_a"], got["id_b"], got["dist"])}
    ids = list(texts)
    want = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = myers_distance(texts[ids[i]], texts[ids[j]])
            if d <= 5:
                want[(min(ids[i], ids[j]), max(ids[i], ids[j]))] = d
    assert got_pairs == want
    assert (0, 2) in want and (0, 3) in want  # the cross-band pairs


def test_char_histogram_l1_bound_is_valid():
    # the prefilter claim: ed >= L1/2 — check on random pairs
    from kafka_connect_mongo_ray.functions.dedup import (
        _char_histograms,
        myers_distance,
    )

    rng = np.random.default_rng(31)
    for _ in range(50):
        a = "".join(rng.choice(list("abcd"), rng.integers(1, 30)))
        b = "".join(rng.choice(list("abcd"), rng.integers(1, 30)))
        h = _char_histograms([a, b])
        l1 = int(np.abs(h[0] - h[1]).sum())
        assert myers_distance(a, b) >= (l1 + 1) // 2


# ---------------------------------------------------------------------------
# tfidf


def test_tfidf_top_terms_matches_sql():
    docs = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "cats and dogs and cats",
        "unique words only here",
    ]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    from kafka_connect_mongo_ray.functions.retrieval import tfidf_top_terms

    got = (tfidf_top_terms(_ds(t, 2), n_docs=4, k=2)
           .to_pandas().sort_values(["doc_id", "score", "term"],
                                    ascending=[True, False, True])
           .reset_index(drop=True))
    want = duckdb.sql("""
        WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                      FROM t),
        tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
               FROM toks GROUP BY 1, 2),
        dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        scored AS (SELECT tf.doc_id, tf.term,
                          CAST(tf AS DOUBLE) * LN(4.0 / CAST(df AS DOUBLE)) AS s
                   FROM tf JOIN dfq USING (term))
        SELECT doc_id, term, ROUND(s, 6) AS score FROM scored
        QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, term) <= 2
        ORDER BY doc_id, score DESC, term
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------------------------------------------
# grouped Pearson correlation


def test_grouped_corr_matches_sql():
    rng = np.random.default_rng(41)
    n = 3000
    g = rng.choice(["a", "b", "c"], n)
    x = rng.integers(1, 50, n).astype(np.float64)
    y = x * 2 + rng.integers(0, 30, n)  # correlated
    t = pa.table({"g": pa.array(g, pa.string()),
                  "x": pa.array(x, pa.float64()),
                  "y": pa.array(y.astype(np.float64), pa.float64())})
    from kafka_connect_mongo_ray.functions.stats import grouped_corr

    got = (grouped_corr(_ds(t, 8), group_col="g", x_col="x", y_col="y")
           .to_pandas().sort_values("g").reset_index(drop=True))
    want = duckdb.sql("""
        WITH m AS (SELECT g, CAST(COUNT(*) AS BIGINT) n,
                          CAST(SUM(xi) AS BIGINT) sx, CAST(SUM(yi) AS BIGINT) sy,
                          CAST(SUM(xi*yi) AS BIGINT) sxy,
                          CAST(SUM(xi*xi) AS BIGINT) sx2,
                          CAST(SUM(yi*yi) AS BIGINT) sy2
                   FROM (SELECT g, CAST(ROUND(x) AS BIGINT) xi,
                                CAST(ROUND(y) AS BIGINT) yi FROM t)
                   GROUP BY g)
        SELECT g, n,
               ROUND((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                     / (SQRT(CAST(n AS DOUBLE)*CAST(sx2 AS DOUBLE)
                             - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                        * SQRT(CAST(n AS DOUBLE)*CAST(sy2 AS DOUBLE)
                               - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 9)
               AS corr
        FROM m ORDER BY g""").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_corr_constant_column_is_nan():
    t = pa.table({"g": pa.array(["a"] * 20, pa.string()),
                  "x": pa.array([5.0] * 20, pa.float64()),
                  "y": pa.array(np.arange(20, dtype=np.float64),
                                pa.float64())})
    from kafka_connect_mongo_ray.functions.stats import grouped_corr

    got = grouped_corr(_ds(t, 2), group_col="g", x_col="x",
                       y_col="y").to_pandas()
    assert np.isnan(got["corr"].iloc[0])


# ---------------------------------------------------------------------------
# unigram logprob


def test_unigram_logprob_matches_local_reference():
    docs = ["a a b", "b c", "a d d d"]
    t = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    from kafka_connect_mongo_ray.functions.retrieval import unigram_logprob

    got = (unigram_logprob(_ds(t, 2)).to_pandas()
           .set_index("doc_id")["logprob"])
    from collections import Counter

    cnt = Counter(w for d in docs for w in d.split(" "))
    total = float(sum(cnt.values()))
    for i, d in enumerate(docs):
        toks = d.split(" ")
        want = sum(np.log(cnt[w] / total) for w in toks) / len(toks)
        assert abs(got[i] - round(want, 6)) < 1e-9, (i, got[i], want)


def test_tf_cache_prune_keeps_current_session():
    from kafka_connect_mongo_ray.pipelines import queries as q

    cur = q._ray_session_key()
    q._BM25_TF_CACHE[("sfX", "dead-session")] = "stale"
    q._BM25_TF_CACHE[("token_tf", "sfX", "dead-session")] = "stale"
    q._BM25_TF_CACHE[("sfY", cur)] = "live"
    q._prune_stale_tf_entries()
    assert ("sfY", cur) in q._BM25_TF_CACHE
    assert all(k[-1] == cur for k in q._BM25_TF_CACHE)
    del q._BM25_TF_CACHE[("sfY", cur)]


def test_edit_distance_subsplit_identical_pairs_under_skew():
    # adversarial skew: EVERY doc has the same length -> one block
    # holds the whole corpus; a tiny cap forces multi-way sub-splits.
    # The pair set must be identical to the uncapped run.
    rng = np.random.default_rng(47)
    base = "".join(rng.choice(list("abcdefgh"), 40))
    texts = []
    for i in range(60):
        t = list(base)
        for _ in range(int(rng.integers(0, 8))):  # 0-7 substitutions
            t[int(rng.integers(0, 40))] = str(rng.choice(list("abcdefgh")))
        texts.append("".join(t))
    t = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "n_chars": pa.array([40] * 60, pa.int64())})
    from kafka_connect_mongo_ray.functions.dedup import edit_distance_pairs

    docs = _ds(t, 4)

    def run(cap):
        got = edit_distance_pairs(
            docs.select_columns(["doc_id", "n_chars"]), docs, max_dist=6,
            block_row_cap=cap).to_pandas()
        return {(a, b): d for a, b, d in
                zip(got["id_a"], got["id_b"], got["dist"])}

    uncapped = run(10_000)
    capped = run(16)  # 120 blocking rows / 16 -> s >= 8 sub-buckets
    assert uncapped == capped
    assert len(uncapped) > 0


# ---------------------------------------------------------------------------
# bloom semi join


def test_bloom_semi_join_exact_even_with_tiny_filter():
    # a deliberately undersized filter (256 bits for 400 keys) floods
    # the prefilter with false positives — the exact join behind it
    # must still produce exactly the semi join
    rng = np.random.default_rng(53)
    left = pa.table({"k": pa.array(np.arange(1000), pa.int64()),
                     "payload": pa.array(np.arange(1000) * 2, pa.int64())})
    right_keys = rng.choice(1000, 400, replace=False)
    right = pa.table({"k": pa.array(right_keys, pa.int64())})
    from kafka_connect_mongo_ray.functions.sketch import bloom_semi_join

    got = (bloom_semi_join(_ds(left, 4), _ds(right, 2), on="k",
                           num_bits=256, num_buckets=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = pd.DataFrame({"k": np.sort(right_keys)})
    want["payload"] = want["k"] * 2
    pd.testing.assert_frame_equal(got[["k", "payload"]], want,
                                  check_dtype=False)


def test_bloom_prefilter_actually_prunes():
    # with a well-sized filter, non-matching left rows drop before the
    # join: verify via bloom_contains directly (no false negatives,
    # low fp)
    from kafka_connect_mongo_ray.functions.sketch import (
        bloom_contains,
        build_bloom,
    )

    right = pa.table({"k": pa.array(np.arange(0, 500), pa.int64())})
    bits = build_bloom(_ds(right, 2), "k", num_bits=1 << 16)
    assert bloom_contains(bits, np.arange(0, 500)).all()
    fp = bloom_contains(bits, np.arange(10_000, 30_000)).mean()
    assert fp < 0.01, fp


def test_bloom_semi_join_empty_right():
    left = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    right = pa.table({"k": pa.array([], pa.int64())})
    from kafka_connect_mongo_ray.functions.sketch import bloom_semi_join

    got = bloom_semi_join(_ds(left, 1), _ds(right, 1), on="k",
                          num_buckets=2).to_pandas()
    assert len(got) == 0


# ---------------------------------------------------------------------------
# grouping sets


def test_grouping_sets_matches_sql_marginals():
    rng = np.random.default_rng(61)
    n = 2000
    t = pa.table({
        "a": pa.array([f"a{int(x)}" for x in rng.integers(0, 4, n)],
                      pa.string()),
        "b": pa.array(rng.integers(0, 7, n), pa.int64()),
        "v": pa.array(rng.integers(0, 100, n), pa.int64()),
    })
    from kafka_connect_mongo_ray.functions.rollup import rollup_aggregate

    got = (rollup_aggregate(_ds(t, 8), keys=["a", "b"], sum_cols=["v"],
                            grouping_sets=[["a"], ["b"]])
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    want = duckdb.sql("""
        SELECT COALESCE(a, 'ALL') AS a, COALESCE(b, -1) AS b,
               COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS v
        FROM t GROUP BY GROUPING SETS ((a), (b))
        ORDER BY a, b""").df()
    pd.testing.assert_frame_equal(got[["a", "b", "n", "v"]], want,
                                  check_dtype=False)


def test_grouping_sets_includes_finest_when_listed():
    t = pa.table({"a": pa.array(["x", "x", "y"], pa.string()),
                  "v": pa.array([1, 2, 3], pa.int64())})
    from kafka_connect_mongo_ray.functions.rollup import rollup_aggregate

    got = (rollup_aggregate(_ds(t, 1), keys=["a"], sum_cols=["v"],
                            grouping_sets=[["a"], []])
           .to_pandas().sort_values("a").reset_index(drop=True))
    # (a) level: x->3, y->3; () level: ALL->6
    assert got[got["a"] == "ALL"]["v"].tolist() == [6]
    assert got[got["a"] == "x"]["v"].tolist() == [3]


def test_grouping_sets_rejects_unknown_columns():
    t = pa.table({"a": pa.array(["x"], pa.string()),
                  "v": pa.array([1], pa.int64())})
    from kafka_connect_mongo_ray.functions.rollup import rollup_aggregate

    with pytest.raises(ValueError, match="non-key"):
        rollup_aggregate(_ds(t, 1), keys=["a"], sum_cols=["v"],
                         grouping_sets=[["zz"]])


# ---------------------------------------------------------------------------
# code-review regression fixes


def test_bloom_no_false_negatives_with_null_bearing_batches():
    # a null key in the same batch as real keys must not shift the
    # real keys' bit positions (dtype-stability of the key hash)
    left = pa.table({"k": pa.array([5, 7, 9], pa.int64())})
    right = pa.table({"k": pa.array([5, None, 7], pa.int64())})
    from kafka_connect_mongo_ray.functions.sketch import bloom_semi_join

    got = bloom_semi_join(_ds(left, 1), _ds(right, 1), on="k",
                          num_buckets=2).to_pandas()
    assert sorted(got["k"]) == [5, 7]


def test_funnel_int64_precision_past_2_53():
    # ts magnitudes where float64 cannot represent adjacent integers:
    # the strict ts > anchor comparison must stay exact
    big = 2 ** 60
    t = pa.table({"u": pa.array([1, 1, 2, 2], pa.int64()),
                  "ts": pa.array([big, big + 1, big, big], pa.int64()),
                  "ty": pa.array(["a", "b", "a", "b"], pa.string())})
    from kafka_connect_mongo_ray.functions.ranking import funnel_counts

    got = funnel_counts(_ds(t, 2), key="u", ts_col="ts", type_col="ty",
                        steps=["a", "b"]).to_pandas().sort_values("step")
    # user 1: b at big+1 > big -> advances; user 2: b at SAME ts -> no
    assert got["users"].tolist() == [2, 1]


def test_string_agg_keeps_null_key_group():
    t = pa.table({"k": pa.array(["x", None, "x", None], pa.string()),
                  "o": pa.array([1, 2, 3, 4], pa.int64()),
                  "s": pa.array(["a", "b", "c", "d"], pa.string())})
    from kafka_connect_mongo_ray.functions.ranking import group_string_agg

    got = group_string_agg(_ds(t, 2), key="k", order_cols=["o"],
                           val_col="s", sep="|").to_pandas()
    assert len(got) == 2
    null_row = got[got["k"].isna()]
    assert null_row["agg"].tolist() == ["b|d"]


def test_grouping_sets_rejects_duplicates_and_order_variants():
    t = pa.table({"a": pa.array(["x"], pa.string()),
                  "b": pa.array([1], pa.int64()),
                  "v": pa.array([1], pa.int64())})
    from kafka_connect_mongo_ray.functions.rollup import rollup_aggregate

    with pytest.raises(ValueError, match="duplicate grouping set"):
        rollup_aggregate(_ds(t, 1), keys=["a", "b"], sum_cols=["v"],
                         grouping_sets=[["a"], ["a"]])
    with pytest.raises(ValueError, match="duplicate grouping set"):
        rollup_aggregate(_ds(t, 1), keys=["a", "b"], sum_cols=["v"],
                         grouping_sets=[["a", "b"], ["b", "a"]])


def test_zscore_overflow_raises_loudly():
    # values ~2^32: v*v wraps int64 within a modest batch — must raise,
    # not silently compute garbage
    v = np.full(100, 2 ** 32, dtype=np.int64)
    t = pa.table({"id": pa.array(range(100), pa.int64()),
                  "g": pa.array(["x"] * 100, pa.string()),
                  "v": pa.array(v, pa.int64())})
    from kafka_connect_mongo_ray.functions.stats import group_zscore_outliers

    with pytest.raises(Exception) as ei:
        group_zscore_outliers(_ds(t, 1), group_col="g", int_col="v",
                              id_cols=["id"]).to_pandas()
    assert "overflow" in str(ei.value).lower()


# ---------------------------------------------------------------------------
# CLI query surface


def test_cli_query_runs_registry_pipeline(capsys, tmp_path):
    import json

    from kafka_connect_mongo_ray.__main__ import main

    rc = main(["queries"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["count"] >= 91
    assert out["queries"]["events_per_type"] == "oracle"

    rc = main(["query", "--name", "events_per_type",
               "--sf", "/root/testdata/sf0.001", "--limit", "3"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["rows_shown"] == 3

    rc = main(["query", "--name", "nope"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and "unknown query" in out["error"]


def test_exact_quantiles_cont_matches_duckdb():
    rng = np.random.default_rng(71)
    v = rng.normal(100, 30, 5000)
    t = pa.table({"x": pa.array(v, pa.float64())})
    from kafka_connect_mongo_ray.functions.quantiles import (
        exact_quantiles_cont,
    )
    import ray.data as rd

    got = exact_quantiles_cont(rd.from_arrow(t).repartition(8), "x",
                               [0.25, 0.5, 0.9, 0.33], scale=100).to_pandas()
    want = duckdb.sql(" UNION ALL ".join(
        f"SELECT CAST({q} AS DOUBLE) q, ROUND(quantile_cont("
        f"CAST(round(x*100) AS BIGINT), {q}), 9) value_cont FROM t"
        for q in (0.25, 0.5, 0.9, 0.33))).df()
    pd.testing.assert_frame_equal(got, want)


def test_exact_quantiles_cont_ulp_regression_large_magnitude():
    # ULP(1e7) ~ 1.9e-9 exceeds the 9-dp rounding grid, so any
    # interpolation-formula drift vs DuckDB shows up here (the
    # sf0.001 q=0.99 regression: l + d*(u-l) != l*(1-d) + u*d in the
    # last ULP; DuckDB computes the convex-combination form)
    rng = np.random.default_rng(99)
    v = rng.uniform(9.0e4, 1.1e5, 6000)
    t = pa.table({"x": pa.array(v, pa.float64())})
    from kafka_connect_mongo_ray.functions.quantiles import (
        exact_quantiles_cont,
    )
    import ray.data as rd

    qs = [0.01, 0.1, 0.33, 0.5, 0.77, 0.9, 0.99]
    got = exact_quantiles_cont(rd.from_arrow(t).repartition(8), "x",
                               qs, scale=100).to_pandas()
    want = duckdb.sql(" UNION ALL ".join(
        f"SELECT CAST({q} AS DOUBLE) q, ROUND(quantile_cont("
        f"CAST(round(x*100) AS BIGINT), {q}), 9) value_cont FROM t"
        for q in qs)).df()
    pd.testing.assert_frame_equal(got, want)


# ---------------------------------------------------------------------------
# grouped skewness / kurtosis (exact moment partials)


def test_grouped_skew_kurt_matches_sql_mirror():
    rng = np.random.default_rng(43)
    n = 4000
    g = rng.choice(["a", "b", "c"], n)
    # skewed integers: squares of small uniforms
    x = (rng.integers(1, 8, n) ** 2).astype(np.float64)
    t = pa.table({"g": pa.array(g, pa.string()),
                  "x": pa.array(x, pa.float64())})
    from kafka_connect_mongo_ray.functions.stats import grouped_skew_kurt

    got = (grouped_skew_kurt(_ds(t, 8), group_col="g", int_col="x")
           .to_pandas().sort_values("g").reset_index(drop=True))
    want = duckdb.sql("""
        WITH m AS (SELECT g, CAST(COUNT(*) AS BIGINT) n,
                          CAST(SUM(q) AS BIGINT) s1,
                          CAST(SUM(q*q) AS BIGINT) s2,
                          CAST(SUM((q*q)*q) AS BIGINT) s3,
                          CAST(SUM((q*q)*(q*q)) AS BIGINT) s4
                   FROM (SELECT g, CAST(ROUND(x) AS BIGINT) q FROM t)
                   GROUP BY g),
        f AS (SELECT g, n,
                     CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE) m1,
                     CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE) e2,
                     CAST(s3 AS DOUBLE)/CAST(n AS DOUBLE) e3,
                     CAST(s4 AS DOUBLE)/CAST(n AS DOUBLE) e4
              FROM m),
        gg AS (SELECT g, n,
                      e2 - m1*m1 m2,
                      e3 - (3.0*m1)*e2 + (2.0*(m1*m1))*m1 m3,
                      e4 - (4.0*m1)*e3 + (6.0*(m1*m1))*e2
                         - 3.0*((m1*m1)*(m1*m1)) m4
               FROM f)
        SELECT g, n, ROUND(m3/(SQRT(m2)*m2), 9) skew,
               ROUND(m4/(m2*m2) - 3.0, 9) kurt
        FROM gg ORDER BY g""").df()
    # bit-exact mirror: values must agree EXACTLY after the 9-dp round
    assert got["g"].tolist() == want["g"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    assert got["skew"].tolist() == want["skew"].tolist()
    assert got["kurt"].tolist() == want["kurt"].tolist()
    # sanity: squares of uniforms are right-skewed
    assert (got["skew"] > 0).all()


def test_grouped_skew_kurt_constant_group_is_nan():
    t = pa.table({"g": pa.array(["a"] * 10, pa.string()),
                  "x": pa.array([7.0] * 10, pa.float64())})
    from kafka_connect_mongo_ray.functions.stats import grouped_skew_kurt

    got = grouped_skew_kurt(_ds(t, 2), group_col="g",
                            int_col="x").to_pandas()
    assert np.isnan(got["skew"].iloc[0]) and np.isnan(got["kurt"].iloc[0])


def test_grouped_skew_kurt_overflow_raises():
    t = pa.table({"g": pa.array(["a"] * 4, pa.string()),
                  "x": pa.array([3e6] * 4, pa.float64())})
    from kafka_connect_mongo_ray.functions.stats import grouped_skew_kurt

    with pytest.raises(Exception):  # OverflowError inside the task
        grouped_skew_kurt(_ds(t, 1), group_col="g",
                          int_col="x").to_pandas()
