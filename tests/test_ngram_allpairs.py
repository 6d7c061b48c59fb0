"""Exact word-n-gram AllPairs similarity join: the distributed
prefix-filter pipeline must equal brute-force all-pairs Jaccard —
recall AND precision — on corpora with injected near-dup structure."""

import itertools

import numpy as np
import pyarrow as pa
import pytest


def _brute_pairs(texts, n, thr):
    from kafka_connect_mongo_ray.functions.dedup import word_ngram_jaccard

    out = set()
    for (i, a), (j, b) in itertools.combinations(enumerate(texts), 2):
        if word_ngram_jaccard(a, b, n) >= thr:
            out.add((i, j))
    return out


def _corpus(seed=7, n_docs=60):
    rng = np.random.default_rng(seed)
    vocab = np.array("the a sort merge key hash join scan row col agg".split())
    texts = []
    for i in range(n_docs):
        toks = list(rng.choice(vocab, size=rng.integers(5, 25)))
        texts.append(" ".join(toks))
    # inject near-dups: single-token edits and exact copies
    for i in range(0, n_docs, 7):
        toks = texts[i].split(" ")
        toks[len(toks) // 2] = "edited"
        texts.append(" ".join(toks))
    texts.append(texts[0])
    return texts


@pytest.mark.parametrize("thr", [0.3, 0.5, 0.8])
def test_allpairs_equals_brute_force(ray_session, thr):
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.dedup import ngram_allpairs_pairs

    texts = _corpus()
    want = _brute_pairs(texts, 3, thr)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    got_df = ngram_allpairs_pairs(ds, n=3, threshold=thr,
                                  num_partitions=8).to_pandas()
    got = set(zip(got_df["id_a"].astype(int), got_df["id_b"].astype(int)))
    assert got == want  # exact: recall-complete candidates × exact verify


def test_word_ngrams_short_text_convention():
    from kafka_connect_mongo_ray.functions.dedup import _word_ngrams

    # < n tokens ⇒ one gram (the whole token list), mirroring the SQL
    # list_slice overrun semantics
    assert _word_ngrams("a b", 3) == ["a b"]
    assert _word_ngrams("", 3) == [""]
    assert _word_ngrams(None, 3) == [""]
    assert _word_ngrams("a b c d", 3) == ["a b c", "b c d"]
