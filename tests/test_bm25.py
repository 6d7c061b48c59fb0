"""functions/retrieval.py::bm25_topk against a pure-Python BM25 on a
random word-soup corpus (the same generator family as the documents
fixture)."""

import math

import numpy as np
import pandas as pd
import pytest

VOCAB = ["join", "scan", "hash", "sort", "merge", "stream", "window",
         "the", "a", "batch"]


def _corpus(seed: int, n_docs: int = 120):
    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(VOCAB, rng.integers(3, 40)))
             for _ in range(n_docs)]
    return pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64),
                         "text": texts})


def _bm25_ref(df, terms, k, k1=1.2, b=0.75):
    toks = [t.split(" ") for t in df["text"]]
    dl = [len(t) for t in toks]
    n = len(df)
    avgdl = sum(dl) / n
    scores = []
    for d, length in zip(toks, dl):
        s = 0.0
        for t in terms:
            tf = d.count(t)
            df_t = sum(1 for dd in toks if t in dd)
            idf = math.log((n - df_t + 0.5) / (df_t + 0.5) + 1.0)
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * length / avgdl))
        scores.append(s)
    out = pd.DataFrame({"doc_id": df["doc_id"], "score": scores})
    return out.sort_values(["score", "doc_id"],
                           ascending=[False, True]).head(k)


@pytest.mark.parametrize("seed", [0, 3])
def test_bm25_matches_reference(seed):
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.retrieval import bm25_topk

    df = _corpus(seed)
    terms = ["hash", "stream"]
    got = bm25_topk(rd.from_pandas(df).repartition(4), terms=terms,
                    k=7).to_pandas()
    want = _bm25_ref(df, terms, 7).reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(got["score"], want["score"], rtol=0, atol=5e-7)
    # descending, tie-broken by id
    assert (got["score"].diff().dropna() <= 0).all()


def test_bm25_term_absent_everywhere():
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.retrieval import bm25_topk

    df = _corpus(1, n_docs=30)
    got = bm25_topk(rd.from_pandas(df).repartition(2),
                    terms=["zzz_not_a_word"], k=5).to_pandas()
    assert len(got) == 5
    assert (got["score"] == 0.0).all()


def test_bm25_multi_equals_single_per_query():
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.retrieval import (
        bm25_topk,
        bm25_topk_multi,
    )

    df = _corpus(2)
    queries = {0: ["hash", "stream"], 1: ["sort"], 2: ["merge", "the", "a"]}
    multi = bm25_topk_multi(rd.from_pandas(df).repartition(4),
                            queries=queries, k=6).to_pandas()
    for qid, terms in queries.items():
        single = bm25_topk(rd.from_pandas(df).repartition(4), terms=terms,
                           k=6).to_pandas()
        part = (multi[multi["query_id"] == qid]
                .sort_values(["score", "doc_id"], ascending=[False, True])
                .reset_index(drop=True)[["doc_id", "score"]])
        assert part["doc_id"].tolist() == single["doc_id"].tolist()
        assert part["score"].tolist() == single["score"].tolist()
