"""BM25 ranked retrieval over a document Dataset.

The training-data engine's lexical search primitive (complement of the
embedding ANN family in ``functions/similarity.py``). Okapi BM25 with
the standard (k1, b) shape and the +1 idf smoothing:

    idf(t)  = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)
    s(d, t) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

Distributed shape: ONE tokenize pass materializes a narrow
(id, dl, tf_0..tf_T) table (tf only for the T query terms — the
inverted-index projection, never the token stream). Corpus statistics
(N, avgdl, df_t) are Sum-aggregates of that table — a scalar row on the
driver, broadcast back into the score stage as plain closure values.
Top-k runs as per-block top-k followed by a global sort+limit over
blocks·k candidate rows, never a full-corpus global sort.

Tokenization is exact whitespace splitting (SQL-reproducible:
``string_split(text, ' ')``); per-term counts are one vectorized
``pc.equal`` over the flattened token values + ``np.add.reduceat`` over
the list offsets per batch — no Python loop over rows or tokens.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["bm25_topk", "bm25_topk_multi"]


def _tf_table(terms: list[str], id_col: str, text_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch[text_col], " ").combine_chunks()
        vals = toks.values
        offs = np.asarray(toks.offsets, dtype=np.int64)
        cols = {id_col: batch[id_col],
                "dl": pa.array(np.diff(offs), pa.int64())}
        for i, t in enumerate(terms):
            m = np.asarray(pc.equal(vals, t).fill_null(False), dtype=np.int64)
            ends = np.concatenate(([0], np.cumsum(m)))
            cols[f"tf_{i}"] = pa.array(ends[offs[1:]] - ends[offs[:-1]],
                                       pa.int64())
        return pa.table(cols)

    return fn


def bm25_topk(ds, *, terms: list[str], id_col: str = "doc_id",
              text_col: str = "text", k: int = 10, k1: float = 1.2,
              b: float = 0.75, round_to: int = 6):
    """Top-``k`` documents by BM25 score for the bag-of-words query
    ``terms``. Returns a Dataset (id_col, score) sorted by score
    descending, ties broken by ascending id. ``score`` is rounded to
    ``round_to`` decimals (mirror with ROUND in a SQL oracle)."""
    from ray.data.aggregate import Count, Sum

    tf = ds.map_batches(_tf_table(terms, id_col, text_col),
                        batch_format="pyarrow").materialize()

    # corpus stats: one tiny driver row (df_t via per-batch 0/1 partials)
    def presence(batch: pa.Table) -> pa.Table:
        cols = {"dl": batch["dl"]}
        for i in range(len(terms)):
            cols[f"df_{i}"] = pc.cast(
                pc.greater(batch[f"tf_{i}"], 0), pa.int64())
        return pa.table(cols)

    aggs = [Count(), Sum("dl", alias_name="dl")] + [
        Sum(f"df_{i}", alias_name=f"df_{i}") for i in range(len(terms))]
    stats = tf.map_batches(presence, batch_format="pyarrow").aggregate(*aggs)
    n = stats["count()"]
    avgdl = stats["dl"] / n
    idf = [math.log((n - stats[f"df_{i}"] + 0.5)
                    / (stats[f"df_{i}"] + 0.5) + 1.0)
           for i in range(len(terms))]

    def score_block(batch: pa.Table) -> pa.Table:
        dl = np.asarray(batch["dl"], dtype=np.float64)
        denom_dl = k1 * (1.0 - b + b * dl / avgdl)
        score = np.zeros(len(dl), dtype=np.float64)
        for i in range(len(terms)):
            tfv = np.asarray(batch[f"tf_{i}"], dtype=np.float64)
            score += idf[i] * tfv * (k1 + 1.0) / (tfv + denom_dl)
        t = pa.table({id_col: batch[id_col],
                      "score": pa.array(score, pa.float64())})
        # per-block top-k: only blocks*k candidate rows reach the
        # global sort
        order = pc.sort_indices(t, sort_keys=[("score", "descending"),
                                              (id_col, "ascending")])
        return t.take(order[:k])

    return (tf.map_batches(score_block, batch_format="pyarrow")
            .sort(["score", id_col], descending=[True, False])
            .limit(k)
            .map_batches(lambda t: t.set_column(
                t.schema.get_field_index("score"), "score",
                pc.round(t["score"], round_to,
                         round_mode="half_towards_infinity")),
                batch_format="pyarrow"))


def bm25_topk_multi(ds, *, queries: dict, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 10, k1: float = 1.2,
                    b: float = 0.75, round_to: int = 6):
    """Per-query BM25 top-``k`` for a BATCH of term-bag queries in ONE
    corpus pass — the production shape when many searches share a scan:
    the tf table covers the union of all query terms, corpus stats
    reduce once, and each block emits its local top-k PER QUERY, so the
    final per-query pick handles blocks × k rows per query. Returns a
    Dataset (query_id, id_col, score) with ties broken by ascending id.

    ``queries`` maps integer query_id → list of terms; a query's score
    sums its terms in list order (mirror that order in a SQL oracle)."""
    import math

    from ray.data.aggregate import Count, Sum

    terms = sorted({t for ts in queries.values() for t in ts})
    col_of = {t: i for i, t in enumerate(terms)}

    tf = ds.map_batches(_tf_table(terms, id_col, text_col),
                        batch_format="pyarrow").materialize()

    def presence(batch: pa.Table) -> pa.Table:
        cols = {"dl": batch["dl"]}
        for i in range(len(terms)):
            cols[f"df_{i}"] = pc.cast(
                pc.greater(batch[f"tf_{i}"], 0), pa.int64())
        return pa.table(cols)

    aggs = [Count(), Sum("dl", alias_name="dl")] + [
        Sum(f"df_{i}", alias_name=f"df_{i}") for i in range(len(terms))]
    stats = tf.map_batches(presence, batch_format="pyarrow").aggregate(*aggs)
    n = stats["count()"]
    avgdl = stats["dl"] / n
    idf = [math.log((n - stats[f"df_{i}"] + 0.5)
                    / (stats[f"df_{i}"] + 0.5) + 1.0)
           for i in range(len(terms))]

    qitems = sorted(queries.items())

    def score_block(batch: pa.Table) -> pa.Table:
        dl = np.asarray(batch["dl"], dtype=np.float64)
        denom_dl = k1 * (1.0 - b + b * dl / avgdl)
        ids_out, qid_out, score_out = [], [], []
        for qid, qterms in qitems:
            score = np.zeros(len(dl), dtype=np.float64)
            for t in qterms:
                i = col_of[t]
                tfv = np.asarray(batch[f"tf_{i}"], dtype=np.float64)
                score += idf[i] * tfv * (k1 + 1.0) / (tfv + denom_dl)
            t_q = pa.table({id_col: batch[id_col],
                            "score": pa.array(score, pa.float64())})
            order = pc.sort_indices(t_q, sort_keys=[("score", "descending"),
                                                    (id_col, "ascending")])
            top = t_q.take(order[:k])
            ids_out.append(top[id_col])
            score_out.append(top["score"])
            qid_out.append(pa.array(np.full(top.num_rows, qid, np.int64)))
        return pa.table({
            "query_id": pa.concat_arrays([a.combine_chunks() if isinstance(
                a, pa.ChunkedArray) else a for a in qid_out]),
            id_col: pa.concat_arrays([a.combine_chunks() if isinstance(
                a, pa.ChunkedArray) else a for a in ids_out]),
            "score": pa.concat_arrays([a.combine_chunks() if isinstance(
                a, pa.ChunkedArray) else a for a in score_out]),
        })

    def pick(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("score", "descending"),
                                              (id_col, "ascending")])
        top = g.take(order[:k])
        return top.set_column(
            top.schema.get_field_index("score"), "score",
            pc.round(top["score"], round_to,
                     round_mode="half_towards_infinity"))

    return (tf.map_batches(score_block, batch_format="pyarrow")
            .groupby("query_id").map_groups(pick, batch_format="pyarrow"))
