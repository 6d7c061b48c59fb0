"""BM25 ranked retrieval over a document Dataset.

The training-data engine's lexical search primitive (complement of the
embedding ANN family in ``functions/similarity.py``). Okapi BM25 with
the standard (k1, b) shape and the +1 idf smoothing:

    idf(t)  = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)
    s(d, t) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

Distributed shape: ONE tokenize pass materializes a narrow
(id, dl, tf_0..tf_T) table (tf only for the T query terms — the
inverted-index projection, never the token stream). The tf table is a
first-class handle (:func:`build_tf_table`) so MANY queries can share
one tokenize pass — build it over the union of their terms and pass it
to :func:`bm25_topk` / :func:`bm25_topk_multi` via ``tf``/``tf_terms``.
Corpus statistics (N, avgdl, df_t) are Sum-aggregates of that table —
a scalar row on the driver, broadcast back into the score stage as
plain closure values.

Top-k is a two-level candidate reduce, NOT a global sort: every block
emits its local top-k, an intermediate coalesce prunes to
``fanin × k`` when the corpus has many blocks, and one final task
picks the answer — the all-to-all Sort operator's per-block fixed
costs dwarf the ≤ blocks·k candidate rows at every scale (measured
2.6 s → 0.3 s on a 64-block corpus).

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

__all__ = ["build_tf_table", "bm25_topk", "bm25_topk_multi",
           "tfidf_top_terms", "unigram_logprob"]

from kafka_connect_mongo_ray.utils import TOPK_FANIN as _FANIN
from kafka_connect_mongo_ray.utils import two_level_pick as _shared_pick


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


def build_tf_table(ds, terms: list[str], *, id_col: str = "doc_id",
                   text_col: str = "text"):
    """Materialized (id, dl, tf_0..tf_T) projection for ``terms`` —
    the shareable product of the one expensive corpus pass. Column
    ``tf_i`` counts ``terms[i]``; pass the same list as ``tf_terms``
    to the query functions so they resolve their terms to columns."""
    return ds.map_batches(_tf_table(terms, id_col, text_col),
                          batch_format="pyarrow").materialize()


def _corpus_stats(tf, nterms: int):
    """(N, avgdl, idf[0..nterms)) from one tiny aggregate over the tf
    table: per-batch 0/1 presence partials, Sum-reduced driver-side."""
    from ray.data.aggregate import Count, Sum

    def presence(batch: pa.Table) -> pa.Table:
        cols = {"dl": batch["dl"]}
        for i in range(nterms):
            cols[f"df_{i}"] = pc.cast(
                pc.greater(batch[f"tf_{i}"], 0), pa.int64())
        return pa.table(cols)

    aggs = [Count(), Sum("dl", alias_name="dl")] + [
        Sum(f"df_{i}", alias_name=f"df_{i}") for i in range(nterms)]
    stats = tf.map_batches(presence, batch_format="pyarrow").aggregate(*aggs)
    n = stats["count()"]
    avgdl = stats["dl"] / n
    idf = [math.log((n - stats[f"df_{i}"] + 0.5)
                    / (stats[f"df_{i}"] + 0.5) + 1.0)
           for i in range(nterms)]
    return n, avgdl, idf


def _resolve_tf(ds, terms_needed: list[str], tf, tf_terms, id_col, text_col):
    """Return (tf_table, col_of) — building the tf pass only when the
    caller didn't supply a shared one."""
    if tf is None:
        tf = build_tf_table(ds, terms_needed, id_col=id_col,
                            text_col=text_col)
        tf_terms = terms_needed
    if tf_terms is None:
        raise ValueError("a shared tf table needs tf_terms (the term "
                         "list it was built over)")
    missing = [t for t in terms_needed if t not in tf_terms]
    if missing:
        raise ValueError(f"shared tf table lacks terms {missing}")
    return tf, {t: tf_terms.index(t) for t in tf_terms}


def bm25_topk(ds, *, terms: list[str], id_col: str = "doc_id",
              text_col: str = "text", k: int = 10, k1: float = 1.2,
              b: float = 0.75, round_to: int = 6,
              tf=None, tf_terms: list[str] | None = None):
    """Top-``k`` documents by BM25 score for the bag-of-words query
    ``terms``. Returns a Dataset (id_col, score) sorted by score
    descending, ties broken by ascending id. ``score`` is rounded to
    ``round_to`` decimals (mirror with ROUND in a SQL oracle).

    Pass ``tf``/``tf_terms`` from :func:`build_tf_table` to share one
    tokenize pass across queries; otherwise the pass runs here."""
    tf, col_of = _resolve_tf(ds, terms, tf, tf_terms, id_col, text_col)
    nterms = len(tf.schema().names) - 2  # id + dl
    n, avgdl, idf = _corpus_stats(tf, nterms)

    def score_block(batch: pa.Table) -> pa.Table:
        dl = np.asarray(batch["dl"], dtype=np.float64)
        denom_dl = k1 * (1.0 - b + b * dl / avgdl)
        score = np.zeros(len(dl), dtype=np.float64)
        for t in terms:
            i = col_of[t]
            tfv = np.asarray(batch[f"tf_{i}"], dtype=np.float64)
            score += idf[i] * tfv * (k1 + 1.0) / (tfv + denom_dl)
        t = pa.table({id_col: batch[id_col],
                      "score": pa.array(score, pa.float64())})
        # per-block top-k: only blocks*k candidate rows leave the block
        order = pc.sort_indices(t, sort_keys=[("score", "descending"),
                                              (id_col, "ascending")])
        return t.take(order[:k])

    def pick(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(batch,
                                sort_keys=[("score", "descending"),
                                           (id_col, "ascending")])
        return batch.take(order[:k])

    out = _shared_pick(
        tf.map_batches(score_block, batch_format="pyarrow"),
        pick, tf.num_blocks())
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("score"), "score",
            pc.round(t["score"], round_to,
                     round_mode="half_towards_infinity")),
        batch_format="pyarrow")


def tfidf_top_terms(ds, *, n_docs: int, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 3,
                    round_to: int = 6,
                    num_partitions: int | None = None, tf=None):
    """FULL-VOCABULARY TF-IDF: each document's top-``k`` terms by
    ``tf · ln(N / df)`` (raw term count × inverse document frequency),
    score descending, ties by term ascending.

    Unlike the BM25 path (tf columns for a FIXED query-term list),
    this materializes the classic sparse matrix as a narrow
    (doc, term, tf) token table — the whole-corpus product:

    1. *tf pass*: per batch, whitespace-split (the SQL-reproducible
       ``string_split(text, ' ')``) and count (doc, term) occurrences
       via one vectorized pandas groupby over the flattened token
       values — output is distinct-pair rows, never the token stream.
       The table is materialized once and consumed by both the df
       aggregate and the scoring join (the multi-consumer staging
       rule).
    2. *df pass*: (doc, term) rows are distinct by construction, so
       per-batch term counts Sum-reduce to the vocabulary-sized
       (term, df) table — no distinct pass needed.
    3. *score + top-k*: a bucketed hash join tf ⋈ df on term (the
       vocabulary can exceed broadcast size at corpus scale — Heaps'
       law sublinear but unbounded), then per-doc top-k via one
       shuffle by a hash bucket of the doc id and a vectorized
       sort + head(k) per bucket.

    ``n_docs`` is the corpus document count (parquet footer metadata —
    don't pay a count() pass); ``tf`` shares a
    :func:`_token_tf_table` pass with :func:`unigram_logprob`.
    Returns (id_col, term, score) with ``score`` rounded to
    ``round_to``."""
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.stages.join import hash_join
    from kafka_connect_mongo_ray.utils import key_bucketed

    if tf is None:
        tf = _token_tf_table(ds, id_col, text_col)

    def df_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["term"]).group_by("term").aggregate(
            [([], "count_all")])
        return g.rename_columns(["term", "df"])

    dfreq = (tf.map_batches(df_partial, batch_format="pyarrow")
             .groupby("term").aggregate(Sum("df", alias_name="df")))

    joined = hash_join(tf, dfreq, on=["term"],
                       num_buckets=num_partitions or 32)

    def score(batch: pa.Table) -> pa.Table:
        tfv = np.asarray(batch["tf"], dtype=np.float64)
        dfv = np.asarray(batch["df"], dtype=np.float64)
        s = tfv * np.log(float(n_docs) / dfv)
        return pa.table({id_col: batch[id_col], "term": batch["term"],
                         "score": pa.array(s, pa.float64())})

    def topk_bucket(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__gb"])
        df = t.to_pandas().sort_values(
            [id_col, "score", "term"], ascending=[True, False, True],
            kind="mergesort")
        out = df.groupby(id_col, sort=False).head(k)
        return pa.Table.from_pandas(out, preserve_index=False).cast(t.schema)

    scored = joined.map_batches(score, batch_format="pyarrow")
    out = key_bucketed(scored, [id_col], num_partitions or 32).map_groups(
        topk_bucket, batch_format="pyarrow")
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("score"), "score",
            pc.round(t["score"], round_to,
                     round_mode="half_towards_infinity")),
        batch_format="pyarrow")


def unigram_logprob(ds, *, id_col: str = "doc_id", text_col: str = "text",
                    round_to: int = 6, num_partitions: int | None = None,
                    tf=None):
    """Per-document mean unigram log-probability under the corpus's own
    unigram language model — the classic cheap LM quality score
    (documents full of globally-rare tokens score low; boilerplate
    scores high): ``score(d) = Σ_t tf_dt · ln(cnt_t / T) / dl_d`` where
    ``cnt_t`` is the corpus count of token t and ``T`` the total token
    count.

    Shares the narrow (doc, term, tf) token-table shape with
    :func:`tfidf_top_terms` (pass ``tf`` to share one materialized
    pass): corpus counts are a vocabulary-sized Sum of tf, the total is
    a scalar, scoring is a bucketed tf ⋈ counts join plus one per-doc
    Sum pair (Σ tf·lp and Σ tf reduce together; the division happens on
    the group row). Returns (id_col, logprob) rounded to
    ``round_to``."""
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.stages.join import hash_join

    if tf is None:
        tf = _token_tf_table(ds, id_col, text_col)

    cnts = (tf.map_batches(
        lambda b: pa.table({"term": b["term"], "cnt": b["tf"]}),
        batch_format="pyarrow")
        .groupby("term").aggregate(Sum("cnt", alias_name="cnt")))
    total = float(tf.aggregate(Sum("tf", alias_name="t"))["t"])

    joined = hash_join(tf, cnts, on=["term"],
                       num_buckets=num_partitions or 32)

    def partial(batch: pa.Table) -> pa.Table:
        tfv = np.asarray(batch["tf"], dtype=np.float64)
        lp = np.log(np.asarray(batch["cnt"], dtype=np.float64) / total)
        return pa.table({id_col: batch[id_col],
                         "slp": pa.array(tfv * lp, pa.float64()),
                         "dl": pa.array(tfv, pa.float64())})

    def finish(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["slp"], dtype=np.float64)
        d = np.asarray(batch["dl"], dtype=np.float64)
        return pa.table({
            id_col: batch[id_col],
            "logprob": pc.round(pa.array(s / d, pa.float64()), round_to,
                                round_mode="half_towards_infinity")})

    return (joined.map_batches(partial, batch_format="pyarrow")
            .groupby(id_col)
            .aggregate(Sum("slp", alias_name="slp"),
                       Sum("dl", alias_name="dl"))
            .map_batches(finish, batch_format="pyarrow"))


def _token_tf_table(ds, id_col: str, text_col: str):
    """The narrow (doc, term, tf) token table shared by
    :func:`tfidf_top_terms` and :func:`unigram_logprob` — one
    vectorized pandas groupby over the flattened whitespace split per
    batch, materialized for its multiple consumers."""
    import pandas as pd

    def tf_pairs(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch[text_col], " ").combine_chunks()
        offs = np.asarray(toks.offsets, dtype=np.int64)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        df = pd.DataFrame({
            id_col: np.repeat(ids, np.diff(offs)),
            "term": np.asarray(toks.values).astype(object),
        })
        agg = df.groupby([id_col, "term"], sort=False).size().reset_index(
            name="tf")
        return pa.table({id_col: pa.array(agg[id_col].to_numpy(), pa.int64()),
                         "term": pa.array(agg["term"].to_numpy(), pa.string()),
                         "tf": pa.array(agg["tf"].to_numpy(), pa.int64())})

    return ds.map_batches(tf_pairs, batch_format="pyarrow").materialize()


def bm25_topk_multi(ds, *, queries: dict, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 10, k1: float = 1.2,
                    b: float = 0.75, round_to: int = 6,
                    tf=None, tf_terms: list[str] | None = None):
    """Per-query BM25 top-``k`` for a BATCH of term-bag queries in ONE
    corpus pass — the production shape when many searches share a scan:
    the tf table covers the union of all query terms, corpus stats
    reduce once, and each block emits its local top-k PER QUERY; the
    two-level pick keeps per-task candidate rows ≤ fanin · queries · k.
    Returns a Dataset (query_id, id_col, score) with ties broken by
    ascending id.

    ``queries`` maps integer query_id → list of terms; a query's score
    sums its terms in list order (mirror that order in a SQL oracle).
    ``tf``/``tf_terms`` (from :func:`build_tf_table` over a term
    superset) share the tokenize pass with other callers."""
    union_terms = sorted({t for ts in queries.values() for t in ts})
    tf, col_of = _resolve_tf(ds, union_terms, tf, tf_terms, id_col, text_col)
    nterms = len(tf.schema().names) - 2
    n, avgdl, idf = _corpus_stats(tf, nterms)

    qitems = sorted(queries.items())

    def _concat(arrs):
        return pa.concat_arrays([a.combine_chunks() if isinstance(
            a, pa.ChunkedArray) else a for a in arrs])

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
        return pa.table({"query_id": _concat(qid_out),
                         id_col: _concat(ids_out),
                         "score": _concat(score_out)})

    def pick(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas().sort_values(
            ["query_id", "score", id_col],
            ascending=[True, False, True], kind="mergesort")
        out = df.groupby("query_id", sort=True).head(k)
        return pa.Table.from_pandas(out, preserve_index=False).cast(
            batch.schema)

    out = _shared_pick(
        tf.map_batches(score_block, batch_format="pyarrow"),
        pick, tf.num_blocks())
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("score"), "score",
            pc.round(t["score"], round_to,
                     round_mode="half_towards_infinity")),
        batch_format="pyarrow")
