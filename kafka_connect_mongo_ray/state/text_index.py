"""Persisted BM25 inverted index — the lexical-retrieval member of the
persisted-index family (``state/dedup_index.py`` fingerprints,
``state/ann_index.py`` IVF cells): the corpus is tokenized ONCE into
term-bucketed Parquet postings, and every later query opens ONLY the
bucket directories its terms hash to — the index never moves through
the object store and query cost is O(matching postings), independent
of corpus size.

(Reference analog: none — the reference ships records without search;
this is the training-data-pipeline surface on top of SURVEY.md §2.)

Layout:

- ``postings/term_bucket=B/*.parquet`` — rows ``(term, doc_id, tf,
  dl)``: one row per DISTINCT (term, document) pair, ``tf`` the term
  count in that document and ``dl`` the document length denormalized
  onto the posting so scoring never joins a doclen table. ``df`` of a
  term is exactly its posting-row count, so queries get it free from
  the rows they already read.
- ``manifest.json`` — corpus stats (N, avgdl), the bucket modulus and
  the format tag; written LAST as the commit marker (the build is one
  tokenize pass into postings plus one lightweight stats pass; a crash
  anywhere leaves no manifest and readers refuse the directory).

Tokenization is the engine's standard exact whitespace split
(SQL-mirrorable as ``string_split(text, ' ')``), identical to
``functions/retrieval.py`` — so a query against the persisted index
reproduces :func:`~kafka_connect_mongo_ray.functions.retrieval.bm25_topk`
scores to the shared 6-dp rounding grid (accumulation order differs:
per-posting contributions are Sum-reduced per document instead of
summed in query-term order; at BM25 score magnitudes the last-ULP
difference is ~1e-15, nine decades under the grid).

Scale contract: one term's postings live in one bucket directory but
MANY files (each build task writes its own part), so a stopword's
posting list streams block-by-block through the scoring stage rather
than materializing in one task; the per-document Sum reduce is the
only exchange and is bounded by documents-matching-any-query-term.
"""

from __future__ import annotations

import json
import math
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kafka_connect_mongo_ray.utils import stable_hash_buckets

__all__ = ["build_bm25_index", "bm25_index_topk"]

_MANIFEST = "manifest.json"


def _postings_fn(id_col: str, text_col: str, num_buckets: int):
    def fn(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch[text_col], " ").combine_chunks()
        vals = toks.values
        offs = np.asarray(toks.offsets, dtype=np.int64)
        dl = np.diff(offs)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        enc = pc.dictionary_encode(vals)
        codes = np.asarray(enc.indices, dtype=np.int64)
        vocab = enc.dictionary
        # one np.unique over packed (doc, term-code) keys gives every
        # distinct (doc, term) pair and its tf — no Python loop
        doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), dl)
        key = doc_idx * len(vocab) + codes
        uniq, tf = np.unique(key, return_counts=True)
        d = uniq // len(vocab)
        t = uniq % len(vocab)
        out = pa.table({
            "term": vocab.take(pa.array(t, pa.int64())),
            id_col: pa.array(ids[d], pa.int64()),
            "tf": pa.array(tf.astype(np.int64), pa.int64()),
            "dl": pa.array(dl[d].astype(np.int64), pa.int64()),
        })
        bucket = stable_hash_buckets(out, ["term"], num_buckets)
        return out.append_column("term_bucket",
                                 pa.array(bucket.astype(np.int64), pa.int64()))

    return fn


def build_bm25_index(ds, index_dir: str, *, num_buckets: int = 16,
                     id_col: str = "doc_id", text_col: str = "text") -> dict:
    """Build (or rebuild) the persisted BM25 index from a document
    Dataset. Overwrites ``index_dir``; the manifest lands last so a
    crashed build is refused by readers and a re-run starts clean.
    Returns the manifest dict."""
    from ray.data.aggregate import Count, Sum

    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)

    ds.map_batches(_postings_fn(id_col, text_col, num_buckets),
                   batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "postings"), partition_cols=["term_bucket"])

    # corpus stats: one lightweight pass (dl per doc -> Count + Sum)
    def doclen(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch[text_col], " ").combine_chunks()
        return pa.table({"dl": pa.array(
            np.diff(np.asarray(toks.offsets, dtype=np.int64)), pa.int64())})

    stats = ds.map_batches(doclen, batch_format="pyarrow").aggregate(
        Count(), Sum("dl", alias_name="dl"))
    n_docs = int(stats["count()"])
    manifest = {"num_buckets": int(num_buckets), "n_docs": n_docs,
                "sum_dl": int(stats["dl"]), "id_col": id_col,
                "text_col": text_col, "format": 1}
    tmp = os.path.join(index_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(index_dir, _MANIFEST))
    return manifest


def bm25_index_topk(index_dir: str, terms: list[str], *, k: int = 10,
                    k1: float = 1.2, b: float = 0.75, round_to: int = 6):
    """Top-``k`` documents by BM25 score against the PERSISTED index:
    opens ONLY the bucket directories the query terms hash to, filters
    their postings to the terms, derives ``df`` from the posting-row
    counts, and Sum-reduces per-posting contributions per document —
    one document-domain exchange, corpus never rescanned. Returns a
    Dataset (id_col, score) with the full-scan tie-break (descending
    score, ascending id), scores rounded to ``round_to``.

    Only documents containing ≥1 query term can appear (contributions
    are strictly positive); callers wanting full-corpus zero-score
    padding semantics should use the in-memory
    :func:`~kafka_connect_mongo_ray.functions.retrieval.bm25_topk`."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.utils import two_level_pick

    mpath = os.path.join(index_dir, _MANIFEST)
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"no committed BM25 index at {index_dir} (manifest missing — "
            f"crashed or absent build)")
    with open(mpath) as f:
        manifest = json.load(f)
    id_col = manifest["id_col"]
    n = manifest["n_docs"]
    avgdl = manifest["sum_dl"] / n

    probe = pa.table({"term": pa.array(terms, pa.string())})
    buckets = sorted(set(stable_hash_buckets(
        probe, ["term"], manifest["num_buckets"]).tolist()))
    dirs = [d for c in buckets
            if os.path.isdir(d := os.path.join(index_dir, "postings",
                                               f"term_bucket={c}"))]
    if not dirs:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        return rd.from_arrow(empty)
    files = [os.path.join(d, f) for d in dirs
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    term_arr = pa.array(terms, pa.string())
    postings = rd.read_parquet(
        files, columns=["term", id_col, "tf", "dl"]).map_batches(
        lambda t: t.filter(pc.is_in(t["term"], term_arr)),
        batch_format="pyarrow").materialize()

    # df per term = posting-row count (term-domain scalars)
    def df_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["term"]).group_by("term").aggregate(
            [([], "count_all")])
        return g.rename_columns(["term", "df"])

    df = {r["term"]: int(r["df"])
          for r in postings.map_batches(df_partial, batch_format="pyarrow")
          .groupby("term").aggregate(Sum("df", alias_name="df")).take_all()}
    idf = {t: math.log((n - df.get(t, 0) + 0.5) / (df.get(t, 0) + 0.5) + 1.0)
           for t in terms}

    def contrib(batch: pa.Table) -> pa.Table:
        tf = np.asarray(batch["tf"], dtype=np.float64)
        dl = np.asarray(batch["dl"], dtype=np.float64)
        w = np.array([idf[t] for t in batch["term"].to_pylist()],
                     dtype=np.float64)
        s = w * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        # batch-local per-doc partial sums before the exchange
        g = pa.table({id_col: batch[id_col],
                      "score": pa.array(s, pa.float64())}
                     ).group_by(id_col).aggregate([("score", "sum")])
        return g.rename_columns([id_col, "score"])

    scored = postings.map_batches(contrib, batch_format="pyarrow").groupby(
        id_col).aggregate(Sum("score", alias_name="score"))

    def pick(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(batch, sort_keys=[("score", "descending"),
                                                  (id_col, "ascending")])
        return batch.take(order[:k])

    # width=None: the groupby output's block count is not known lazily
    # and the candidate volume is already <= partitions * k
    out = two_level_pick(scored.map_batches(pick, batch_format="pyarrow"),
                         pick, None)
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("score"), "score",
            pc.round(pc.cast(t["score"], pa.float64()), round_to,
                     round_mode="half_towards_infinity")),
        batch_format="pyarrow")
