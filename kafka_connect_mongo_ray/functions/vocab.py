"""Corpus vocabulary statistics and cross-split decontamination.

Two training-data-pipeline primitives the reference has no analog for
(it ships records; SURVEY.md §2.8 covers only scalar record functions):

- :func:`bigram_topk` — the BPE-merge-step shape: global top-k adjacent
  word pairs across the corpus. One tokenize pass emits batch-local
  (bigram, count) partials (rows collapse to the batch's DISTINCT
  bigrams immediately), one vocabulary-bounded groupby-sum, then a
  two-level candidate reduce picks the top-k — no global sort, and the
  all-to-all volume is bounded by distinct bigrams per block, never by
  token count. This is exactly the hot inner step of BPE vocabulary
  induction; run it iteratively with a merge table to train one.

- :func:`ngram_contamination` — train/test decontamination: flag every
  test-split document that shares at least one word n-gram with any
  train-split document, with the count of distinct contaminated grams
  per test doc. Both splits come from one deterministic hash of the id
  (here: parity), so membership is reproducible across engines. Shape:
  one tokenize pass builds per-doc DISTINCT n-gram rows (deduplicated
  inside the generating task — a document's grams never span tasks),
  the train side is pruned to keys-only + per-batch dedup by the semi
  join itself, and the one all-to-all is a bucketed existence join on
  the gram string. At 100 TB, pass ``hash_grams=True`` so the exchange
  ships uint64 gram fingerprints instead of strings (md5-derived, so a
  SQL oracle can reproduce them bit-for-bit).

Tokenization is exact whitespace splitting (``string_split(text, ' ')``
in the SQL mirror) — the same contract as functions/retrieval.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kafka_connect_mongo_ray.utils import limit_worker_threads, two_level_pick

__all__ = ["bigram_topk", "ngram_contamination"]


def _tokens_with_doc_index(batch: pa.Table, text_col: str):
    """(flat token values, token→row-index map) for one batch; null
    texts tokenize as the empty string (one empty token, zero grams —
    matching ``string_split('', ' ') = ['']``)."""
    toks = pc.split_pattern(
        pc.fill_null(batch[text_col], ""), " ").combine_chunks()
    vals = toks.values
    offs = np.asarray(toks.offsets, dtype=np.int64)
    doc_of = np.repeat(np.arange(len(offs) - 1, dtype=np.int64),
                       np.diff(offs))
    return vals, doc_of


def _window_starts(doc_of: np.ndarray, n: int) -> np.ndarray:
    """Start positions of n-token windows that stay inside one row's
    token list (vectorized; no per-row loop)."""
    total = len(doc_of)
    if total < n:
        return np.empty(0, dtype=np.int64)
    valid = doc_of[: total - n + 1] == doc_of[n - 1:]
    return np.nonzero(valid)[0].astype(np.int64)


def _join_windows(vals: pa.Array, starts: np.ndarray, n: int) -> pa.Array:
    """Space-joined n-token window strings at ``starts`` — one
    ``binary_join_element_wise`` over n shifted takes."""
    parts = [vals.take(pa.array(starts + i, pa.int64()))
             for i in range(n)]
    return pc.binary_join_element_wise(*parts, " ")


def bigram_topk(ds, *, id_col: str = "doc_id", text_col: str = "text",
                k: int = 50, num_partitions: int | None = None):
    """Global top-``k`` adjacent word pairs (the BPE pair-count step).

    Returns a Dataset ``(bigram, n)`` — the ``k`` most frequent
    space-joined adjacent token pairs, ties broken by ascending bigram
    (deterministic; mirror with ``ORDER BY n DESC, bigram``).

    Scale shape: batch-local ``value_counts`` partials collapse each
    task's pairs to its distinct bigrams before the one groupby-sum
    exchange (volume = distinct bigrams per block — Zipf-bounded, not
    token-count-bounded); top-k is a per-block pick + two-level reduce,
    never a global sort."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        limit_worker_threads()
        vals, doc_of = _tokens_with_doc_index(batch, text_col)
        starts = _window_starts(doc_of, 2)
        if len(starts) == 0:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        grams = _join_windows(vals, starts, 2)
        vc = pc.value_counts(grams)
        return pa.table({"bigram": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    kwargs = {"num_partitions": num_partitions} if num_partitions else {}
    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("bigram", **kwargs)
              .aggregate(Sum("n", alias_name="n")))

    def pick(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("n", "descending"),
                                              ("bigram", "ascending")])
        return t.take(order[:k]).select(["bigram", "n"])

    # candidate rows after the per-block pick ≤ output-partitions · k;
    # the shared two-level reduce prunes through a coalesce when the
    # groupby fans out wider than the fan-in
    cand = counts.map_batches(pick, batch_format="pyarrow")
    return two_level_pick(cand, pick, num_partitions)


def _gram_rows(id_col: str, text_col: str, n: int, keep_parity: int,
               hash_grams: bool):
    """Batch fn: per-doc DISTINCT word n-grams for rows whose
    ``id % 2 == keep_parity``; a doc's grams are complete within its
    generating task, so the local dedup is globally exact per doc."""

    def fn(batch: pa.Table) -> pa.Table:
        limit_worker_threads()
        import pandas as pd

        ids = np.asarray(batch[id_col], dtype=np.int64)
        sel = np.nonzero(ids % 2 == keep_parity)[0]
        batch = batch.take(pa.array(sel, pa.int64()))
        vals, doc_of = _tokens_with_doc_index(batch, text_col)
        starts = _window_starts(doc_of, n)
        if len(starts) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "g": pa.array(
                                 [], pa.uint64() if hash_grams
                                 else pa.string())})
        grams = _join_windows(vals, starts, n)
        ids_kept = np.asarray(batch[id_col], dtype=np.int64)
        df = pd.DataFrame({id_col: ids_kept[doc_of[starts]],
                           "g": grams.to_pandas()})
        df = df.drop_duplicates()
        gcol = pa.array(df["g"].to_numpy(), pa.string())
        if hash_grams:
            # first 8 bytes of md5(gram), big-endian uint64 — the SQL
            # mirror: CAST(('0x' || substr(md5(g), 1, 16)) AS UINT64).
            # 64-bit fingerprints collide with probability ~G²/2⁶⁵;
            # acceptable for contamination screening at corpus scale,
            # NOT for the exact gate (gate queries keep strings).
            import hashlib

            gcol = pa.array(
                np.fromiter(
                    (int.from_bytes(
                        hashlib.md5(s.encode()).digest()[:8], "big")
                     for s in df["g"]),
                    dtype=np.uint64, count=len(df)),
                pa.uint64())
        return pa.table({
            id_col: pa.array(df[id_col].to_numpy(), pa.int64()),
            "g": gcol})

    return fn


def ngram_contamination(ds, *, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 5,
                        num_partitions: int | None = None,
                        hash_grams: bool = False,
                        count_grams: bool = True):
    """Test-split docs sharing ≥1 word ``n``-gram with the train split.

    Split rule: even ``id`` → train, odd ``id`` → test (a deterministic
    pure function of the key, so the split is reproducible anywhere).
    Returns a Dataset ``(id_col, n_contaminated)`` — one row per
    CONTAMINATED test doc with its count of distinct train-shared
    grams. Clean test docs are absent (filter semantics: downstream
    drops these ids from the eval set).

    One tokenize pass per side over a column-pruned read; the only
    all-to-all is the bucketed semi join on the gram key (train side
    ships keys only, per-batch-deduplicated inside ``hash_join``).
    ``hash_grams=True`` swaps gram strings for md5-derived uint64
    fingerprints in the exchange — the 100-TB configuration.
    ``count_grams=False`` skips the final count exchange and returns
    just the flagged ``id_col`` rows (ids may repeat across gram
    buckets) — for consumers that only anti-join the id set away.

    The text column is READ twice (once per split side) by design:
    the parity filter runs BEFORE tokenization, so tokenize work is
    not doubled — only the column-pruned Parquet read is, and
    re-reading a pruned projection is cheaper at every scale than
    materializing a corpus-sized gram table between passes (the
    multi-consumer staging rule applies to dimension-sized shares,
    not fact-sized ones)."""
    from ray.data.aggregate import Count

    from kafka_connect_mongo_ray.stages.join import hash_join

    test = ds.map_batches(
        _gram_rows(id_col, text_col, n, 1, hash_grams),
        batch_format="pyarrow")
    train = ds.map_batches(
        _gram_rows(id_col, text_col, n, 0, hash_grams),
        batch_format="pyarrow").select_columns(["g"])

    kwargs = {"num_buckets": num_partitions} if num_partitions else {}
    hits = hash_join(test, train, on=["g"], how="semi", **kwargs)
    if not count_grams:
        # id set only (duplicate ids across gram buckets remain; the
        # consumer's join/dedup collapses them — cheaper than a global
        # count exchange when the count isn't wanted)
        return hits.select_columns([id_col])
    agg_kwargs = {"num_partitions": num_partitions} if num_partitions else {}
    return (hits.groupby(id_col, **agg_kwargs)
            .aggregate(Count(alias_name="n_contaminated")))
