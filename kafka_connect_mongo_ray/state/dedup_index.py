"""Incremental exact dedup against a persisted fingerprint index.

The CDC × dedup integration a streaming corpus pipeline needs: each
arriving WINDOW of documents is checked against the fingerprints of
every previously ingested window, survivors are emitted downstream,
and their fingerprints are appended to the index — so re-ingested or
cross-window duplicate documents are dropped exactly once, forever.
(Reference analog: none — the reference ships records without content
dedup; this extends its at-least-once delivery contract — SURVEY.md
§2.7 — from key-idempotence to content-idempotence.)

Shapes, at any scale:
- fingerprint = md5 hex of the text (SQL-mirrorable: DuckDB ``md5()``),
  computed batch-locally.
- the index is fingerprint-hash-BUCKETED Parquet, one directory per
  bucket, each window appending one file per touched bucket — the COW
  snapshot layout (``state/snapshot.py``) without versions: appends
  are the only mutation, so no manifest is needed and a re-run of a
  failed window just re-appends (duplicate fingerprints INSIDE the
  index are harmless — the anti join drops a new doc on any match).
- the one all-to-all per window is BUCKET-ALIGNED: only the WINDOW's
  fingerprints shuffle (by the same fp-prefix rule the index is stored
  under), and each bucket's task reads just its own ``bucket=N`` index
  directory for the membership check — the index itself never moves
  through the object store, no matter how large it grows. Per-task
  state is one index bucket's fingerprints; ``num_buckets`` is the
  knob that keeps it worker-sized (the snapshot-bucket contract).
- in-window duplicates collapse via grouped argmin on doc id (first
  occurrence wins — the deterministic tie-break a replayable pipeline
  needs).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from kafka_connect_mongo_ray.utils import limit_worker_threads

__all__ = ["fingerprint_batch", "screen_window", "append_fingerprints",
           "incremental_exact_dedup", "screen_window_minhash",
           "append_band_rows", "incremental_minhash_dedup"]


def fingerprint_batch(batch: pa.Table, *, text_col: str = "text",
                      out_col: str = "fp") -> pa.Table:
    """md5-hex fingerprint column; null text fingerprints as the empty
    string's md5, matching SQL ``md5(coalesce(text, ''))``. Delegates
    to the batch-dedup family's helper so the index and the batch
    queries can never diverge on fingerprinting."""
    limit_worker_threads()
    from kafka_connect_mongo_ray.functions.text import md5_fingerprint_batch

    return md5_fingerprint_batch(batch, text_col=text_col,
                                 out_col=out_col)


def _bucket_of(fp_array, num_buckets: int) -> np.ndarray:
    """Index bucket = first 8 hex chars of the (uniform) md5, mod
    buckets — no extra hashing needed."""
    return np.array([int(f[:8], 16) % num_buckets
                     for f in fp_array.to_pylist()], dtype=np.int64)


def screen_window(new_ds, index_dir: str, *,
                  id_col: str = "doc_id",
                  text_col: str = "text",
                  num_buckets: int = 32):
    """Screening half of :func:`incremental_exact_dedup`: the window's
    survivors against the CURRENT index state, WITHOUT appending their
    fingerprints. Admission is a pure function of (window, index
    state), so callers that persist the survivors elsewhere (the
    curated-stream pipeline) can write their output FIRST and call
    :func:`append_fingerprints` after — a crash between the two is
    recovered by re-running the same window: the screen recomputes the
    identical survivor set. Returns a MATERIALIZED Dataset (original
    columns plus ``fp`` and ``bucket``)."""
    from kafka_connect_mongo_ray.functions.stats import group_argmax

    def fp_and_bucket(batch: pa.Table) -> pa.Table:
        batch = fingerprint_batch(batch, text_col=text_col)
        return batch.append_column(
            "bucket", pa.array(_bucket_of(batch["fp"], num_buckets),
                               pa.int64()))

    fp_ds = new_ds.map_batches(fp_and_bucket, batch_format="pyarrow")

    def anti_vs_index_bucket(g: pa.Table) -> pa.Table:
        limit_worker_threads()
        import pandas as pd
        import pyarrow.parquet as pq

        bdir = os.path.join(index_dir,
                            f"bucket={int(g['bucket'][0].as_py())}")
        if os.path.isdir(bdir):
            seen = pa.concat_tables([
                pq.read_table(os.path.join(bdir, f), columns=["fp"])
                for f in sorted(os.listdir(bdir))
                if f.endswith(".parquet")])
            mask = ~pd.Series(g["fp"].to_pandas()).isin(
                seen["fp"].to_pandas())
            g = g.filter(pa.array(mask.to_numpy()))
        return g

    filtered = fp_ds.groupby("bucket").map_groups(
        anti_vs_index_bucket, batch_format="pyarrow")
    # in-window first-occurrence pick: a second exchange of the
    # ALREADY-FILTERED rows (new-uniques-bounded, not window-bounded);
    # group_argmax hashes fp with its own bucketing, so this is a
    # genuine reshuffle — cheap because the anti filter ran first
    survivors = group_argmax(filtered, keys=["fp"],
                             order=[(id_col, "ascending")],
                             num_partitions=num_buckets)
    # materialize BEFORE any index append: appends consume the same
    # lineage, and the survivor set is new-uniques-bounded per window
    return survivors.materialize()


def append_fingerprints(survivors, index_dir: str) -> None:
    """Append a screened window's (fp, bucket) rows to the index — the
    commit half of :func:`incremental_exact_dedup`. Re-appending the
    same window is harmless (duplicate fps inside the index never
    change the anti join's verdict)."""
    (survivors.map_batches(lambda b: b.select(["fp", "bucket"]),
                           batch_format="pyarrow")
     .write_parquet(index_dir, partition_cols=["bucket"]))


def incremental_exact_dedup(new_ds, index_dir: str, *,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            num_buckets: int = 32):
    """Dedup one window of documents against ``index_dir`` and append
    the survivors' fingerprints to it.

    Returns the surviving rows of ``new_ds`` (original columns plus
    ``fp`` and ``bucket``) as a materialized Dataset, AFTER the index
    append commits — callers chain windows by calling again with the
    next window. Survivor = first occurrence (min ``id_col``) of a
    fingerprint never seen in any earlier window."""
    survivors = screen_window(new_ds, index_dir, id_col=id_col,
                              text_col=text_col, num_buckets=num_buckets)
    append_fingerprints(survivors, index_dir)
    return survivors


def screen_window_minhash(new_ds, index_dir: str, *,
                          id_col: str = "doc_id",
                          text_col: str = "text",
                          num_buckets: int = 32,
                          num_hashes: int = 64, num_bands: int = 16,
                          seed: int = 42):
    """Screening half of :func:`incremental_minhash_dedup`: flag the
    window's docs whose band rows hit the persisted index, WITHOUT
    appending anything. Returns ``(admitted, keep_bands)`` — both
    MATERIALIZED, so callers can persist their output first and call
    :func:`append_band_rows` after (the write-before-append crash
    contract the curated stream relies on). Admission is a pure
    function of (window, index state)."""
    from kafka_connect_mongo_ray.functions.dedup import (
        BandExploder,
        MinHasher,
    )
    from kafka_connect_mongo_ray.stages.join import hash_join

    def band_rows(batch: pa.Table) -> pa.Table:
        limit_worker_threads()
        sigs = MinHasher(num_hashes=num_hashes, seed=seed,
                         text_col=text_col, id_col=id_col)(batch)
        bands = BandExploder(num_bands=num_bands, id_col=id_col)(sigs)
        bucket = (np.asarray(bands["band_hash"], dtype=np.uint64)
                  % np.uint64(num_buckets)).astype(np.int64)
        return bands.append_column("bucket", pa.array(bucket, pa.int64()))

    bands = new_ds.map_batches(band_rows, batch_format="pyarrow",
                               batch_size=512)

    def flagged_in_bucket(g: pa.Table) -> pa.Table:
        limit_worker_threads()
        import pandas as pd
        import pyarrow.parquet as pq

        bdir = os.path.join(index_dir,
                            f"bucket={int(g['bucket'][0].as_py())}")
        if not os.path.isdir(bdir):
            return pa.table({id_col: pa.array([], pa.int64())})
        seen = pa.concat_tables([
            pq.read_table(os.path.join(bdir, f),
                          columns=["band_id", "band_hash"])
            for f in sorted(os.listdir(bdir)) if f.endswith(".parquet")])
        gdf = pd.DataFrame({
            "band_id": np.asarray(g["band_id"], dtype=np.int32),
            "band_hash": np.asarray(g["band_hash"], dtype=np.uint64),
            id_col: np.asarray(g[id_col], dtype=np.int64)})
        sdf = pd.DataFrame({
            "band_id": np.asarray(seen["band_id"], dtype=np.int32),
            "band_hash": np.asarray(seen["band_hash"], dtype=np.uint64),
        }).drop_duplicates()
        hit = gdf.merge(sdf, on=["band_id", "band_hash"], how="inner")
        return pa.table({id_col: pa.array(
            hit[id_col].drop_duplicates().to_numpy(np.int64), pa.int64())})

    # band rows are consumed by BOTH the flag pass and the append —
    # window-bounded, so staging them is the multi-consumer rule; the
    # flagged id set likewise feeds two anti joins
    bands = bands.materialize()
    flagged = bands.groupby("bucket").map_groups(
        flagged_in_bucket, batch_format="pyarrow").materialize()
    if flagged.count() > 0:
        admitted = hash_join(new_ds, flagged, on=[id_col], how="anti",
                             num_buckets=num_buckets).materialize()
        keep_bands = hash_join(bands, flagged, on=[id_col], how="anti",
                               num_buckets=num_buckets).materialize()
    else:  # nothing flagged (e.g. the first window): admit everything
        admitted = new_ds.materialize()
        keep_bands = bands
    return admitted, keep_bands


def append_band_rows(bands, index_dir: str) -> None:
    """Append screened band rows to the LSH index — the commit half of
    :func:`incremental_minhash_dedup`. Requires columns (band_id,
    band_hash, bucket); re-appending the same window is harmless
    (duplicate band rows never change the flag verdict)."""
    (bands.map_batches(
        lambda t: t.select(["band_id", "band_hash", "bucket"]),
        batch_format="pyarrow")
     .write_parquet(index_dir, partition_cols=["bucket"]))


def incremental_minhash_dedup(new_ds, index_dir: str, *,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              num_buckets: int = 32,
                              num_hashes: int = 64, num_bands: int = 16,
                              seed: int = 42):
    """Near-dup screening of one window against a persisted LSH band
    index — the MinHash sibling of :func:`incremental_exact_dedup` with
    PROBABLY-SEEN semantics: a window doc sharing ≥1 (band_id,
    band_hash) with any previously admitted doc is dropped, the rest
    are admitted and their band rows appended.

    The probabilistic contract is the standard LSH S-curve: a doc with
    true shingle Jaccard s to an admitted doc is dropped with
    probability 1 − (1 − s^r)^b (r = num_hashes/num_bands rows per
    band, b = num_bands) — near-1 above the curve's threshold; false
    drops require a full 64-bit band-hash collision (~b·|index|/2⁶⁴).
    Use the exact variant when bit-exact semantics are required; this
    one never stores or re-reads TEXT, only band fingerprints, so the
    index is signature-sized at any corpus size.

    Same scale shape as the exact variant: bucket-aligned — only the
    window's band rows shuffle (bucket = band_hash % num_buckets);
    each task reads its own ``bucket=N`` directory; the one extra
    exchange is the keys-only anti join removing flagged ids.
    In-window near-dups are NOT collapsed (both admit): run a batch
    dedup (functions/dedup.py) inside the window first if needed.

    Composition of :func:`screen_window_minhash` +
    :func:`append_band_rows`; callers needing the write-before-append
    crash contract use the halves directly."""
    admitted, keep_bands = screen_window_minhash(
        new_ds, index_dir, id_col=id_col, text_col=text_col,
        num_buckets=num_buckets, num_hashes=num_hashes,
        num_bands=num_bands, seed=seed)
    append_band_rows(keep_bands, index_dir)
    return admitted
