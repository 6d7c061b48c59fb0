"""Sequence packing — the concat-and-chunk layout step of an LLM
pretraining pipeline: documents are concatenated in a deterministic
order and cut into fixed-capacity training sequences; each document is
assigned the sequence and offset where its tokens begin (documents may
span a boundary, exactly like streaming token packing).

Distributed shape: documents hash into ``num_buckets`` independent
streams (deterministic ``doc_id % num_buckets`` — NOT content-dependent,
so replays and SQL oracles see identical layouts), each bucket packs
its own docs ordered by id with one vectorized prefix sum inside
``map_groups``. One shuffle of (id, token_count) pairs; no token data
moves at all — the layout is computed from counts and applied lazily by
whoever materializes the sequences.

Whitespace token counts keep the op SQL-reproducible
(``len(string_split(text, ' '))``); swap in a BPE counter per batch for
production use (same layout algebra).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["pack_sequences"]


def pack_sequences(ds, *, id_col: str = "doc_id", text_col: str = "text",
                   seq_len: int = 512, num_buckets: int = 16):
    """Assign every document a (bucket, seq_id, offset) placement in
    fixed-``seq_len`` packed sequences. Returns a Dataset
    ``(id_col, n_tokens, bucket, seq_id, offset)`` where ``seq_id`` is
    the sequence index WITHIN the bucket holding the document's first
    token and ``offset`` the position inside it."""

    def count_tokens(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch[text_col], " ")
        ids = np.asarray(pc.cast(batch[id_col], pa.int64()).combine_chunks()
                         if isinstance(batch[id_col], pa.ChunkedArray)
                         else pc.cast(batch[id_col], pa.int64()))
        return pa.table({
            id_col: batch[id_col],
            "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
            "bucket": pa.array(ids % num_buckets, pa.int64()),
        })

    def pack_bucket(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[(id_col, "ascending")])
        t = g.take(order)
        n = np.asarray(t["n_tokens"], dtype=np.int64)
        start = np.concatenate(([0], np.cumsum(n)[:-1]))
        return pa.table({
            id_col: t[id_col],
            "n_tokens": t["n_tokens"],
            "bucket": t["bucket"],
            "seq_id": pa.array(start // seq_len, pa.int64()),
            "offset": pa.array(start % seq_len, pa.int64()),
        })

    return (ds.map_batches(count_tokens, batch_format="pyarrow")
            .groupby("bucket", num_partitions=num_buckets)
            .map_groups(pack_bucket, batch_format="pyarrow"))
