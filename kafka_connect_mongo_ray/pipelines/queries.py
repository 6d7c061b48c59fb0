"""Driver-contract queries: one entry per operator family (SURVEY.md §2)
plus the training-data operators, each with a DuckDB oracle where the
semantics are SQL-expressible.

Conventions:
- every callable takes ``sf_dir`` and returns a Dataset / pandas /
  Arrow result;
- aggregate / computed columns are named IDENTICALLY in the Ray code
  and the oracle SQL (the driver sorts columns by name and hashes
  values);
- float results are only returned when both engines compute them from
  the same exact integers (bit-stable) or after defensive rounding;
  similarity queries return ids/ranks only (DuckDB's
  list_cosine_similarity runs in float32, ours in float64).

The CDC queries derive a deterministic change-event stream from the
``documents`` table by pure arithmetic on ``doc_id`` so the oracle can
compute the expected FINAL state analytically while the Ray side
actually replays every intermediate event through the full engine
(normalize → bucket shuffle → LWW merge) — the reference's
final-state-equality test strategy (``MongoSinkTaskTest.kt:92-117``)
at query scale.

Event-derivation rule (mirrored in SQL):
- versions per doc: ``n = 1 + doc_id % 5`` → events v=0..n-1
  (op 'i' for v=0 else 'u'), ``ts = 1000+v``,
  ``content = text || ':v' || v``;
- docs with ``doc_id % 7 == 0`` get a trailing tombstone at
  ``ts = 1000+n``;
- key = (repo=source, path=str(doc_id)), partition_id = doc_id % 8.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from kafka_connect_mongo_ray.schema import CHANGE_EVENT_SCHEMA

NUM_PARTITIONS = 8
ANN_NUM_QUERIES = 3
ANN_K = 5
NEAR_DUP_COSINE = 0.4


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# CDC event derivation (documents → deterministic change stream)


def _doc_events_batch(batch: pa.Table) -> pa.Table:
    """Vectorized 1→N expansion of docs into their change events."""
    doc_id = np.asarray(batch["doc_id"], dtype=np.int64)
    text = np.asarray(batch["text"]).astype(object)
    lang = np.asarray(batch["lang"]).astype(object)
    source = np.asarray(batch["source"]).astype(object)

    n_versions = 1 + (doc_id % 5)
    offsets = np.concatenate([[0], np.cumsum(n_versions)])
    total = int(offsets[-1])
    row = np.repeat(np.arange(len(doc_id)), n_versions)
    v = np.arange(total, dtype=np.int64) - offsets[row]

    content = pd.Series(text[row]) + ":v" + pd.Series(v).astype(str)
    op = np.where(v == 0, "i", "u").astype(object)
    ts = 1000 + v
    ids = doc_id[row]

    # tombstones for doc_id % 7 == 0, after the last version
    del_mask = (doc_id % 7) == 0
    d_ids = doc_id[del_mask]
    d_row = np.flatnonzero(del_mask)
    d_ts = 1000 + n_versions[del_mask]

    all_ids = np.concatenate([ids, d_ids])
    all_row = np.concatenate([row, d_row])
    all_ts = np.concatenate([ts, d_ts])
    all_op = np.concatenate([op, np.full(len(d_ids), "d", dtype=object)])
    all_content = np.concatenate([content.to_numpy(dtype=object),
                                  np.full(len(d_ids), None, dtype=object)])

    return pa.table(
        {
            "ts": pa.array(all_ts, pa.int64()),
            # inc = doc_id: (ts, inc) must be a UNIQUE log position per
            # partition (the BsonTimestamp contract, MongoSourceOffset
            # .kt:31-33) or checkpoint-token resume filters events that
            # merely share a timestamp with an applied one
            "inc": pa.array((all_ids % (1 << 31)).astype(np.int32)),
            "op": pa.array(all_op, pa.string()),
            "repo": pa.array(source[all_row], pa.string()),
            "path": pa.array(all_ids.astype(str), pa.string()),
            "commit": pa.array(np.full(len(all_ids), "", dtype=object), pa.string()),
            "lang": pa.array(lang[all_row], pa.string()),
            "content": pa.array(all_content, pa.large_string()),
            "partition_id": pa.array((all_ids % NUM_PARTITIONS).astype(np.int32)),
        },
        schema=CHANGE_EVENT_SCHEMA,
    )


def doc_change_events(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    return ds.map_batches(_doc_events_batch, batch_format="pyarrow")


def _user_events_batch(batch: pa.Table) -> pa.Table:
    """events table → change-event shape: key=user_id, full-image
    upserts ordered by (epoch_us(ts), event_id)."""
    user = np.asarray(batch["user_id"], dtype=np.int64)
    ts_us = np.asarray(pc.cast(batch["ts"], pa.int64()))
    event_id = np.asarray(batch["event_id"], dtype=np.int64)
    etype = np.asarray(batch["event_type"]).astype(object)
    n = len(user)
    return pa.table(
        {
            "ts": pa.array(ts_us, pa.int64()),
            "inc": pa.array((event_id % (1 << 31)).astype(np.int32)),
            "op": pa.array(np.full(n, "u", dtype=object), pa.string()),
            "repo": pa.array(np.full(n, "users", dtype=object), pa.string()),
            "path": pa.array(user.astype(str), pa.string()),
            "commit": pa.array(np.full(n, "", dtype=object), pa.string()),
            "lang": pa.array(np.full(n, "", dtype=object), pa.string()),
            "content": pa.array(etype, pa.large_string()),
            "partition_id": pa.array((user % NUM_PARTITIONS).astype(np.int32)),
        },
        schema=CHANGE_EVENT_SCHEMA,
    )


def user_change_events(sf_dir: str):
    return _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]).map_batches(
        _user_events_batch, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# CDC queries


def q_cdc_final_state(sf_dir: str):
    from kafka_connect_mongo_ray.pipelines.cdc import replay_collect

    out = replay_collect(doc_change_events(sf_dir), num_buckets=16)
    return out.select_columns(["repo", "path", "lang", "content"])


def q_cdc_event_counts(sf_dir: str):
    ds = doc_change_events(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        ops, counts = np.unique(np.asarray(batch["op"]).astype(object), return_counts=True)
        return pa.table({"op": pa.array(ops, pa.string()),
                         "n": pa.array(counts, pa.int64())})

    from ray.data.aggregate import Sum

    return ds.map_batches(partial, batch_format="pyarrow").groupby("op").aggregate(
        Sum("n", alias_name="n")
    )


def q_cdc_tombstone_keys(sf_dir: str):
    from kafka_connect_mongo_ray.pipelines.cdc import replay_collect

    state = replay_collect(doc_change_events(sf_dir), num_buckets=16, live_only=False)
    dead = state.map_batches(
        lambda t: t.filter(pc.and_(pc.equal(t["op_rank"], pa.scalar(2, pa.int8())),
                                   pc.is_null(t["content"]))),
        batch_format="pyarrow",
    )
    return dead.select_columns(["repo", "path"])


def q_cdc_lww_user_state(sf_dir: str):
    from kafka_connect_mongo_ray.pipelines.cdc import replay_collect

    out = replay_collect(user_change_events(sf_dir), num_buckets=16)

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(t["path"], pa.int64()),
                "last_event_type": pc.cast(t["content"], pa.string()),
            }
        )

    return out.map_batches(shape, batch_format="pyarrow")


def q_cdc_resume_tokens(sf_dir: str):
    """T3/ST5: per-partition resume tokens from the in-band token rows
    of the normalize stage — ``MongoSourceOffset`` string format."""
    from kafka_connect_mongo_ray.pipelines.cdc import normalize_prereduce
    from kafka_connect_mongo_ray.stages.apply import TOKEN_OP_RANK

    ds = user_change_events(sf_dir).map_batches(
        normalize_prereduce,
        fn_kwargs={"num_buckets": 16, "tokens": None},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    toks = ds.map_batches(
        lambda t: t.filter(pc.equal(t["op_rank"], pa.scalar(TOKEN_OP_RANK, pa.int8()))),
        batch_format="pyarrow",
    ).select_columns(["path", "ts", "inc"]).to_pandas()
    toks = toks.sort_values(["path", "ts", "inc"]).groupby("path", as_index=False).last()
    toks["partition_id"] = toks["path"].astype(np.int64)
    toks["token"] = (
        toks["ts"].astype(str) + "," + toks["inc"].astype(str)
        + ",partition-" + toks["path"] + ",1"
    )
    return toks[["partition_id", "ts", "inc", "token"]]


def q_cdc_backfill_union_tail(sf_dir: str):
    """S2 backfill (synthetic op='i' at ts=0) unioned with a tail
    stream; two-phase semantics of ExportReader + OplogReader."""
    from kafka_connect_mongo_ray.pipelines.cdc import replay_collect

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])

    def backfill(batch: pa.Table) -> pa.Table:
        doc_id = np.asarray(batch["doc_id"], dtype=np.int64)
        n = len(doc_id)
        return pa.table(
            {
                "ts": pa.array(np.zeros(n, dtype=np.int64)),
                "inc": pa.array(np.zeros(n, dtype=np.int32)),
                "op": pa.array(np.full(n, "i", dtype=object), pa.string()),
                "repo": pc.cast(batch["source"], pa.string()),
                "path": pa.array(doc_id.astype(str), pa.string()),
                "commit": pa.array(np.full(n, "", dtype=object), pa.string()),
                "lang": pc.cast(batch["lang"], pa.string()),
                "content": pc.cast(batch["text"], pa.large_string()),
                "partition_id": pa.array((doc_id % NUM_PARTITIONS).astype(np.int32)),
            },
            schema=CHANGE_EVENT_SCHEMA,
        )

    def tail(batch: pa.Table) -> pa.Table:
        doc_id = np.asarray(batch["doc_id"], dtype=np.int64)
        text = np.asarray(batch["text"]).astype(object)
        lang = np.asarray(batch["lang"]).astype(object)
        source = np.asarray(batch["source"]).astype(object)
        upd = (doc_id % 3) != 0
        dele = (doc_id % 7) == 0
        rows = []
        u_ids = doc_id[upd]
        parts = {
            "ts": np.concatenate([np.ones(upd.sum(), dtype=np.int64),
                                  np.full(dele.sum(), 2, dtype=np.int64)]),
            "op": np.concatenate([np.full(upd.sum(), "u", dtype=object),
                                  np.full(dele.sum(), "d", dtype=object)]),
            "ids": np.concatenate([u_ids, doc_id[dele]]),
            "lang": np.concatenate([lang[upd], lang[dele]]),
            "source": np.concatenate([source[upd], source[dele]]),
            "content": np.concatenate(
                [(pd.Series(text[upd]) + ":u").to_numpy(dtype=object),
                 np.full(dele.sum(), None, dtype=object)]
            ),
        }
        n = len(parts["ids"])
        return pa.table(
            {
                "ts": pa.array(parts["ts"], pa.int64()),
                "inc": pa.array(np.zeros(n, dtype=np.int32)),
                "op": pa.array(parts["op"], pa.string()),
                "repo": pa.array(parts["source"], pa.string()),
                "path": pa.array(parts["ids"].astype(str), pa.string()),
                "commit": pa.array(np.full(n, "", dtype=object), pa.string()),
                "lang": pa.array(parts["lang"], pa.string()),
                "content": pa.array(parts["content"], pa.large_string()),
                "partition_id": pa.array((parts["ids"] % NUM_PARTITIONS).astype(np.int32)),
            },
            schema=CHANGE_EVENT_SCHEMA,
        )

    events = docs.map_batches(backfill, batch_format="pyarrow").union(
        docs.map_batches(tail, batch_format="pyarrow")
    )
    out = replay_collect(events, num_buckets=16)
    return out.select_columns(["repo", "path", "content"])


def q_cdc_wal_tail(sf_dir: str):
    """The WAL tailer end-to-end: write the documents-derived event
    stream to an on-disk parquet log (3 monotone segments), drain it
    with tail_wal (file-offset resume + committed replays), read the
    final snapshot. Same analytic oracle as cdc_final_state."""
    import hashlib
    import shutil

    import pyarrow.parquet as pq

    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.cdc import final_state_dataset
    from kafka_connect_mongo_ray.sources.wal import tail_wal

    root = f"/tmp/kcm_walq_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    shutil.rmtree(root, ignore_errors=True)
    log = f"{root}/wal"
    import os

    os.makedirs(log, exist_ok=True)
    # segments must be LOG PREFIXES per partition: sorting by the full
    # (ts, inc) position before slicing guarantees any prefix is
    # downward-closed per partition, so resume tokens never skip an
    # unapplied event (the WAL ordering contract, sources/wal.py)
    ev = pa.concat_tables(
        doc_change_events(sf_dir).iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by([("ts", "ascending"), ("inc", "ascending")])
    n = ev.num_rows
    cuts = [0, n // 3, 2 * (n // 3), n]
    for i in range(3):
        pq.write_table(ev.slice(cuts[i], cuts[i + 1] - cuts[i]),
                       f"{log}/{i:012d}-seg.parquet")
    cfg = EngineConfig(snapshot_dir=f"{root}/s", checkpoint_dir=f"{root}/c",
                       num_buckets=16)
    tail_wal(log, cfg, max_files_per_window=2)  # two committed windows
    return final_state_dataset(cfg).select_columns(["repo", "path", "lang", "content"])


def q_cdc_update_enrichment(sf_dir: str):
    """S3 point-lookup enrichment: image-less 'u' events get the full
    row image substituted from the broadcast base table; updates whose
    key is missing are dropped (OplogReader.kt:99-125 semantics)."""
    import pyarrow.parquet as pq

    from kafka_connect_mongo_ray.stages.enrich import enrich_updates

    base_tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text", "lang", "source"])
    base = pa.table(
        {
            "repo": pc.cast(base_tbl["source"], pa.string()),
            "path": pa.array(np.asarray(base_tbl["doc_id"], dtype=np.int64).astype(str)),
            "commit": pa.array([""] * base_tbl.num_rows, pa.string()),
            "lang": pc.cast(base_tbl["lang"], pa.string()),
            "content": pc.cast(base_tbl["text"], pa.large_string()),
        }
    )

    def imageless_updates(batch: pa.Table) -> pa.Table:
        doc_id = np.asarray(batch["doc_id"], dtype=np.int64)
        source = np.asarray(batch["source"]).astype(object)
        # one image-less update per doc + a missing-key update per
        # doc_id % 11 == 0 (must be dropped by the enricher)
        miss = (doc_id % 11) == 0
        ids = np.concatenate([doc_id.astype(str),
                              np.char.add(doc_id[miss].astype(str), "-missing")])
        srcs = np.concatenate([source, source[miss]])
        n = len(ids)
        return pa.table(
            {
                "ts": pa.array(np.ones(n, dtype=np.int64)),
                "inc": pa.array(np.zeros(n, dtype=np.int32)),
                "op": pa.array(np.full(n, "u", dtype=object), pa.string()),
                "repo": pa.array(srcs, pa.string()),
                "path": pa.array(ids.astype(object), pa.string()),
                "commit": pa.array(np.full(n, "", dtype=object), pa.string()),
                "lang": pa.array(np.full(n, "", dtype=object), pa.string()),
                "content": pa.array(np.full(n, None, dtype=object), pa.large_string()),
                "partition_id": pa.array(np.zeros(n, dtype=np.int32)),
            },
            schema=CHANGE_EVENT_SCHEMA,
        )

    ev = _read(sf_dir, "documents", columns=["doc_id", "source"]).map_batches(
        imageless_updates, batch_format="pyarrow"
    )
    enriched = enrich_updates(ev, base)
    return enriched.select_columns(["repo", "path", "content"])


def q_join_orders_customer(sf_dir: str):
    """Bucketed hash join (both sides large): orders ⋈ customer on
    custkey, aggregated per market segment."""
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.stages.join import hash_join

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.rename_columns(["custkey", "o_totalprice"]), batch_format="pyarrow"
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.rename_columns(["custkey", "mktsegment"]), batch_format="pyarrow"
    )
    joined = hash_join(orders, cust, on=["custkey"], num_buckets=16)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("mktsegment", as_index=False).agg(
            n=("o_totalprice", "size"), total=("o_totalprice", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = joined.map_batches(partial, batch_format="pyarrow").groupby("mktsegment").aggregate(
        Sum("n", alias_name="n"), Sum("total", alias_name="total")
    )
    return agg.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("total"), "total",
                               pc.round(t["total"], 3)),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Schema analysis (T5-T11)


def q_analyze_props(sf_dir: str):
    from kafka_connect_mongo_ray.stages.schema_evolve import SchemaAnalyzer

    ds = _read(sf_dir, "events", columns=["event_id", "props"])
    return ds.map_batches(
        SchemaAnalyzer,
        fn_constructor_kwargs={"json_col": "props", "op_col": None,
                               "pkey_cols": ("event_id",), "ts_col": None},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# Text / dedup / similarity


def q_text_stats(sf_dir: str):
    from kafka_connect_mongo_ray.functions.text import quality_score_batch, token_count_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(token_count_batch, batch_format="pyarrow")
    ds = ds.map_batches(quality_score_batch, batch_format="pyarrow")
    return ds.select_columns(
        ["doc_id", "n_tokens", "q_n_chars", "q_mean_tok_len", "q_alpha_ratio"]
    )


def q_text_fingerprint(sf_dir: str):
    from kafka_connect_mongo_ray.functions.text import md5_fingerprint_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        md5_fingerprint_batch, batch_format="pyarrow"
    ).select_columns(["doc_id", "fingerprint"])


def q_dedup_exact(sf_dir: str):
    from kafka_connect_mongo_ray.functions.dedup import exact_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_dedup(ds)


def q_dedup_group_sizes(sf_dir: str):
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.functions.text import md5_fingerprint_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        t = md5_fingerprint_batch(batch)
        fps, counts = np.unique(np.asarray(t["fingerprint"]).astype(object), return_counts=True)
        return pa.table({"fingerprint": pa.array(fps, pa.string()),
                         "n": pa.array(counts, pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow").groupby("fingerprint").aggregate(
        Sum("n", alias_name="n")
    )


def _load_query_vectors(sf_dir: str):
    import pyarrow.parquet as pq

    from kafka_connect_mongo_ray.utils import embedding_matrix

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    mask = pc.less(t["vec_id"], ANN_NUM_QUERIES)
    t = t.filter(mask).sort_by("vec_id")
    return embedding_matrix(t["embedding"]), np.asarray(t["vec_id"])


def q_ann_topk(sf_dir: str):
    from kafka_connect_mongo_ray.functions.similarity import brute_force_topk

    q, ids = _load_query_vectors(sf_dir)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = brute_force_topk(ds, q, ids, k=ANN_K)
    return out[["query_id", "rank", "neighbor_id"]]


def q_dedup_embedding_cosine(sf_dir: str):
    import ray
    import pyarrow.parquet as pq

    from kafka_connect_mongo_ray.functions.dedup import EmbeddingNearDup

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    ids = np.asarray(t["vec_id"])
    mref, iref = ray.put(vecs), ray.put(ids)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = ds.map_batches(
        EmbeddingNearDup,
        fn_constructor_kwargs={"matrix_ref": mref, "ids_ref": iref,
                               "threshold": NEAR_DUP_COSINE},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return out.select_columns(["id_a", "id_b"])


def q_events_per_type(sf_dir: str):
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("event_type", as_index=False).agg(
            n=("value", "size"), total=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("event_type").aggregate(
        Sum("n", alias_name="n"), Sum("total", alias_name="total")
    )
    return agg.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("total"), "total",
                               pc.round(t["total"], 3)),
        batch_format="pyarrow",
    )


def q_events_tumbling_window(sf_dir: str):
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        user = np.asarray(batch["user_id"], dtype=np.int64)
        ts_us = np.asarray(pc.cast(batch["ts"], pa.int64()))
        win = ts_us // 3_600_000_000
        df = pd.DataFrame({"user_id": user, "window_id": win})
        g = df.groupby(["user_id", "window_id"], as_index=False).size()
        g = g.rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["user_id", "window_id"]
    ).aggregate(Sum("n", alias_name="n"))


SESSION_GAP_US = 14_400_000_000  # 4 h


def q_events_distinct_types(sf_dir: str):
    """Distinct values (§2.6 set-ops family): Dataset.unique."""
    ds = _read(sf_dir, "events", columns=["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pd.DataFrame({"event_type": vals})


def q_events_top_values(sf_dir: str):
    """Distributed sort + limit (top-k): the §2.6 ordering family.
    Deterministic total order via the (value desc, event_id asc)
    composite key."""
    ds = _read(sf_dir, "events", columns=["event_id", "value"])
    top = ds.sort(key=["value", "event_id"], descending=[True, False]).limit(10)
    return top.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("value"), "value",
                               pc.round(t["value"], 3)),
        batch_format="pyarrow",
    )


def q_events_session_windows(sf_dir: str):
    """Session windows (gap-based), the classic streaming aggregate Ray
    Data lacks natively: per-user sort within ``map_groups``, gap
    cumulative-sum sessionization (ray_guide streaming-shaped pattern).
    Ordering assumption: all of a key's events reach its group; order
    restored by the in-group sort."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        tsu = pc.cast(pa.Array.from_pandas(g["ts"]), pa.int64()).to_numpy()
        new_session = np.ones(len(tsu), dtype=np.int64)
        new_session[1:] = (np.diff(tsu) > SESSION_GAP_US).astype(np.int64)
        sid = np.cumsum(new_session)
        df = pd.DataFrame({"user_id": g["user_id"].to_numpy(), "tsu": tsu, "sid": sid})
        out = df.groupby("sid").agg(
            user_id=("user_id", "first"), session_start=("tsu", "min"), n=("tsu", "size")
        ).reset_index(drop=True)
        out["n"] = out["n"].astype("int64")
        return out[["user_id", "session_start", "n"]]

    return ds.groupby("user_id").map_groups(sessionize, batch_format="pandas")


# -- rows-only (non-SQL-expressible) ----------------------------------------


def q_docs_langid(sf_dir: str):
    from kafka_connect_mongo_ray.functions.text import LanguageId

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        LanguageId, batch_format="pyarrow", concurrency=(1, 4)
    ).select_columns(["doc_id", "lang_pred"])


def q_dedup_minhash_lsh(sf_dir: str):
    import ray

    from kafka_connect_mongo_ray.functions.dedup import JaccardVerifier, minhash_lsh_candidates

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    cands = minhash_lsh_candidates(ds)
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    tref = ray.put(texts)
    return cands.map_batches(
        JaccardVerifier,
        fn_constructor_kwargs={"texts_ref": tref, "threshold": 0.6},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def q_dedup_simhash(sf_dir: str):
    from kafka_connect_mongo_ray.functions.dedup import SimHasher

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=(1, 4))
    return out.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("simhash"), "simhash",
                               pc.cast(t["simhash"], pa.int64(), safe=False)),
        batch_format="pyarrow",
    )


def q_ann_lsh_topk(sf_dir: str):
    """Scale-path ANN: LSH hyperplane bucketing; each query scans only
    its own bucket (recall < 1 by design — rows-only check)."""
    from kafka_connect_mongo_ray.functions.similarity import lsh_topk

    q, ids = _load_query_vectors(sf_dir)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return lsh_topk(ds, q, ids, k=ANN_K, dim=q.shape[1], num_planes=4, seed=42)


def q_ann_ivf_topk(sf_dir: str):
    """IVF scale path: k-means coarse quantization, nprobe cells per
    query (recall < 1 — rows-only check)."""
    from kafka_connect_mongo_ray.functions.similarity import ivf_topk

    q, ids = _load_query_vectors(sf_dir)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ivf_topk(ds, q, ids, k=ANN_K, num_cells=8, nprobe=2, seed=42)


def q_dedup_embedding_lsh(sf_dir: str):
    """LSH-blocked embedding near-dup (scale path of
    dedup_embedding_cosine; recall < 1 — rows-only check)."""
    from kafka_connect_mongo_ray.functions.dedup import embedding_near_dup_lsh

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_near_dup_lsh(ds, threshold=NEAR_DUP_COSINE, num_planes=3)


def q_events_distinct_users_hll(sf_dir: str):
    """Mergeable-sketch pattern: one HLL per batch, tiny merge —
    approximate distinct count (rows-only: estimate ≈ exact ±~2%)."""
    from kafka_connect_mongo_ray.functions.sketch import approx_distinct

    ds = _read(sf_dir, "events", columns=["user_id"])
    est = approx_distinct(ds, "user_id", p=12)
    return pd.DataFrame({"approx_distinct_users": [round(est, 1)]})


def q_multimodal_decode(sf_dir: str):
    from kafka_connect_mongo_ray.functions.multimodal import DecodeStub

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        return pa.table(
            {
                "media_id": batch["doc_id"],
                "mime": pa.array(["image/fake"] * len(texts), pa.string()),
                "payload": pa.array([t.encode() for t in texts], pa.binary()),
                "meta_json": pa.array(['{"w":1,"h":1}'] * len(texts), pa.string()),
            }
        )

    media = ds.map_batches(to_media, batch_format="pyarrow")
    return media.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"feature_dim": 8},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# registry


def build_queries():
    return {
        "cdc_final_state": q_cdc_final_state,
        "cdc_event_counts": q_cdc_event_counts,
        "cdc_tombstone_keys": q_cdc_tombstone_keys,
        "cdc_lww_user_state": q_cdc_lww_user_state,
        "cdc_resume_tokens": q_cdc_resume_tokens,
        "cdc_backfill_union_tail": q_cdc_backfill_union_tail,
        "cdc_wal_tail": q_cdc_wal_tail,
        "cdc_update_enrichment": q_cdc_update_enrichment,
        "join_orders_customer": q_join_orders_customer,
        "analyze_props": q_analyze_props,
        "text_stats": q_text_stats,
        "text_fingerprint": q_text_fingerprint,
        "dedup_exact": q_dedup_exact,
        "dedup_group_sizes": q_dedup_group_sizes,
        "ann_topk": q_ann_topk,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "events_per_type": q_events_per_type,
        "events_tumbling_window": q_events_tumbling_window,
        "events_session_windows": q_events_session_windows,
        "events_top_values": q_events_top_values,
        "events_distinct_types": q_events_distinct_types,
        # rows-only (non-SQL-expressible)
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "dedup_embedding_lsh": q_dedup_embedding_lsh,
        "events_distinct_users_hll": q_events_distinct_users_hll,
        "docs_langid": q_docs_langid,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "multimodal_decode": q_multimodal_decode,
    }


def build_oracle_sql():
    return {
        "cdc_final_state": f"""
            SELECT source AS repo, CAST(doc_id AS VARCHAR) AS path, lang,
                   text || ':v' || CAST(doc_id % 5 AS VARCHAR) AS content
            FROM documents WHERE doc_id % 7 <> 0
        """,
        "cdc_event_counts": """
            SELECT 'i' AS op, CAST(COUNT(*) AS BIGINT) AS n FROM documents
            UNION ALL
            SELECT 'u' AS op, CAST(COALESCE(SUM(doc_id % 5), 0) AS BIGINT) AS n FROM documents
            UNION ALL
            SELECT 'd' AS op, CAST(COUNT(*) AS BIGINT) AS n FROM documents WHERE doc_id % 7 = 0
        """,
        "cdc_tombstone_keys": """
            SELECT source AS repo, CAST(doc_id AS VARCHAR) AS path
            FROM documents WHERE doc_id % 7 = 0
        """,
        "cdc_lww_user_state": """
            SELECT user_id, event_type AS last_event_type FROM (
                SELECT user_id, event_type,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events) t
            WHERE rn = 1
        """,
        "cdc_resume_tokens": f"""
            SELECT partition_id, ts, inc,
                   CAST(ts AS VARCHAR) || ',' || CAST(inc AS VARCHAR)
                     || ',partition-' || CAST(partition_id AS VARCHAR) || ',1' AS token
            FROM (
                SELECT user_id % {NUM_PARTITIONS} AS partition_id,
                       epoch_us(ts) AS ts,
                       CAST(event_id % 2147483648 AS INTEGER) AS inc,
                       ROW_NUMBER() OVER (PARTITION BY user_id % {NUM_PARTITIONS}
                                          ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
                FROM events) t
            WHERE rn = 1
        """,
        "cdc_backfill_union_tail": """
            SELECT source AS repo, CAST(doc_id AS VARCHAR) AS path,
                   CASE WHEN doc_id % 3 <> 0 THEN text || ':u' ELSE text END AS content
            FROM documents WHERE doc_id % 7 <> 0
        """,
        "cdc_wal_tail": f"""
            SELECT source AS repo, CAST(doc_id AS VARCHAR) AS path, lang,
                   text || ':v' || CAST(doc_id % 5 AS VARCHAR) AS content
            FROM documents WHERE doc_id % 7 <> 0
        """,
        "cdc_update_enrichment": """
            SELECT source AS repo, CAST(doc_id AS VARCHAR) AS path,
                   text AS content
            FROM documents
        """,
        "join_orders_customer": """
            SELECT c_mktsegment AS mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(o_totalprice), 3) AS total
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "analyze_props": """
            SELECT CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k,
                   CAST(NULL AS VARCHAR) AS __op,
                   CAST(event_id AS VARCHAR) AS __pkey,
                   CAST(NULL AS VARCHAR) AS __sql,
                   CAST(NULL AS VARCHAR) AS __ts
            FROM events
        """,
        "text_stats": """
            SELECT doc_id,
                   CAST(array_length(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS q_n_chars,
                   CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
                     / CAST(GREATEST(array_length(string_split(text, ' ')), 1) AS DOUBLE)
                     AS q_mean_tok_len,
                   CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                     / CAST(GREATEST(length(text), 1) AS DOUBLE) AS q_alpha_ratio
            FROM documents
        """,
        "text_fingerprint": """
            SELECT doc_id, md5(text) AS fingerprint FROM documents
        """,
        "dedup_exact": """
            SELECT MIN(doc_id) AS doc_id, md5(text) AS fingerprint
            FROM documents GROUP BY md5(text)
        """,
        "dedup_group_sizes": """
            SELECT md5(text) AS fingerprint, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY md5(text)
        """,
        "ann_topk": f"""
            WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                       WHERE vec_id < {ANN_NUM_QUERIES}),
            s AS (SELECT q.qid, e.vec_id AS nid,
                         list_cosine_similarity(q.qe, e.embedding) AS sim
                  FROM embeddings e, q),
            r AS (SELECT qid, nid,
                         ROW_NUMBER() OVER (PARTITION BY qid
                                            ORDER BY sim DESC, nid) AS rn
                  FROM s)
            SELECT qid AS query_id, rn AS rank, nid AS neighbor_id
            FROM r WHERE rn <= {ANN_K}
        """,
        "dedup_embedding_cosine": f"""
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a, embeddings b
            WHERE b.vec_id > a.vec_id
              AND list_cosine_similarity(a.embedding, b.embedding) >= {NEAR_DUP_COSINE}
        """,
        "events_per_type": """
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(value), 3) AS total
            FROM events GROUP BY event_type
        """,
        "events_tumbling_window": """
            SELECT user_id,
                   CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS window_id,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        """,
        "events_distinct_types": """
            SELECT DISTINCT event_type FROM events
        """,
        "events_top_values": """
            SELECT event_id, ROUND(value, 3) AS value
            FROM events ORDER BY value DESC, event_id ASC LIMIT 10
        """,
        "events_session_windows": f"""
            WITH e AS (SELECT user_id, epoch_us(ts) AS tsu FROM events),
            x AS (SELECT user_id, tsu,
                         CASE WHEN tsu - LAG(tsu) OVER w > {SESSION_GAP_US}
                                OR LAG(tsu) OVER w IS NULL
                              THEN 1 ELSE 0 END AS new_s
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu)),
            y AS (SELECT user_id, tsu,
                         SUM(new_s) OVER (PARTITION BY user_id ORDER BY tsu
                                          ROWS UNBOUNDED PRECEDING) AS sid
                  FROM x)
            SELECT user_id, MIN(tsu) AS session_start,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM y GROUP BY user_id, sid
        """,
    }
