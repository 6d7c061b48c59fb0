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

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from kafka_connect_mongo_ray.schema import CHANGE_EVENT_SCHEMA

NUM_PARTITIONS = 8
ANN_NUM_QUERIES = 3
ANN_K = 5
NEAR_DUP_COSINE = 0.4
# ANN approximate paths: measured per-query recall@5 vs brute force is
# ≥0.6 at every sf for the committed knobs (seeded/deterministic);
# the gate asserts it as a machine-checked row
ANN_RECALL_BOUND = 0.6
# embedding LSH near-dup: measured pair recall vs the exact blocked
# sweep is 0.94 (sf0.001) / 0.98 (sf0.01) at planes=3 + 1-bit multiprobe
EMB_LSH_RECALL_BOUND = 0.85
JACCARD_THRESHOLD = 0.6
NGRAM_N = 3  # word n-grams for the exact AllPairs similarity join
NGRAM_JACCARD_THRESHOLD = 0.5
SIMHASH_HAMMING_BOUND = 8  # most true J>=0.6 pairs land <= 8 bits; random pairs >= 9
SIMHASH_AGREEMENT_RATE = 0.9  # per-pair bounds are probabilistic; the RATE is the claim
#   (measured: 25/25 within bound at sf0.01, 246/256 = 0.96 at sf0.1)
HLL_ERROR_BOUND = 0.05  # measured 0.2%-2.9% at p=12 across sfs
QUANTILE_QS = [0.25, 0.5, 0.9, 0.99]
SAMPLE_THRESHOLD_HEX = "33333333"  # md5 prefix < this ≈ 20% of keys
PRICE_BRACKETS = [(i * 10000, (i + 1) * 10000) for i in range(10)]
# "high-value order" cut for the anti join: ~20 / ~200 customers at
# sf0.001 / sf0.01 have NO order above it (non-degenerate both ways)
ANTI_JOIN_PRICE = 400_000.0
BM25_TERMS = ["hash", "stream", "window"]
BM25_K = 10
# corpus rebalancing rates: downsample the majority language, keep all
# of the rarest, drop the rest (md5-prefix thresholds, ~frac*16^8)
STRATA_HEX = {"en": "33333333", "fr": "80000000", "es": "80000000",
              "de": "ffffffff"}
BM25_MULTI = {0: ["hash", "stream", "window"],
              1: ["join", "merge"],
              2: ["customer", "table", "row"]}
# packing layout constants are part of the data contract (the oracle
# reproduces them), so they are fixed — NOT session-CPU-derived
PACK_SEQ_LEN = 512
PACK_BUCKETS = 8

# True k=5 char-shingle Jaccard pairs >= threshold, computed entirely in
# SQL — the independent oracle for the MinHash-LSH + verify pipeline.
SHINGLE_PAIR_SQL = """
WITH s AS (SELECT DISTINCT doc_id, substr(text, CAST(u AS INT), 5) AS sh
           FROM (SELECT doc_id, text,
                        unnest(generate_series(1, greatest(length(text)-4,1))) AS u
                 FROM documents)),
     c AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
     inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
               FROM s a JOIN s b ON a.sh = b.sh AND b.doc_id > a.doc_id
               GROUP BY 1, 2)
SELECT id_a, id_b
FROM inter JOIN c ca ON ca.doc_id = id_a JOIN c cb ON cb.doc_id = id_b
WHERE CAST(inter.i AS DOUBLE) / (ca.n + cb.n - inter.i) >= {thr}
"""

# True word-{n}-gram Jaccard pairs >= threshold in SQL — the
# independent oracle for the exact AllPairs prefix-filter join.
WORD_NGRAM_PAIR_SQL = """
WITH g AS (SELECT DISTINCT doc_id,
                  array_to_string(list_slice(string_split(text, ' '),
                                             u, u + {n} - 1), ' ') AS gram
           FROM (SELECT doc_id, text,
                        unnest(generate_series(
                            1, greatest(array_length(string_split(text, ' '))
                                        - {n} + 1, 1))) AS u
                 FROM documents)),
     c AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
     inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
               FROM g a JOIN g b ON a.gram = b.gram AND b.doc_id > a.doc_id
               GROUP BY 1, 2)
SELECT id_a, id_b
FROM inter JOIN c ca ON ca.doc_id = id_a JOIN c cb ON cb.doc_id = id_b
WHERE CAST(inter.i AS DOUBLE) / (ca.n + cb.n - inter.i) >= {thr}
"""


def _strip_schema_metadata(t: pa.Table) -> pa.Table:
    """Parquet files written by pandas carry a ``b'pandas'`` schema
    metadata blob that makes ``pa.Schema`` UNHASHABLE in this pyarrow
    version — every Ray block concat then misses the hash-dedup early
    exit and falls into the expensive unify path (and logs a warning
    per reduce task). Stripping is metadata-only (zero-copy) and the
    stage fuses into the read."""
    return t.replace_schema_metadata(None)


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns
                           ).map_batches(_strip_schema_metadata,
                                         batch_format="pyarrow",
                                         batch_size=None)


def _table_rows(sf_dir: str, table: str) -> int:
    """Row count from the parquet footer — zero decode (a `count()` on
    the mapped `_read` dataset would execute the whole read+strip)."""
    import pyarrow.parquet as pq

    return pq.read_metadata(f"{sf_dir}/{table}.parquet").num_rows


def _gate_buckets(cap: int = 16) -> int:
    """Join/shuffle width for gate-scale fixtures: track the session's
    CPUs so thousands-of-rows inputs don't pay 32 partitions of fixed
    task cost. Production pipelines size buckets to their data."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(4, min(cap, cpus))


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


def _backfill_events(batch: pa.Table) -> pa.Table:
    """S2 backfill phase: synthetic op='i' at ts=0 per document."""
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


def _tail_events(batch: pa.Table) -> pa.Table:
    """Tail phase: updates (doc_id%3 != 0, ts=1, content text||':u') and
    tombstones (doc_id%7 == 0, ts=2)."""
    doc_id = np.asarray(batch["doc_id"], dtype=np.int64)
    text = np.asarray(batch["text"]).astype(object)
    lang = np.asarray(batch["lang"]).astype(object)
    source = np.asarray(batch["source"]).astype(object)
    upd = (doc_id % 3) != 0
    dele = (doc_id % 7) == 0
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


def q_cdc_backfill_union_tail(sf_dir: str):
    """S2 backfill (synthetic op='i' at ts=0) unioned with a tail
    stream; two-phase semantics of ExportReader + OplogReader."""
    from kafka_connect_mongo_ray.pipelines.cdc import replay_collect

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    events = docs.map_batches(_backfill_events, batch_format="pyarrow").union(
        docs.map_batches(_tail_events, batch_format="pyarrow")
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

    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.cdc import final_state_dataset
    from kafka_connect_mongo_ray.sources.wal import tail_wal

    root = f"/tmp/kcm_walq_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    shutil.rmtree(root, ignore_errors=True)
    log = f"{root}/wal"
    import os

    os.makedirs(log, exist_ok=True)
    # Segments must be LOG PREFIXES per partition (sources/wal.py
    # ordering contract). File names are "{seq}-p{partition}", so
    # lexicographic order runs all seq-0 files before any seq-1 file —
    # per partition the seq sequence IS sorted (ts, inc) order, so any
    # window boundary is prefix-safe. Build: ONE partition-keyed
    # shuffle; each group task sorts ITS partition's events and writes
    # its 3 segment files directly (write-temp-then-rename). No global
    # sort, no driver-side count, no single-task funnel — per-task
    # memory is bounded by one partition's slice of the corpus.
    def write_segments(g: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        pid = g["partition_id"][0].as_py()
        t = g.sort_by([("ts", "ascending"), ("inc", "ascending")])
        n = t.num_rows
        cuts = [0, n // 3, 2 * (n // 3), n]
        for seq in range(3):
            chunk = t.slice(cuts[seq], cuts[seq + 1] - cuts[seq])
            tmp = f"{log}/{seq:012d}-p{pid:04d}.inprogress"
            pq.write_table(chunk, tmp)
            os.replace(tmp, f"{log}/{seq:012d}-p{pid:04d}-seg.parquet")
        return pa.table({"partition_id": pa.array([pid], pa.int32()),
                         "rows": pa.array([n], pa.int64())})

    n_parts = doc_change_events(sf_dir).groupby("partition_id").map_groups(
        write_segments, batch_format="pyarrow").count()
    assert n_parts == NUM_PARTITIONS
    cfg = EngineConfig(snapshot_dir=f"{root}/s", checkpoint_dir=f"{root}/c",
                       num_buckets=16)
    # 3 committed windows of one seq level (= NUM_PARTITIONS files) each
    tail_wal(log, cfg, max_files_per_window=NUM_PARTITIONS)
    return final_state_dataset(cfg).select_columns(["repo", "path", "lang", "content"])


def q_cdc_change_feed(sf_dir: str):
    """The read side of CDC: the change feed BETWEEN two committed
    snapshot versions (what an incremental consumer reads instead of
    rescanning). Two replays commit v1 (backfill) and v2 (tail with
    updates + tombstones); ``changes_between`` diffs them per bucket,
    COW-skipping untouched buckets without reading a byte. The oracle
    derives the same per-key changes analytically."""
    import hashlib
    import shutil

    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.cdc import run_replay
    from kafka_connect_mongo_ray.state.diff import changes_between

    root = f"/tmp/kcm_feedq_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    shutil.rmtree(root, ignore_errors=True)
    cfg = EngineConfig(snapshot_dir=f"{root}/s", checkpoint_dir=f"{root}/c",
                       num_buckets=16)
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    run_replay(docs.map_batches(_backfill_events, batch_format="pyarrow"), cfg)
    docs2 = _read(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    run_replay(docs2.map_batches(_tail_events, batch_format="pyarrow"), cfg)
    feed = changes_between(cfg.snapshot_dir, 1, 2)
    return feed.map_batches(
        lambda t: t.select(["op", "repo", "path", "content", "ts"]),
        batch_format="pyarrow")


def q_cdc_update_enrichment(sf_dir: str):
    """S3 point-lookup enrichment at scale: image-less 'u' events get
    the full row image via a bucketed inner hash join against the base
    DATASET (never materialized on the driver); updates whose key is
    missing are dropped (OplogReader.kt:99-125 semantics). The
    broadcast variant (stages/enrich.py::enrich_updates) remains for
    genuinely small lookup sides."""
    from kafka_connect_mongo_ray.stages.enrich import enrich_updates_join

    def shape_base(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": pc.cast(t["source"], pa.string()),
                "path": pa.array(
                    np.asarray(t["doc_id"], dtype=np.int64).astype(str)),
                "commit": pa.array([""] * t.num_rows, pa.string()),
                "lang": pc.cast(t["lang"], pa.string()),
                "content": pc.cast(t["text"], pa.large_string()),
            }
        )

    base = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang", "source"]).map_batches(
        shape_base, batch_format="pyarrow")

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
    enriched = enrich_updates_join(ev, base, num_buckets=16)
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
        # pure-Arrow batch-local combine (no pandas round trip)
        g = batch.group_by("mktsegment").aggregate(
            [([], "count_all"), ("o_totalprice", "sum")])
        return g.rename_columns(["mktsegment", "n", "total"])

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
    out = _brute_force_baseline(sf_dir)
    return out[["query_id", "rank", "neighbor_id"]]


def q_dedup_embedding_cosine(sf_dir: str):
    """EXACT cosine near-dup pairs via the distributed block-pair sweep
    (one corpus copy in the object store, O(N·dim) memory everywhere,
    no driver materialization, no broadcast matrix)."""
    from kafka_connect_mongo_ray.functions.dedup import embedding_near_dup_exact

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_near_dup_exact(ds, threshold=NEAR_DUP_COSINE,
                                    block_rows=2048)


def q_events_per_type(sf_dir: str):
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        # pure-Arrow batch-local combine (no pandas round trip)
        g = batch.group_by("event_type").aggregate(
            [([], "count_all"), ("value", "sum")])
        return g.rename_columns(["event_type", "n", "total"])

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
    Data lacks natively. Shuffles by a HASH BUCKET of the user (all of
    a user's events reach one bucket) and sessionizes the whole bucket
    in one segment-vectorized pass: a session starts at each user
    boundary or gap > SESSION_GAP_US, and sessions reduce via a sid-run
    groupby — one pandas call per bucket, not per user (per-distinct-
    key map_groups cost scales with user count)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def sessionize_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        tsu = pc.cast(pa.Array.from_pandas(g["ts"]), pa.int64()).to_numpy()
        new_session = np.ones(len(tsu), dtype=np.int64)
        if len(tsu) > 1:
            new_session[1:] = ((uid[1:] != uid[:-1])
                               | (np.diff(tsu) > SESSION_GAP_US)
                               ).astype(np.int64)
        sid = np.cumsum(new_session)
        df = pd.DataFrame({"user_id": uid, "tsu": tsu, "sid": sid})
        out = df.groupby("sid", sort=False).agg(
            user_id=("user_id", "first"), session_start=("tsu", "min"),
            n=("tsu", "size")).reset_index(drop=True)
        out["n"] = out["n"].astype("int64")
        return out[["user_id", "session_start", "n"]]

    from kafka_connect_mongo_ray.utils import key_bucketed

    def drop_gb(g: pd.DataFrame) -> pd.DataFrame:
        return sessionize_bucket(g.drop(columns="__gb"))

    # bucket count captured ONCE at plan-build time (a per-batch
    # _gate_buckets() call could change the modulus mid-stage)
    return key_bucketed(ds, ["user_id"], _gate_buckets()).map_groups(
        drop_gb, batch_format="pandas")


# -- formerly rows-only: now each carries a machine-checked oracle ----------


def q_docs_langid(sf_dir: str):
    """Stopword-profile language id; the oracle re-computes the full
    classifier in SQL (word extraction, per-language stopword counts,
    alphabetical-first argmax, unknown on zero score)."""
    from kafka_connect_mongo_ray.functions.text import LanguageId

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        LanguageId, batch_format="pyarrow", concurrency=(1, 4)
    ).select_columns(["doc_id", "lang_pred"])


# Verified near-dup pairs are needed by THREE gate queries
# (dedup_minhash_lsh, dedup_simhash, corpus_prep). The pipeline is
# deterministic, so its (pair-bounded, tiny) RESULT is memoized per
# sf_dir — one distributed computation per process instead of three.
_NEAR_DUP_PAIR_CACHE: dict[str, pa.Table] = {}


def verified_near_dup_pairs(sf_dir: str) -> pa.Table:
    """Canonical (id_a < id_b) pairs with true shingle Jaccard ≥
    threshold, found via MinHash→band→bucket candidates and verified
    with texts attached through two bucketed hash joins (no corpus
    broadcast anywhere)."""
    t = _NEAR_DUP_PAIR_CACHE.get(sf_dir)
    if t is None:
        from kafka_connect_mongo_ray.functions.dedup import (
            minhash_lsh_candidates,
            verify_pairs_jaccard,
        )

        # STAGE the (tiny) candidate set: one lazy plan chaining the
        # 2 candidate shuffles into the 2 verify joins runs ~2x slower
        # under the streaming executor's per-operator resource
        # reservation than two separately executed halves (measured at
        # sf0.01: 33 s lazy vs 15 s staged) — and the materialized set
        # is pair-bounded, never corpus-bounded
        cands = minhash_lsh_candidates(
            _read(sf_dir, "documents", columns=["doc_id", "text"])).materialize()
        pairs = verify_pairs_jaccard(
            cands, _read(sf_dir, "documents", columns=["doc_id", "text"]),
            threshold=JACCARD_THRESHOLD,
            num_buckets=_gate_buckets())
        batches = list(pairs.iter_batches(batch_size=None, batch_format="pyarrow"))
        t = (pa.concat_tables(batches) if batches else pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}))
        _NEAR_DUP_PAIR_CACHE[sf_dir] = t
    return t


#: components of the verified near-dup graph — cluster-docs-bounded
#: (one row per doc that appears in any pair), shared by
#: dedup_components and dedup_keep_best the way the pair set is
_DEDUP_CC_CACHE: dict[str, pa.Table] = {}


def dedup_component_labels(sf_dir: str) -> pa.Table:
    """(doc_id, component) labels from connected components over the
    verified near-dup pair set — memoized per sf_dir per process (the
    propagation is deterministic, so the bounded result table is
    shareable exactly like the pair memo above)."""
    t = _DEDUP_CC_CACHE.get(sf_dir)
    if t is None:
        import ray.data as rd

        from kafka_connect_mongo_ray.functions.graph import (
            connected_components,
        )

        pairs = verified_near_dup_pairs(sf_dir).select(["id_a", "id_b"])
        labels = connected_components(rd.from_arrow(pairs),
                                      num_buckets=_gate_buckets())
        batches = list(labels.iter_batches(batch_size=None,
                                           batch_format="pyarrow"))
        t = (pa.concat_tables(batches).rename_columns(
                 ["doc_id", "component"])
             if batches else pa.table(
                 {"doc_id": pa.array([], pa.int64()),
                  "component": pa.array([], pa.int64())}))
        _DEDUP_CC_CACHE[sf_dir] = t
    return t


def q_dedup_ngram_jaccard(sf_dir: str):
    """Exact word-n-gram Jaccard similarity join via AllPairs
    DF-ordered prefix filtering (functions/dedup.py::
    ngram_allpairs_pairs) — deterministic and recall-complete, the
    exact counterpart to the probabilistic MinHash path. The oracle
    computes the full word-3-gram ≥ 0.5 pair set in SQL, so the hash
    match checks recall AND precision of the whole prefix-filter +
    verify pipeline."""
    from kafka_connect_mongo_ray.functions.dedup import (
        ngram_allpairs_candidates,
        verify_pairs_word_ngram,
    )

    # staged like verified_near_dup_pairs: the candidate set is
    # pair-bounded, and splitting the 4-groupby candidate plan from the
    # 2-join verify plan avoids the lazy-chain reservation stall
    cands = ngram_allpairs_candidates(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        n=NGRAM_N, threshold=NGRAM_JACCARD_THRESHOLD,
        num_partitions=_gate_buckets(), staged=True).materialize()
    return verify_pairs_word_ngram(
        cands, _read(sf_dir, "documents", columns=["doc_id", "text"]),
        n=NGRAM_N, threshold=NGRAM_JACCARD_THRESHOLD,
        num_buckets=_gate_buckets())


def q_dedup_minhash_lsh(sf_dir: str):
    """MinHash→band→bucket candidates, verified by TRUE shingle Jaccard
    attached via two bucketed hash joins (no corpus broadcast). The
    oracle computes the full ≥0.6 pair set in SQL; the hash match
    checks precision AND recall of the whole pipeline."""
    return verified_near_dup_pairs(sf_dir)


def q_dedup_simhash(sf_dir: str):
    """SimHash agreement check: the verified Jaccard-near-dup pair set
    (SQL-cross-checked exactly) plus a machine-checked AGREEMENT RATE —
    ≥ SIMHASH_AGREEMENT_RATE of true pairs within SIMHASH_HAMMING_BOUND
    bits. A per-PAIR bound would be statistically wrong: SimHash is a
    probabilistic sketch, and at sf0.1 ten of 256 true pairs measure
    9-15 bits (the sf0.01 set passing per-pair was small-sample luck),
    while the rate holds with margin (0.96 ≥ 0.9). The flag is emitted
    as a constant column so the oracle stays row-aligned.

    Texts for the hamming check are fetched by id with a pushed-down
    parquet filter — the read is bounded by the PAIR count, never the
    corpus."""
    import pyarrow.parquet as pq

    from kafka_connect_mongo_ray.functions.dedup import SimHasher, hamming64

    pairs = verified_near_dup_pairs(sf_dir)
    ids = sorted(set(pairs["id_a"].to_pylist()) | set(pairs["id_b"].to_pylist()))
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"],
                         filters=[("doc_id", "in", ids)]) if ids else None
    texts = (dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
             if docs is not None else {})
    hasher = SimHasher()
    ta = [texts[i] for i in pairs["id_a"].to_pylist()]
    tb = [texts[i] for i in pairs["id_b"].to_pylist()]
    ha = hasher.simhash_batch(ta)
    hb = hasher.simhash_batch(tb)
    ham = np.asarray([hamming64(int(x), int(y)) for x, y in zip(ha, hb)],
                     dtype=np.int64) if len(ta) else np.array([], dtype=np.int64)
    rate_ok = (bool((ham <= SIMHASH_HAMMING_BOUND).mean()
                    >= SIMHASH_AGREEMENT_RATE) if len(ham) else True)
    return pa.table({
        "id_a": pairs["id_a"],
        "id_b": pairs["id_b"],
        "agreement_ok": pa.array([rate_ok] * len(pairs)),
    })


# the exact brute-force ANN baseline is needed by ann_topk plus both
# recall-checked approximate variants — memoized per sf_dir (same
# rationale as the near-dup pair cache: deterministic, tiny result)
_BRUTE_FORCE_CACHE: dict[str, pd.DataFrame] = {}


def _brute_force_baseline(sf_dir: str) -> pd.DataFrame:
    out = _BRUTE_FORCE_CACHE.get(sf_dir)
    if out is None:
        from kafka_connect_mongo_ray.functions.similarity import brute_force_topk

        q, ids = _load_query_vectors(sf_dir)
        ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        out = brute_force_topk(ds, q, ids, k=ANN_K)
        _BRUTE_FORCE_CACHE[sf_dir] = out
    return out


def _recall_vs_brute_force(sf_dir: str, approx: pd.DataFrame) -> pd.DataFrame:
    """Per-query recall@k of an approximate ANN result vs the exact
    brute-force top-k (both computed in-engine); returns the checkable
    (query_id, n_results, recall_ok) rows."""
    exact = _brute_force_baseline(sf_dir)
    ex = {int(qid): set(g["neighbor_id"]) for qid, g in exact.groupby("query_id")}
    rows = []
    for qid, g in approx.groupby("query_id"):
        got = set(g["neighbor_id"])
        recall = len(got & ex.get(int(qid), set())) / ANN_K
        rows.append((int(qid), len(got), recall >= ANN_RECALL_BOUND))
    return pd.DataFrame(rows, columns=["query_id", "n_results", "recall_ok"])


def q_ann_lsh_topk(sf_dir: str):
    """Scale-path ANN: LSH hyperplane buckets + 1-bit query multiprobe;
    each query scans ~(1+planes)/2^planes of the corpus. The gate row
    asserts measured recall@k ≥ ANN_RECALL_BOUND vs brute force."""
    from kafka_connect_mongo_ray.functions.similarity import lsh_topk

    q, ids = _load_query_vectors(sf_dir)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    approx = lsh_topk(ds, q, ids, k=ANN_K, dim=q.shape[1], num_planes=3,
                      seed=42, probe_bits=1)
    return _recall_vs_brute_force(sf_dir, approx)


def q_ann_ivf_topk(sf_dir: str):
    """IVF scale path: k-means coarse quantization, nprobe cells per
    query; gate row asserts measured recall@k ≥ ANN_RECALL_BOUND."""
    from kafka_connect_mongo_ray.functions.similarity import ivf_topk

    q, ids = _load_query_vectors(sf_dir)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    approx = ivf_topk(ds, q, ids, k=ANN_K, num_cells=8, nprobe=4, seed=42,
                      total_rows=_table_rows(sf_dir, "embeddings"))
    return _recall_vs_brute_force(sf_dir, approx)


def q_ann_ivf_persisted(sf_dir: str):
    """Disk-backed IVF scale path (state/ann_index.py): the corpus is
    coarse-quantized ONCE into cell-partitioned Parquet, the query
    reads ONLY its nprobe probed cells' directories (the index never
    moves through the object store), and the gate row asserts measured
    recall@k ≥ ANN_RECALL_BOUND vs the exact brute force."""
    import hashlib
    import shutil

    from kafka_connect_mongo_ray.state.ann_index import (
        build_ivf_index,
        ivf_index_topk,
    )

    root = f"/tmp/kcm_annix_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    shutil.rmtree(root, ignore_errors=True)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    build_ivf_index(ds, root, num_cells=8, seed=42,
                    total_rows=_table_rows(sf_dir, "embeddings"))
    q, ids = _load_query_vectors(sf_dir)
    approx = ivf_index_topk(root, q, ids, k=ANN_K, nprobe=4)
    return _recall_vs_brute_force(sf_dir, approx)


def q_ann_ivf_incremental(sf_dir: str):
    """Incremental persisted-index ingest (state/ann_index.py::
    append_ivf_index): BUILD the IVF index on the even vec_ids only,
    APPEND the odd half as a committed generation (assigned to the
    frozen centroids — no rebuild, earlier cells untouched), then
    query with nprobe == num_cells, where IVF degrades to exact brute
    force. The gate row asserts the post-append result is EXACTLY the
    brute-force top-k over the FULL corpus — if the appended
    generation were invisible (or double-visible) the set comparison
    fails. Crash contract pytest-pinned in test_ann_index.py."""
    import hashlib
    import shutil

    from kafka_connect_mongo_ray.state.ann_index import (
        append_ivf_index,
        build_ivf_index,
        ivf_index_topk,
    )

    root = f"/tmp/kcm_annincr_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    shutil.rmtree(root, ignore_errors=True)

    def half(parity: int):
        return _read(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"]).map_batches(
            lambda t, p=parity: t.filter(pc.equal(
                pc.bit_wise_and(pc.cast(t["vec_id"], pa.int64()),
                                pa.scalar(1, pa.int64())),
                pa.scalar(p, pa.int64()))),
            batch_format="pyarrow")

    total = _table_rows(sf_dir, "embeddings")
    build_ivf_index(half(0), root, num_cells=8, seed=42,
                    total_rows=(total + 1) // 2)
    append_ivf_index(half(1), root, total_rows=total // 2)

    q, ids = _load_query_vectors(sf_dir)
    approx = ivf_index_topk(root, q, ids, k=ANN_K, nprobe=8)
    exact = _brute_force_baseline(sf_dir)
    ex = {int(qid): set(g["neighbor_id"])
          for qid, g in exact.groupby("query_id")}
    rows = [(int(qid), len(g), set(g["neighbor_id"]) == ex.get(int(qid)))
            for qid, g in approx.groupby("query_id")]
    return pd.DataFrame(rows, columns=["query_id", "n_results", "exact_ok"])


def q_dedup_embedding_lsh(sf_dir: str):
    """LSH-blocked near-dup (the scale path) measured against the exact
    blocked sweep: one row asserting pair recall ≥ EMB_LSH_RECALL_BOUND
    and precision == 1, plus the exact pair count cross-checked by the
    SQL oracle."""
    from kafka_connect_mongo_ray.functions.dedup import (
        embedding_near_dup_exact,
        embedding_near_dup_lsh,
    )

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    exact = embedding_near_dup_exact(ds, threshold=NEAR_DUP_COSINE,
                                     block_rows=2048)
    exact_set = set(zip(exact["id_a"].to_pylist(), exact["id_b"].to_pylist()))
    ds2 = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    lsh = embedding_near_dup_lsh(ds2, threshold=NEAR_DUP_COSINE, num_planes=3,
                                 probe_bits=1).to_pandas()
    lsh_set = set(map(tuple, lsh[["id_a", "id_b"]].values))
    recall = len(lsh_set & exact_set) / max(len(exact_set), 1)
    return pd.DataFrame({
        "n_exact_pairs": [len(exact_set)],
        "recall_ok": [recall >= EMB_LSH_RECALL_BOUND],
        "precision_ok": [lsh_set <= exact_set],
    })


def q_events_distinct_users_hll(sf_dir: str):
    """Mergeable-sketch distinct count: the HLL estimate is checked
    against the engine's own distributed exact distinct, the exact
    count is cross-checked by the SQL oracle, and the ±5% error claim
    becomes a machine-checked boolean."""
    from ray.data.aggregate import Count

    from kafka_connect_mongo_ray.functions.sketch import approx_distinct

    ds = _read(sf_dir, "events", columns=["user_id"])
    est = approx_distinct(ds, "user_id", p=12)
    exact = _read(sf_dir, "events", columns=["user_id"]).groupby(
        "user_id").aggregate(Count()).count()
    ok = abs(est / max(exact, 1) - 1.0) <= HLL_ERROR_BOUND
    return pd.DataFrame({"exact_distinct": [int(exact)], "within_bound": [ok]})


def q_multimodal_decode(sf_dir: str):
    """REAL image decode: render a deterministic P6 PPM per document
    (dims + solid color derived from doc_id), then parse it back with
    the pure-numpy PPM decoder — header grammar, pixel plane, mean.
    The oracle recomputes every decoded property from doc_id in SQL."""
    from kafka_connect_mongo_ray.functions.multimodal import PpmDecoder, encode_ppm

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        payloads = [encode_ppm(1 + int(i) % 16, 1 + int(i) % 13, int(i) % 256)
                    for i in ids]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "mime": pa.array(["image/x-portable-pixmap"] * len(ids), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    media = ds.map_batches(to_media, batch_format="pyarrow", batch_size=256)
    return media.map_batches(
        PpmDecoder, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )


def q_multimodal_audio(sf_dir: str):
    """REAL audio decode: synthesize a PCM-16 WAV per document (rate,
    length, amplitude derived from doc_id), parse it back by walking
    RIFF chunks. Oracle recomputes every decoded property in SQL."""
    from kafka_connect_mongo_ray.functions.multimodal import (
        WavDecoder,
        encode_wav_pcm16,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        payloads = []
        for i in ids:
            n = 100 + int(i) % 50
            amp = int(i) % 1000
            payloads.append(encode_wav_pcm16(
                np.full(n, amp, dtype=np.int16), 8000))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "mime": pa.array(["audio/wav"] * len(ids), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    media = ds.map_batches(to_media, batch_format="pyarrow", batch_size=256)
    return media.map_batches(
        WavDecoder, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )


def q_multimodal_video(sf_dir: str):
    """REAL video container decode: synthesize a RIFF/AVI clip per
    document (frame count / dims / per-frame solid color derived from
    doc_id), then walk the chunk tree back — header AND raw '00db'
    frame extraction (first/last frame means prove the frames were
    actually read). Oracle recomputes every property from doc_id."""
    from kafka_connect_mongo_ray.functions.multimodal import (
        AviDecoder,
        encode_avi_rgb,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        payloads = []
        for i in ids:
            i = int(i)
            n, w, h = 2 + i % 6, 4 + i % 8, 3 + i % 5
            frames = [np.full((h, w, 3), (i + f) % 256, np.uint8)
                      for f in range(n)]
            payloads.append(encode_avi_rgb(frames, w, h, us_per_frame=33_333))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "mime": pa.array(["video/x-msvideo"] * len(ids), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    media = ds.map_batches(to_media, batch_format="pyarrow", batch_size=128)
    return media.map_batches(
        AviDecoder, batch_format="pyarrow", batch_size=128, concurrency=(1, 4)
    )


def q_multimodal_frames(sf_dir: str):
    """Frame sampling as a flat-map-shaped (1 → N rows) stage: up to 3
    evenly-spaced raw frames extracted per synthesized AVI clip; the
    oracle enumerates the integer-spaced indices and per-frame means
    from doc_id in SQL."""
    from kafka_connect_mongo_ray.functions.multimodal import (
        FrameSampler,
        encode_avi_rgb,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        payloads = []
        for i in ids:
            i = int(i)
            n, w, h = 2 + i % 6, 4 + i % 8, 3 + i % 5
            frames = [np.full((h, w, 3), (i + f) % 256, np.uint8)
                      for f in range(n)]
            payloads.append(encode_avi_rgb(frames, w, h))
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "payload": pa.array(payloads, pa.binary())})

    media = ds.map_batches(to_media, batch_format="pyarrow", batch_size=128)
    return media.map_batches(
        FrameSampler, fn_constructor_kwargs={"max_frames": 3},
        batch_format="pyarrow", batch_size=128, concurrency=(1, 4))


def q_multimodal_resize(sf_dir: str):
    """REAL image resize: render a deterministic horizontal-gradient P6
    PPM per document (pixel(x, y) = (doc_id + x) % 256, dims from
    doc_id), then nearest-neighbor-resize to a fixed 4x3 thumbnail via
    two vectorized fancy-index gathers and re-encode. The oracle
    recomputes the resized mean from the integer nearest-sample
    mapping floor(X*w/4) in SQL. The binary output payload itself is
    pytest-verified (round-trip decode); the gate compares the scalar
    verification columns."""
    from kafka_connect_mongo_ray.functions.multimodal import (
        PpmResizer,
        encode_ppm_pixels,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        payloads = []
        for i in ids:
            i = int(i)
            w, h = 2 + i % 15, 2 + i % 12
            row = ((i + np.arange(w, dtype=np.int64)) % 256).astype(np.uint8)
            pixels = np.broadcast_to(row[None, :, None], (h, w, 3))
            payloads.append(encode_ppm_pixels(np.ascontiguousarray(pixels)))
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "payload": pa.array(payloads, pa.binary())})

    media = ds.map_batches(to_media, batch_format="pyarrow", batch_size=256)
    resized = media.map_batches(
        PpmResizer, fn_constructor_kwargs={"out_w": 4, "out_h": 3},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4))
    return resized.select_columns(
        ["media_id", "out_width", "out_height", "resized_mean",
         "payload_bytes"])


def q_multimodal_audio_features(sf_dir: str):
    """REAL audio feature extraction beyond decode: synthesize an
    alternating-sign PCM-16 clip per document (samples[t] =
    amp * (-1)^t with n, amp from doc_id), then compute RMS energy,
    peak amplitude and zero-crossing count with numpy kernels over the
    decoded sample plane. Every feature is analytically recomputable
    in SQL for this signal family (rms = amp, peak = amp, crossings =
    n-1 when amp > 0)."""
    from kafka_connect_mongo_ray.functions.multimodal import (
        AudioFeatureExtractor,
        encode_wav_pcm16,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        payloads = []
        for i in ids:
            i = int(i)
            n, amp = 100 + i % 50, i % 1000
            signs = np.where(np.arange(n) % 2 == 0, 1, -1)
            payloads.append(encode_wav_pcm16(
                (amp * signs).astype(np.int16), 8000))
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "payload": pa.array(payloads, pa.binary())})

    media = ds.map_batches(to_media, batch_format="pyarrow", batch_size=256)
    return media.map_batches(
        AudioFeatureExtractor, batch_format="pyarrow", batch_size=256,
        concurrency=(1, 4))


def q_supplier_customer_pagerank(sf_dir: str):
    """Distributed PageRank (functions/graph.py::pagerank) over the
    supplied-to graph: distinct (supplier, customer) pairs from
    lineitem⋈orders, doubled to an undirected bipartite graph with
    namespaced node ids (supplier → 2k, customer → 2k+1). Two
    iterations, damping 0.85; the oracle unrolls both iterations in
    SQL CTEs with the literal op order."""
    from kafka_connect_mongo_ray.functions.graph import pagerank
    from kafka_connect_mongo_ray.stages.join import hash_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"]
               ).map_batches(
        lambda t: pa.table({"o_orderkey": t["l_orderkey"],
                            "s": pc.cast(t["l_suppkey"], pa.int64())}),
        batch_format="pyarrow")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    j = hash_join(li, orders, on=["o_orderkey"], num_buckets=_gate_buckets())

    def pair_partial(batch: pa.Table) -> pa.Table:
        g = pa.table({"s": batch["s"],
                      "c": pc.cast(batch["o_custkey"], pa.int64())}
                     ).group_by(["s", "c"]).aggregate([([], "count_all")])
        return g.select(["s", "c"])

    # batch-local dedup, one pair-domain exchange to global-distinct;
    # staged so the fact join + pair groupby don't chain lazily into
    # pagerank's first-iteration join (the NEXT.md #2 rule — the
    # staged set is the bounded distinct pair domain)
    pairs = (j.map_batches(pair_partial, batch_format="pyarrow")
             .groupby(["s", "c"]).count()
             .map_batches(lambda t: t.select(["s", "c"]),
                          batch_format="pyarrow").materialize())

    def doubled(t: pa.Table) -> pa.Table:
        sn = pc.multiply(t["s"], pa.scalar(2, pa.int64()))
        cn = pc.add(pc.multiply(t["c"], pa.scalar(2, pa.int64())),
                    pa.scalar(1, pa.int64()))
        return pa.table({
            "src": pa.concat_arrays([sn.combine_chunks(),
                                     cn.combine_chunks()]),
            "dst": pa.concat_arrays([cn.combine_chunks(),
                                     sn.combine_chunks()]),
        })

    edges = pairs.map_batches(doubled, batch_format="pyarrow")
    return pagerank(edges, iterations=2, damping=0.85,
                    num_buckets=_gate_buckets())


def q_supplier_cosupply_triangles(sf_dir: str):
    """Exact triangle count (functions/graph.py::triangle_count) of
    the supplier CO-SUPPLY graph: suppliers are adjacent when they
    supply the same order (per-order supplier sets are small, so the
    pair expansion is bounded); wedges from one edges⋈edges join close
    against a semi join. Oracle: the same two self-joins in SQL."""
    from kafka_connect_mongo_ray.functions.graph import triangle_count

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def os_partial(batch: pa.Table) -> pa.Table:
        g = pa.table({"o": batch["l_orderkey"],
                      "s": pc.cast(batch["l_suppkey"], pa.int64())}
                     ).group_by(["o", "s"]).aggregate([([], "count_all")])
        return g.select(["o", "s"])

    os_pairs = (li.map_batches(os_partial, batch_format="pyarrow")
                .groupby(["o", "s"]).count()
                .map_batches(lambda t: t.select(["o", "s"]),
                             batch_format="pyarrow").materialize())

    # pair expansion per BUCKET of orders, not per order (the §9
    # per-distinct-key rule — one task per bucket, small per-order
    # loops inside; per-order supplier sets are bounded by lineitems
    # per order, so the expansion is linear-ish)
    def bucket_pairs(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__gb"]).sort_by([("o", "ascending"),
                                              ("s", "ascending")])
        o = np.asarray(t["o"], dtype=np.int64)
        s = np.asarray(t["s"], dtype=np.int64)
        bounds = np.flatnonzero(np.concatenate(([True], o[1:] != o[:-1])))
        bounds = np.append(bounds, len(o))
        srcs, dsts = [], []
        for a, b in zip(bounds[:-1], bounds[1:]):
            seg = s[a:b]
            if len(seg) > 1:
                i, j = np.triu_indices(len(seg), k=1)
                srcs.append(seg[i])
                dsts.append(seg[j])
        if not srcs:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        return pa.table({"src": pa.array(np.concatenate(srcs), pa.int64()),
                         "dst": pa.array(np.concatenate(dsts), pa.int64())})

    from kafka_connect_mongo_ray.utils import key_bucketed

    edges = (key_bucketed(os_pairs, ["o"], _gate_buckets())
             .map_groups(bucket_pairs, batch_format="pyarrow")
             .groupby(["src", "dst"]).count()
             .map_batches(lambda t: t.select(["src", "dst"]),
                          batch_format="pyarrow").materialize())
    n = triangle_count(edges, num_buckets=_gate_buckets())
    return pd.DataFrame({"triangles": [int(n)]})


def q_tpch_pricing_summary(sf_dir: str):
    """TPC-H Q1-style pricing summary over lineitem: partial aggregate
    inside map_batches (combiner), tiny final groupby — the canonical
    pre-aggregation pattern; only (flag, status) partials shuffle."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        # integer-scaled money math: per-row values have ≤4 decimal
        # digits, so scaling + rounding per ROW is exact in both
        # engines and the summed int64s are order-independent — no
        # float-summation / rounding-tie hazards at the hash compare.
        # Pure-Arrow batch-local combine (no pandas round trip).
        qty = np.asarray(batch["l_quantity"], dtype=np.float64)
        price = np.asarray(batch["l_extendedprice"], dtype=np.float64)
        disc = np.asarray(batch["l_discount"], dtype=np.float64)
        t = pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "sum_qty": pa.array(np.rint(qty).astype(np.int64)),
            "base_cents": pa.array(np.rint(price * 100).astype(np.int64)),
            "disc_x10k": pa.array(
                np.rint(price * (1 - disc) * 10_000).astype(np.int64)),
        })
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("sum_qty", "sum"), ("base_cents", "sum"),
             ("disc_x10k", "sum"), ([], "count_all")])
        return g.rename_columns(["l_returnflag", "l_linestatus", "sum_qty",
                                 "sum_base_cents", "sum_disc_x10k",
                                 "count_order"])

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]
    ).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_cents", alias_name="sum_base_cents"),
        Sum("sum_disc_x10k", alias_name="sum_disc_x10k"),
        Sum("count_order", alias_name="count_order"),
    )


def q_join_lineitem_part_supplier(sf_dir: str):
    """Three-way join lineitem ⋈ part ⋈ supplier ⋈ nation via Ray's
    native hash-partitioned Dataset.join, aggregated per (brand,
    nation): revenue and line count. Exercises the unused TPC-H tables
    and the native-join path (bucketed hash_join is the portable
    fallback, benchmarked against it in BASELINE.md)."""
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.stages.join import native_join

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"])
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"]).map_batches(
        lambda t: t.rename_columns(["l_partkey", "p_brand"]), batch_format="pyarrow")
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: t.rename_columns(["l_suppkey", "s_nationkey"]), batch_format="pyarrow")
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).map_batches(
        lambda t: pa.table({"s_nationkey": pc.cast(t["n_nationkey"], pa.int32()),
                            "n_name": t["n_name"]}),
        batch_format="pyarrow")

    from kafka_connect_mongo_ray.stages.join import hash_join

    def conform(cols):
        # rebuild each block with a fixed column order and no schema
        # metadata (zero-copy projection)
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({c: t[c] for c in cols})

        return fn

    # native joins for the two fact-sized hops; the dimension-sized
    # nation hop uses the portable bucketed hash_join. Round-3 ran a
    # single native hop after CHAINED native joins twice hit a
    # HashShuffleAggregator.finalize "No match or multiple matches for
    # key field" in long-lived pytest sessions (never in a fresh
    # process); round 4 could not reproduce it — 30 churned chained
    # executions clean (tools/repro_native_join_chain.py) and 3 full
    # pytest runs stable — so the second hop is native again. If the
    # flake resurfaces, run the repro script and swap this hop back to
    # hash_join.
    j = native_join(li, part, on=["l_partkey"], num_buckets=16).map_batches(
        conform(["l_suppkey", "l_extendedprice", "l_discount", "p_brand"]),
        batch_format="pyarrow")
    j = native_join(j, supp, on=["l_suppkey"], num_buckets=16).map_batches(
        conform(["s_nationkey", "l_extendedprice", "l_discount", "p_brand"]),
        batch_format="pyarrow")
    j = hash_join(j, nation, on=["s_nationkey"], num_buckets=16).map_batches(
        conform(["l_extendedprice", "l_discount", "p_brand", "n_name"]),
        batch_format="pyarrow")

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        # same integer-scaling trick as tpch_pricing_summary: exact,
        # order-independent revenue sums; pure-Arrow combine
        price = np.asarray(batch["l_extendedprice"], dtype=np.float64)
        disc = np.asarray(batch["l_discount"], dtype=np.float64)
        t = pa.table({
            "p_brand": batch["p_brand"],
            "n_name": batch["n_name"],
            "rev_x10k": pa.array(
                np.rint(price * (1 - disc) * 10_000).astype(np.int64)),
        })
        g = t.group_by(["p_brand", "n_name"]).aggregate(
            [([], "count_all"), ("rev_x10k", "sum")])
        return g.rename_columns(["p_brand", "n_name", "n", "revenue_x10k"])

    return j.map_batches(partial, batch_format="pyarrow").groupby(
        ["p_brand", "n_name"]
    ).aggregate(Sum("n", alias_name="n"),
                Sum("revenue_x10k", alias_name="revenue_x10k"))


def q_events_asof_tolerance(sf_dir: str):
    """Tolerance-bounded as-of join (stages/join.py::asof_join
    tolerance=): each click attaches the same user's most recent view
    ONLY when it happened within the last hour — a stale nearest match
    is dropped (null). Oracle: plain ASOF join with the out-of-bound
    match CASE'd to NULL, which is equivalent (any older candidate is
    farther still)."""
    from kafka_connect_mongo_ray.stages.join import asof_join

    def shape(etype, id_out):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["event_type"], etype))
            return pa.table({
                "user_id": t["user_id"],
                "tsu": pc.cast(t["ts"], pa.int64()),
                id_out: t["event_id"],
            })

        return fn

    clicks = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                              "event_type"]).map_batches(
        shape("click", "event_id"), batch_format="pyarrow")
    views = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                             "event_type"]).map_batches(
        shape("view", "view_event_id"), batch_format="pyarrow")
    out = asof_join(clicks, views, by=["user_id"], on="tsu",
                    num_buckets=16, tolerance=ASOF_TOLERANCE_US)
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("view_event_id"), "view_event_id",
            pc.cast(t["view_event_id"], pa.float64())),
        batch_format="pyarrow",
    )


def q_events_asof_join(sf_dir: str):
    """As-of join (time-series lookup Ray Data lacks natively): each
    'click' event attaches the same user's most recent 'view' event at
    or before it — bucket-hash on user, one shuffle, per-group sorted
    merge. Oracle: DuckDB's native ASOF LEFT JOIN."""
    from kafka_connect_mongo_ray.stages.join import asof_join

    def shape(etype, id_out):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["event_type"], etype))
            return pa.table({
                "user_id": t["user_id"],
                "tsu": pc.cast(t["ts"], pa.int64()),
                id_out: t["event_id"],
            })

        return fn

    clicks = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                              "event_type"]).map_batches(
        shape("click", "event_id"), batch_format="pyarrow")
    views = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                             "event_type"]).map_batches(
        shape("view", "view_event_id"), batch_format="pyarrow")
    out = asof_join(clicks, views, by=["user_id"], on="tsu", num_buckets=16)
    # unmatched clicks carry NaN — keep float64 on both sides (ids are
    # far below 2^53, exact) rather than gamble on NaN→int casts
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("view_event_id"), "view_event_id",
            pc.cast(t["view_event_id"], pa.float64())),
        batch_format="pyarrow",
    )


ASOF_TOLERANCE_US = 3_600_000_000  # 1 h
QUALITY_MIN_TOKENS = 40
QUALITY_MIN_CHARS = 100
HOP_US = 3_600_000_000  # hop 1 h, window size 2 h (2 hops per window)


def q_docs_quality_filter(sf_dir: str):
    """Quality-gate filter stage of a training-data pipeline: drop
    documents below token/char thresholds (vectorized Arrow kernels)."""
    from kafka_connect_mongo_ray.functions.text import (
        quality_score_batch,
        token_count_batch,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(token_count_batch, batch_format="pyarrow")
    ds = ds.map_batches(quality_score_batch, batch_format="pyarrow")

    def keep(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(t["n_tokens"], QUALITY_MIN_TOKENS),
            pc.greater_equal(t["q_n_chars"], QUALITY_MIN_CHARS),
        )
        return t.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens"])


def q_corpus_prep(sf_dir: str):
    """Flagship training-data-prep composition, end to end in one gate
    query: exact dedup (min-id per md5 group) → near-dup removal (drop
    the higher id of every verified shingle-Jaccard ≥ 0.6 pair, found
    via MinHash-LSH + join-attached verification) → quality gate →
    surviving (doc_id, n_tokens). The oracle recomputes the whole
    composition in SQL."""
    from kafka_connect_mongo_ray.functions.dedup import exact_dedup
    from kafka_connect_mongo_ray.functions.text import (
        quality_score_batch,
        token_count_batch,
    )

    import ray.data as rd

    from kafka_connect_mongo_ray.stages.join import hash_join

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    survivors = exact_dedup(docs).select_columns(["doc_id"])

    # near-dup removal policy: the HIGHER id of each pair is dropped —
    # deterministic and mirrored in SQL (id_b of canonical pairs). The
    # verified pair set is shared (memoized) with dedup_minhash_lsh /
    # dedup_simhash; its size is pair-bounded. The id plumbing below
    # stays distributed (anti-join via left hash_join + null filter,
    # then join back to the texts): no driver-side corpus-scale state.
    pairs = verified_near_dup_pairs(sf_dir)
    removed_ids = sorted(set(pairs["id_b"].to_pylist()))
    removed = rd.from_arrow(pa.table({
        "doc_id": pa.array(removed_ids, pa.int64()),
        "__removed": pa.array([1] * len(removed_ids), pa.int8()),
    }))
    kept = hash_join(survivors, removed, on=["doc_id"], how="left",
                     num_buckets=8).map_batches(
        lambda t: t.filter(pc.is_null(t["__removed"])).select(["doc_id"]),
        batch_format="pyarrow",
    )
    scored = hash_join(kept, docs, on=["doc_id"], num_buckets=8)

    def score_and_gate(t: pa.Table) -> pa.Table:
        t = token_count_batch(t)
        t = quality_score_batch(t)
        mask = pc.and_(
            pc.greater_equal(t["n_tokens"], QUALITY_MIN_TOKENS),
            pc.greater_equal(t["q_n_chars"], QUALITY_MIN_CHARS),
        )
        return t.filter(mask)

    out = scored.map_batches(score_and_gate, batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_tokens"])


def q_events_hopping_window(sf_dir: str):
    """Hopping windows (size 2 h, hop 1 h — every event lands in two
    overlapping windows): 1→2 row expansion inside map_batches, partial
    count combiner, small final groupby. The overlapping-window variant
    Ray Data lacks natively."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def expand_partial(batch: pa.Table) -> pa.Table:
        ts_us = np.asarray(pc.cast(batch["ts"], pa.int64()))
        etype = np.asarray(batch["event_type"]).astype(object)
        hop_idx = ts_us // HOP_US
        # window start hops: the event's own hop and the previous one
        starts = np.concatenate([hop_idx, hop_idx - 1]) * HOP_US
        types2 = np.concatenate([etype, etype])
        df = pd.DataFrame({"event_type": types2, "window_start": starts})
        g = df.groupby(["event_type", "window_start"], as_index=False).size()
        g = g.rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    return ds.map_batches(expand_partial, batch_format="pyarrow").groupby(
        ["event_type", "window_start"]
    ).aggregate(Sum("n", alias_name="n"))


def q_events_topk_per_group(sf_dir: str):
    """Top-2 events by value per event_type — per-group top-k via
    in-group sort (the grouped ordering family)."""
    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def topk(g: pa.Table) -> pa.Table:
        t = g.sort_by([("value", "descending"), ("event_id", "ascending")])
        t = t.slice(0, 2)
        return pa.table({
            "event_type": t["event_type"],
            "event_id": t["event_id"],
            # DuckDB ROUND is half-away-from-zero; Arrow defaults to
            # half-to-even — pin the mode so .0005 ties agree
            "value": pc.round(t["value"], 3,
                              round_mode="half_towards_infinity"),
        })

    return ds.groupby("event_type").map_groups(topk, batch_format="pyarrow")


def q_lineitem_quantiles(sf_dir: str):
    """Exact discrete quantiles without a global sort: per-batch
    value→count compaction, one value-domain-bounded groupby, a driver
    pick over the tiny count table (functions/quantiles.py). Oracle:
    DuckDB ``quantile_disc`` over the same int64-scaled values."""
    from kafka_connect_mongo_ray.functions.quantiles import exact_quantiles

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])
    return exact_quantiles(ds, "l_extendedprice", QUANTILE_QS, scale=100)


def q_lineitem_quantiles_cont(sf_dir: str):
    """Exact interpolated quantiles — SQL PERCENTILE_CONT
    (functions/quantiles.py::exact_quantiles_cont): same value→count
    compaction as the discrete variant; the straddling order
    statistics interpolate with the formula verified bit-identical to
    DuckDB's quantile_cont."""
    from kafka_connect_mongo_ray.functions.quantiles import (
        exact_quantiles_cont,
    )

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])
    return exact_quantiles_cont(ds, "l_extendedprice", QUANTILE_QS,
                                scale=100)


def q_embedding_group_centroids(sf_dir: str):
    """Per-language embedding centroids (functions/similarity.py::
    group_centroids): vectors joined to their documents' lang via the
    bucketed hash join, then batch-local partial sums collapse the
    fact table to groups × dim rows before the one groupby."""
    from kafka_connect_mongo_ray.functions.similarity import group_centroids
    from kafka_connect_mongo_ray.stages.join import hash_join

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    langs = _read(sf_dir, "documents", columns=["doc_id", "lang"]).map_batches(
        lambda t: t.rename_columns(["vec_id", "lang"]), batch_format="pyarrow")
    joined = hash_join(emb, langs, on=["vec_id"], num_buckets=_gate_buckets())
    return group_centroids(joined, "lang", num_partitions=_gate_buckets())


def q_lineitem_quantiles_by_flag(sf_dir: str):
    """Per-group exact quantiles (functions/quantiles.py::
    grouped_exact_quantiles): the cumulative pick runs inside a
    per-group map_groups over the (group, value, count) compaction —
    no driver materialization at any group count."""
    from kafka_connect_mongo_ray.functions.quantiles import (
        grouped_exact_quantiles,
    )

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    return grouped_exact_quantiles(ds, "l_returnflag", "l_extendedprice",
                                   QUANTILE_QS, scale=100,
                                   num_partitions=_gate_buckets())


def q_lineitem_quantiles_refine(sf_dir: str):
    """The coarse-then-refine grouped quantile (functions/quantiles.py::
    grouped_quantiles_2pass): exchanges a coarse-binned histogram
    (~coarse_bin× smaller than the near-continuous one-pass compaction)
    then re-scans only winning-bin rows — bit-exact quantile_disc, the
    exchange-bound scale path (NEXT.md #3)."""
    from kafka_connect_mongo_ray.functions.quantiles import (
        grouped_quantiles_2pass,
    )

    ds = _read(sf_dir, "lineitem", columns=["l_linestatus", "l_extendedprice"])
    return grouped_quantiles_2pass(ds, "l_linestatus", "l_extendedprice",
                                   QUANTILE_QS, scale=100, coarse_bin=4096,
                                   num_partitions=_gate_buckets())


def q_orders_sample_md5(sf_dir: str):
    """Deterministic ~20% sample: membership = md5(str(key)) hex prefix
    below a threshold — a pure function of the key, so every engine,
    re-run, and partitioning sees the identical sample (the
    reproducible train/eval split a corpus pipeline needs)."""
    from kafka_connect_mongo_ray.functions.quantiles import sample_by_md5

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return sample_by_md5(ds, "o_orderkey", threshold_hex=SAMPLE_THRESHOLD_HEX)


def q_lineitem_price_brackets(sf_dir: str):
    """Range join (stages/join.py::interval_join): price brackets are a
    broadcast interval table resolved per batch with vectorized
    searchsorted — the fact stream never shuffles until the tiny
    per-bracket aggregate."""
    from ray.data.aggregate import Count, Sum

    from kafka_connect_mongo_ray.stages.join import interval_join

    iv = pa.table({
        "bracket": pa.array([f"b{i:02d}" for i in range(len(PRICE_BRACKETS))]),
        "lo": pa.array([float(lo) for lo, _ in PRICE_BRACKETS], pa.float64()),
        "hi": pa.array([float(hi) for _, hi in PRICE_BRACKETS], pa.float64()),
    })
    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice", "l_quantity"])
    joined = interval_join(ds, iv, on="l_extendedprice", how="inner")
    out = joined.groupby("bracket").aggregate(
        Count(alias_name="n"), Sum("l_quantity", alias_name="sum_qty"))
    # l_quantity is integral (1..50) so the float64 sum is exact in any
    # addition order; cast defensively documents the bit-stability claim
    return out.map_batches(
        lambda t: pa.table({"bracket": t["bracket"], "n": t["n"],
                            "sum_qty": pc.cast(t["sum_qty"], pa.float64())}),
        batch_format="pyarrow")


def q_events_user_hll_by_type(sf_dir: str):
    """Per-group mergeable-sketch distinct (functions/sketch.py::
    approx_distinct_by): only O(groups × blocks) fixed-size sketches
    shuffle. The estimate is checked against the engine's own exact
    per-group distinct; the oracle recomputes the exact count and the
    ±5% claim becomes a machine-checked boolean per group."""
    from ray.data.aggregate import Count

    from kafka_connect_mongo_ray.functions.sketch import approx_distinct_by

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    est = approx_distinct_by(ds, "user_id", "event_type", p=12).to_pandas()
    exact = (_read(sf_dir, "events", columns=["event_type", "user_id"])
             .groupby(["event_type", "user_id"]).aggregate(Count())
             .groupby("event_type").aggregate(Count(alias_name="exact_distinct"))
             ).to_pandas()
    m = exact.merge(est, on="event_type")
    ok = (m["approx_distinct"] / m["exact_distinct"].clip(lower=1) - 1.0).abs() \
        <= HLL_ERROR_BOUND
    return pd.DataFrame({"event_type": m["event_type"],
                         "exact_distinct": m["exact_distinct"].astype("int64"),
                         "within_bound": ok})


def _events_ts_us(sf_dir: str, extra_cols: list[str] | None = None,
                  cents: bool = False):
    """events with ts pre-cast to int64 epoch-µs (+ optional integer
    cents) so every downstream ordered operator works on bit-stable
    integers — float accumulation order never enters the result."""
    cols = ["event_id", "user_id", "ts"] + (extra_cols or [])

    def prep(t: pa.Table) -> pa.Table:
        out = {"event_id": t["event_id"], "user_id": t["user_id"],
               "ts_us": pc.cast(t["ts"], pa.int64())}
        if cents:
            # DuckDB ROUND is half-away-from-zero; pin Arrow's mode
            out["cents"] = pc.cast(
                pc.round(pc.multiply(t["value"], 100.0), 0,
                         round_mode="half_towards_infinity"), pa.int64())
        for c in extra_cols or []:
            if c != "value":
                out[c] = t[c]
        return pa.table(out)

    return _read(sf_dir, "events", columns=cols).map_batches(
        prep, batch_format="pyarrow")


def q_events_lag_delta(sf_dir: str):
    """Per-user LAG delta (functions/ranking.py::lag_delta): µs since
    the user's previous event, NULL for the first — one groupby
    shuffle, vectorized in-group diff."""
    from kafka_connect_mongo_ray.functions.ranking import lag_delta

    out = lag_delta(_events_ts_us(sf_dir), key="user_id",
                    order_cols=["ts_us", "event_id"], ts_col="ts_us",
                    out_col="delta_us", num_partitions=_gate_buckets())
    return out.select_columns(["event_id", "user_id", "delta_us"])


def q_events_interpolate(sf_dir: str):
    """Per-user LINEAR gap interpolation (functions/ranking.py::
    interpolate_linear): the purchase-only value series filled between
    neighboring observations on the time axis — pv + (nv-pv)·frac with
    the literal op order mirrored in SQL and half-away-from-zero
    9-dp rounding on both sides; rows outside the observed span stay
    null."""
    from kafka_connect_mongo_ray.functions.ranking import interpolate_linear

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        v = pc.if_else(pc.equal(t["event_type"], pa.scalar("purchase")),
                       t["value"], pa.scalar(None, pa.float64()))
        return pa.table({"event_id": t["event_id"], "user_id": t["user_id"],
                         "tsu": pc.cast(t["ts"], pa.int64()), "v": v})

    out = interpolate_linear(ds.map_batches(prep, batch_format="pyarrow"),
                             key="user_id", order_col="event_id",
                             ts_col="tsu", val_col="v", out_col="interp",
                             num_partitions=_gate_buckets())
    return out.select_columns(["event_id", "user_id", "interp"])


def q_events_fill_forward(sf_dir: str):
    """Per-user LOCF gap imputation (functions/ranking.py::
    fill_forward): the purchase-only value series (null elsewhere)
    carried forward per user in (ts, event_id) order — last_value
    IGNORE NULLS. The filled value is a selection of raw float64, so
    the mirror is bit-exact; rows before a user's first purchase stay
    null."""
    from kafka_connect_mongo_ray.functions.ranking import fill_forward

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        v = pc.if_else(pc.equal(t["event_type"], pa.scalar("purchase")),
                       t["value"], pa.scalar(None, pa.float64()))
        return pa.table({"event_id": t["event_id"], "user_id": t["user_id"],
                         "ts_us": pc.cast(t["ts"], pa.int64()),
                         "v": v})

    out = fill_forward(ds.map_batches(prep, batch_format="pyarrow"),
                       key="user_id", order_cols=["ts_us", "event_id"],
                       val_col="v", out_col="filled",
                       num_partitions=_gate_buckets())
    return out.select_columns(["event_id", "user_id", "filled"])


def q_events_running_sum(sf_dir: str):
    """Per-user running sum (functions/ranking.py::running_sum) over
    integer cents — SUM OVER (PARTITION BY user ORDER BY ts) with an
    order-independent int64 accumulator."""
    from kafka_connect_mongo_ray.functions.ranking import running_sum

    out = running_sum(_events_ts_us(sf_dir, extra_cols=["value"], cents=True),
                      key="user_id", order_cols=["ts_us", "event_id"],
                      val_col="cents", out_col="cum_cents",
                      num_partitions=_gate_buckets())
    return out.select_columns(["event_id", "user_id", "cum_cents"])


def q_events_global_rank(sf_dir: str):
    """Distributed global ROW_NUMBER (functions/ranking.py::
    global_row_number): sampled range boundaries → bucket counts →
    per-bucket sort + prefix-sum offset. No global sort funnel; driver
    state is the boundary sample + one count per bucket."""
    from kafka_connect_mongo_ray.functions.ranking import global_row_number

    out = global_row_number(_events_ts_us(sf_dir),
                            order_cols=["ts_us", "event_id"], rank_col="rn",
                            num_buckets=_gate_buckets())
    return out.select_columns(["event_id", "rn"])


def q_join_anti_customers(sf_dir: str):
    """Anti join (stages/join.py::hash_join how='anti'): customers with
    no high-value order (filter pushed into the pruned read). The right
    side ships key columns only, deduplicated per batch — the exchange
    moves keys, never payloads."""
    import pyarrow.dataset as pads

    from kafka_connect_mongo_ray.stages.join import hash_join

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_acctbal", "c_mktsegment"])
    import ray.data as rd

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pads.field("o_totalprice") > ANTI_JOIN_PRICE,
    ).map_batches(lambda t: t.rename_columns(["c_custkey"]),
                  batch_format="pyarrow")
    return hash_join(cust, orders, on=["c_custkey"], how="anti",
                     num_buckets=_gate_buckets())


def _bm25_oracle_sql(terms: list[str] | None = None, *, qid: int | None = None,
                     k1: float = 1.2, b: float = 0.75) -> str:
    """Full BM25 recomputed in SQL over the same whitespace tokens.
    Every literal is arranged to replicate the engine's float64
    evaluation order exactly (CAST({k1} AS DOUBLE) + 1 mirrors k1+1.0,
    term scores summed in query-term order). With ``qid`` set, emits a
    constant query_id column (one branch of the batched oracle)."""
    terms = BM25_TERMS if terms is None else terms
    tf_cols = ", ".join(
        f"len(list_filter(ts, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms))
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms)))
    term_exprs = " + ".join(
        f"LN((CAST(s.n AS DOUBLE) - s.df{i} + 0.5) / (s.df{i} + 0.5) + 1)"
        f" * CAST(tf{i} AS DOUBLE) * (CAST({k1} AS DOUBLE) + 1)"
        f" / (tf{i} + {k1} * (1 - {b} + {b} * CAST(dl AS DOUBLE) / s.avgdl))"
        for i in range(len(terms)))
    qid_col = "" if qid is None else f"CAST({qid} AS BIGINT) AS query_id, "
    return f"""
        WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts
                     FROM documents),
        t AS (SELECT doc_id, len(ts) AS dl, {tf_cols} FROM tok),
        s AS (SELECT COUNT(*) AS n,
                     CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
                     {df_cols} FROM t)
        SELECT {qid_col}doc_id, ROUND(score, 6) AS score
        FROM (SELECT doc_id, {term_exprs} AS score FROM t, s
              ORDER BY score DESC, doc_id LIMIT {BM25_K})
    """


def q_docs_stratified_sample(sf_dir: str):
    """Language-balanced deterministic sampling (functions/quantiles.py
    ::stratified_sample_by_md5): per-lang md5-prefix thresholds
    downsample 'en' to ~20%, 'fr'/'es' to 50%, keep all 'de', drop
    'zh'. Membership is a pure function of (doc_id, lang)."""
    from kafka_connect_mongo_ray.functions.quantiles import (
        stratified_sample_by_md5,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return stratified_sample_by_md5(ds, "doc_id", "lang",
                                    thresholds=STRATA_HEX)


def q_events_moving_avg(sf_dir: str):
    """Trailing 5-row mean per user (functions/ranking.py::
    rolling_mean): exact int64 prefix-sum window, single float division
    at the end — bit-stable under any partitioning."""
    from kafka_connect_mongo_ray.functions.ranking import rolling_mean

    out = rolling_mean(_events_ts_us(sf_dir, extra_cols=["value"], cents=True),
                       key="user_id", order_cols=["ts_us", "event_id"],
                       val_col="cents", window=5, out_col="avg_cents",
                       num_partitions=_gate_buckets())
    return out.select_columns(["event_id", "user_id", "avg_cents"]).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("avg_cents"), "avg_cents",
            pc.round(t["avg_cents"], 6, round_mode="half_towards_infinity")),
        batch_format="pyarrow")


def q_join_full_outer(sf_dir: str):
    """Full outer hash join: rich customers vs per-customer big-order
    counts — both sides contribute unmatched rows, exercising the
    null-bearing type-restore path of stages/join.py::merge_bucket."""
    from ray.data.aggregate import Count

    from kafka_connect_mongo_ray.stages.join import hash_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"]
                 ).filter(expr="c_acctbal > 5000")
    big = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]
                ).filter(expr="o_totalprice > 300000")
    counts = (big.groupby("o_custkey").aggregate(Count())
              .map_batches(lambda t: pa.table(
                  {"c_custkey": t["o_custkey"],
                   "n_big": pc.cast(t["count()"], pa.int64())}),
                  batch_format="pyarrow"))
    return hash_join(cust, counts, on=["c_custkey"], how="outer",
                     num_buckets=_gate_buckets())


# ONE tokenize pass serves docs_bm25 AND docs_bm25_multi: the tf table
# is built over the union of their terms and memoized per sf_dir (same
# rationale as the near-dup pair / ANN baseline caches — deterministic,
# narrow result reused across gate queries). Unlike those caches this
# one holds a MaterializedDataset whose blocks live in the CURRENT Ray
# session's object store, so the key includes the session (job id): a
# ray.shutdown()/init cycle invalidates the entry instead of serving
# dead ObjectRefs.
_BM25_TF_CACHE: dict[tuple, tuple] = {}


def _ray_session_key():
    import ray

    try:
        return ray.get_runtime_context().get_job_id()
    except Exception:
        return None


def _prune_stale_tf_entries(max_per_session: int = 2):
    """Drop cache entries from other Ray sessions (their materialized
    blocks are dead ObjectRefs) and bound the CURRENT session to the
    ``max_per_session`` most recent entries — the BM25 tf table and
    the full-vocabulary token table coexist, but a long session that
    walks many sf_dirs must not pin one materialized Dataset per dir
    in the object store forever (dict order is insertion order, so the
    oldest evict first)."""
    cur = _ray_session_key()
    for k in [k for k in _BM25_TF_CACHE if k[-1] != cur]:
        del _BM25_TF_CACHE[k]
    live = [k for k in _BM25_TF_CACHE]
    for k in live[:-max_per_session] if len(live) > max_per_session else []:
        del _BM25_TF_CACHE[k]


def _token_shared_tf(sf_dir: str):
    """The FULL-vocabulary (doc, term, tf) token table shared by
    docs_tfidf_top and docs_unigram_logprob — same session-keyed memo
    discipline as the BM25 tf cache."""
    key = ("token_tf", sf_dir, _ray_session_key())
    cached = _BM25_TF_CACHE.get(key)
    if cached is None:
        from kafka_connect_mongo_ray.functions.retrieval import (
            _token_tf_table,
        )

        _prune_stale_tf_entries()
        cached = _token_tf_table(
            _read(sf_dir, "documents", columns=["doc_id", "text"]),
            "doc_id", "text")
        _BM25_TF_CACHE[key] = cached
    return cached


def _bm25_shared_tf(sf_dir: str):
    key = (sf_dir, _ray_session_key())
    cached = _BM25_TF_CACHE.get(key)
    if cached is None:
        from kafka_connect_mongo_ray.functions.retrieval import build_tf_table

        union_terms = sorted(set(BM25_TERMS)
                             | {t for ts in BM25_MULTI.values() for t in ts})
        tf = build_tf_table(_read(sf_dir, "documents",
                                  columns=["doc_id", "text"]), union_terms)
        _prune_stale_tf_entries()  # stale-session entries have dead refs
        cached = (tf, union_terms)
        _BM25_TF_CACHE[key] = cached
    return cached


def q_docs_bm25(sf_dir: str):
    """BM25 top-k lexical retrieval (functions/retrieval.py::bm25_topk):
    one tokenize pass to a narrow tf table (shared with
    docs_bm25_multi), scalar corpus stats, per-block top-k collapsed by
    the two-level candidate reduce. The oracle recomputes the full
    formula in SQL over exact whitespace tokens."""
    from kafka_connect_mongo_ray.functions.retrieval import bm25_topk

    tf, tf_terms = _bm25_shared_tf(sf_dir)
    return bm25_topk(None, terms=BM25_TERMS, k=BM25_K,
                     tf=tf, tf_terms=tf_terms)


def q_docs_bm25_persisted(sf_dir: str):
    """Disk-backed BM25 (state/text_index.py): the corpus is tokenized
    ONCE into term-bucketed Parquet postings (df free from posting-row
    counts, dl denormalized onto the posting), and the query opens
    ONLY the bucket directories its terms hash to. Same oracle as
    docs_bm25 — the persisted path must reproduce the full-scan scores
    on the shared 6-dp grid (all top-k scores are positive for these
    terms, so the matched-docs-only contract is equivalent)."""
    import hashlib
    import shutil

    from kafka_connect_mongo_ray.state.text_index import (
        bm25_index_topk,
        build_bm25_index,
    )

    root = f"/tmp/kcm_bm25ix_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    shutil.rmtree(root, ignore_errors=True)
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    build_bm25_index(ds, root, num_buckets=16)
    return bm25_index_topk(root, BM25_TERMS, k=BM25_K)


def q_training_set_prep(sf_dir: str):
    """Second flagship composition — the training-set builder:
    language-rebalancing stratified sample → exact dedup (min-id
    survivor per identical text) → semi join back to texts →
    concat-and-chunk sequence packing. Every stage is the distributed
    operator used by its standalone gate query; the oracle chains the
    whole thing in SQL CTEs."""
    from kafka_connect_mongo_ray.functions.dedup import exact_dedup
    from kafka_connect_mongo_ray.functions.packing import pack_sequences
    from kafka_connect_mongo_ray.functions.quantiles import (
        stratified_sample_by_md5,
    )
    from kafka_connect_mongo_ray.stages.join import hash_join

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    sampled = stratified_sample_by_md5(docs, "doc_id", "lang",
                                       thresholds=STRATA_HEX)
    # dedup decisions shuffle only (id, hash); texts come back via a
    # bucketed semi join, never a driver-side collect
    survivors = exact_dedup(sampled, num_partitions=_gate_buckets()
                            ).select_columns(["doc_id"])
    kept = hash_join(
        sampled.select_columns(["doc_id", "text"]), survivors,
        on=["doc_id"], how="semi", num_buckets=_gate_buckets())
    return pack_sequences(kept, seq_len=PACK_SEQ_LEN,
                          num_buckets=PACK_BUCKETS)


def q_events_asof_forward(sf_dir: str):
    """Forward as-of join: each 'click' attaches the same user's NEXT
    'view' at or after it (direction='forward') — the other half of the
    asof contract, oracled against DuckDB ASOF with c.tsu <= v.tsu."""
    from kafka_connect_mongo_ray.stages.join import asof_join

    def shape(etype, id_out):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["event_type"], etype))
            return pa.table({
                "user_id": t["user_id"],
                "tsu": pc.cast(t["ts"], pa.int64()),
                id_out: t["event_id"],
            })

        return fn

    cols = ["event_id", "ts", "user_id", "event_type"]
    clicks = _read(sf_dir, "events", columns=cols).map_batches(
        shape("click", "event_id"), batch_format="pyarrow")
    views = _read(sf_dir, "events", columns=cols).map_batches(
        shape("view", "view_event_id"), batch_format="pyarrow")
    out = asof_join(clicks, views, by=["user_id"], on="tsu",
                    num_buckets=16, direction="forward")
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("view_event_id"), "view_event_id",
            pc.cast(t["view_event_id"], pa.float64())),
        batch_format="pyarrow")


def q_events_unpivot_roundtrip(sf_dir: str):
    """Pivot → unpivot roundtrip (functions/rollup.py::melt): the wide
    per-user count table melts back to long (user, type, n) rows with
    the zero fill dropped — equal to the direct GROUP BY, proving the
    reshaping pair is lossless."""
    from kafka_connect_mongo_ray.functions.rollup import melt, pivot_counts

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    cats = ["click", "error", "purchase", "signup", "view"]
    wide = pivot_counts(ds, key="user_id", pivot_col="event_type",
                        categories=cats, prefix="n_",
                        num_partitions=_gate_buckets())
    return melt(wide, key="user_id", value_cols=[f"n_{c}" for c in cats],
                var_col="event_type", value_col="n",
                var_names={f"n_{c}": c for c in cats}, drop_zero=True)


def q_embedding_kmeans(sf_dir: str):
    """Distributed k-means pass (functions/similarity.py::
    kmeans_cluster_summary): bounded-sample centroids, broadcast
    assignment sweep, scalar tightness reduction. The oracle checks
    (k, n) exactly and the machine-checked `improved` flag (clustering
    at least as tight as the k=1 baseline)."""
    from kafka_connect_mongo_ray.functions.similarity import (
        kmeans_cluster_summary,
    )

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return kmeans_cluster_summary(ds, k=8,
                                  total_rows=_table_rows(sf_dir,
                                                         "embeddings"))


def q_events_pivot_types(sf_dir: str):
    """Wide reshaping (functions/rollup.py::pivot_counts): one row per
    user with one count column per event type, categories discovered
    with a distinct pass. Shuffle volume is keys × categories."""
    from kafka_connect_mongo_ray.functions.rollup import pivot_counts

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    return pivot_counts(ds, key="user_id", pivot_col="event_type",
                        prefix="n_", num_partitions=_gate_buckets())


def q_docs_pack_sequences(sf_dir: str):
    """LLM-style concat-and-chunk sequence packing (functions/
    packing.py::pack_sequences): deterministic per-bucket streams, one
    shuffle of (id, token_count) pairs, prefix-sum placement. The
    oracle reproduces bucket assignment, ordering, and the chunk
    arithmetic with SQL window functions."""
    from kafka_connect_mongo_ray.functions.packing import pack_sequences

    return pack_sequences(_read(sf_dir, "documents",
                                columns=["doc_id", "text"]),
                          seq_len=PACK_SEQ_LEN, num_buckets=PACK_BUCKETS)


def q_docs_bm25_multi(sf_dir: str):
    """Batched BM25 (functions/retrieval.py::bm25_topk_multi): three
    term-bag queries share one corpus pass — union-term tf table
    (shared with docs_bm25 too), one stats reduce, per-block per-query
    top-k, two-level per-query final pick."""
    from kafka_connect_mongo_ray.functions.retrieval import bm25_topk_multi

    tf, tf_terms = _bm25_shared_tf(sf_dir)
    return bm25_topk_multi(None, queries=BM25_MULTI, k=BM25_K,
                           tf=tf, tf_terms=tf_terms)


def q_events_cube(sf_dir: str):
    """GROUP BY CUBE(event_type, day): same one-fact-exchange shape as
    the rollup — the extra (day-only) level is another re-aggregation
    of the dimension-sized finest table."""
    from kafka_connect_mongo_ray.functions.rollup import rollup_aggregate

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64())
        return pa.table({
            "event_type": t["event_type"],
            "day": pc.divide(ts_us, 86_400_000_000),
            "cents": pc.cast(
                pc.round(pc.multiply(t["value"], 100.0), 0,
                         round_mode="half_towards_infinity"), pa.int64()),
        })

    return rollup_aggregate(ds.map_batches(prep, batch_format="pyarrow"),
                            keys=["event_type", "day"], sum_cols=["cents"],
                            num_partitions=_gate_buckets(), mode="cube")


def q_dedup_components(sf_dir: str):
    """Duplicate-cluster labeling: the verified near-dup pair set
    (shared memo) → distributed min-label propagation
    (functions/graph.py::connected_components) → (doc_id, component)
    where component = min doc_id reachable through near-dup edges. The
    oracle recomputes the true pair set AND the transitive closure in
    SQL (recursive CTE), so the hash match checks the whole clustering."""
    return dedup_component_labels(sf_dir)


def q_events_rollup(sf_dir: str):
    """GROUP BY ROLLUP(event_type, day) — functions/rollup.py: one
    fact-sized exchange at the finest level, coarser levels re-aggregate
    the dimension-sized result; integer cents keep every level
    bit-exact. Sentinels ('ALL', -1) stand in for SQL's NULL markers."""
    from kafka_connect_mongo_ray.functions.rollup import rollup_aggregate

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64())
        return pa.table({
            "event_type": t["event_type"],
            "day": pc.divide(ts_us, 86_400_000_000),
            "cents": pc.cast(
                pc.round(pc.multiply(t["value"], 100.0), 0,
                         round_mode="half_towards_infinity"), pa.int64()),
        })

    return rollup_aggregate(ds.map_batches(prep, batch_format="pyarrow"),
                            keys=["event_type", "day"], sum_cols=["cents"],
                            num_partitions=_gate_buckets())


def q_join_semi_parts(sf_dir: str):
    """Semi join (how='semi'): parts that appear in ≥1 lineitem, left
    payload passed through exactly once regardless of match count."""
    from kafka_connect_mongo_ray.stages.join import hash_join

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    li = _read(sf_dir, "lineitem", columns=["l_partkey"]).map_batches(
        lambda t: t.rename_columns(["p_partkey"]), batch_format="pyarrow")
    return hash_join(part, li, on=["p_partkey"], how="semi",
                     num_buckets=_gate_buckets())


def q_join_parts_bloom_semi(sf_dir: str):
    """Bloom-prefiltered semi join (functions/sketch.py::
    bloom_semi_join): parts appearing in a high-quantity lineitem —
    the right side's keys collapse to one broadcast bitmap and the
    left side drops non-matching rows BEFORE the join shuffle; false
    positives are removed by the exact bucketed join, so the result
    equals the plain semi join at any filter size."""
    import pyarrow.compute as _pc

    from kafka_connect_mongo_ray.functions.sketch import bloom_semi_join

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity"]).map_batches(
        lambda t: pa.table(
            {"p_partkey": t.filter(
                _pc.greater_equal(t["l_quantity"], 45.0))["l_partkey"]}),
        batch_format="pyarrow")
    return bloom_semi_join(part, li, on="p_partkey", num_bits=1 << 18,
                           num_buckets=_gate_buckets())


def q_events_grouping_sets(sf_dir: str):
    """GROUP BY GROUPING SETS ((event_type), (day)) — two marginal
    aggregations in one plan without the cross product
    (functions/rollup.py::rollup_aggregate(grouping_sets=...)): the
    finest (type, day) level pays the one fact-sized exchange, both
    marginals re-aggregate its dimension-sized result in a single
    second exchange."""
    from kafka_connect_mongo_ray.functions.rollup import rollup_aggregate

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64())
        return pa.table({
            "event_type": t["event_type"],
            "day": pc.divide(ts_us, 86_400_000_000),
            "cents": pc.cast(
                pc.round(pc.multiply(t["value"], 100.0), 0,
                         round_mode="half_towards_infinity"), pa.int64()),
        })

    return rollup_aggregate(ds.map_batches(prep, batch_format="pyarrow"),
                            keys=["event_type", "day"], sum_cols=["cents"],
                            grouping_sets=[["event_type"], ["day"]],
                            num_partitions=_gate_buckets())


def q_lineitem_corr(sf_dir: str):
    """Pearson correlation from exact integer moment sums
    (functions/stats.py::corr_components): six int64 components are
    bit-exact under any partitioning; the one float op is the final
    closed form, mirrored verbatim in the oracle so both sides run the
    identical IEEE arithmetic on identical integers."""
    from kafka_connect_mongo_ray.functions.stats import corr_components

    return corr_components(
        _read(sf_dir, "lineitem", columns=["l_quantity", "l_discount"]),
        "l_quantity", "l_discount", x_scale=1, y_scale=100)


def q_events_heavy_hitters(sf_dir: str):
    """Exact frequent items (functions/stats.py::frequent_items):
    integer-valued FLOOR(value) buckets occurring in ≥ 1/100 of all
    events — pigeonhole-complete per-batch candidates, then exact
    counts for candidates only; both thresholds are pure integer
    comparisons (q·cnt ≥ p·total) so the SQL mirror is bit-exact."""
    from kafka_connect_mongo_ray.functions.stats import frequent_items

    def floor_value(batch: pa.Table) -> pa.Table:
        import numpy as np

        v = np.floor(np.asarray(batch["value"], dtype=np.float64))
        return pa.table({"v": pa.array(v.astype(np.int64), pa.int64())})

    ds = _read(sf_dir, "events", columns=["value"]).map_batches(
        floor_value, batch_format="pyarrow")
    return frequent_items(ds, "v", min_frac=(1, 100),
                          num_partitions=_gate_buckets())


def q_events_user_dense_rank(sf_dir: str):
    """DENSE_RANK over per-user activity (functions/ranking.py::
    dense_rank): per-user event counts (one groupby), then the
    range-partitioned dense rank on count descending — ties share a
    rank, ranks are gapless. The distinct-count offsets pass moves at
    most the count-domain, never rows."""
    import pyarrow.compute as pc

    from kafka_connect_mongo_ray.functions.ranking import dense_rank
    from ray.data.aggregate import Count

    counts = (_read(sf_dir, "events", columns=["user_id"])
              .groupby("user_id").aggregate(Count(alias_name="cnt")))

    def neg(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "negcnt", pc.negate(pc.cast(batch["cnt"], pa.int64())))

    ranked = dense_rank(counts.map_batches(neg, batch_format="pyarrow"),
                        order_col="negcnt", rank_col="dr",
                        num_buckets=_gate_buckets())
    return ranked.map_batches(
        lambda t: pa.table({"user_id": t["user_id"],
                            "cnt": pc.cast(t["cnt"], pa.int64()),
                            "dr": t["dr"]}),
        batch_format="pyarrow")


def _event_value_buckets(sf_dir: str, etype: str):
    """Distinct-prunable (v,) side for the set-op queries: integer
    FLOOR(value) buckets of one event type."""
    import numpy as np
    import pyarrow.compute as pc

    def shape(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["event_type"], etype))
        v = np.floor(np.asarray(t["value"], dtype=np.float64))
        return pa.table({"v": pa.array(v.astype(np.int64), pa.int64())})

    return _read(sf_dir, "events", columns=["event_type", "value"]
                 ).map_batches(shape, batch_format="pyarrow")


def q_events_intersect_users(sf_dir: str):
    """SQL INTERSECT (functions/setops.py::set_op_distinct): distinct
    FLOOR(value) buckets seen in BOTH 'click' and 'purchase' events —
    per-batch distinct prune on each side, one shuffle of distinct
    keys."""
    from kafka_connect_mongo_ray.functions.setops import set_op_distinct

    return set_op_distinct(_event_value_buckets(sf_dir, "click"),
                           _event_value_buckets(sf_dir, "purchase"),
                           on=["v"], op="intersect",
                           num_buckets=_gate_buckets())


def q_events_except_users(sf_dir: str):
    """SQL EXCEPT (functions/setops.py::set_op_distinct): distinct
    FLOOR(value) buckets seen in 'click' events but never in
    'purchase' events — same one-shuffle distinct-key shape as the
    intersect."""
    from kafka_connect_mongo_ray.functions.setops import set_op_distinct

    return set_op_distinct(_event_value_buckets(sf_dir, "click"),
                           _event_value_buckets(sf_dir, "purchase"),
                           on=["v"], op="except",
                           num_buckets=_gate_buckets())


def q_orders_argmax_order(sf_dir: str):
    """Grouped argmax (functions/stats.py::group_argmax): each
    customer's highest-value order (ties → smallest orderkey) — SQL's
    QUALIFY ROW_NUMBER() = 1. Batch-local partial argmax bounds the
    one shuffle at distinct-keys-per-block rows."""
    from kafka_connect_mongo_ray.functions.stats import group_argmax

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderkey", "o_totalprice"])
    return group_argmax(orders, keys=["o_custkey"],
                        order=[("o_totalprice", "descending"),
                               ("o_orderkey", "ascending")],
                        num_partitions=_gate_buckets())


def q_lineitem_linreg(sf_dir: str):
    """OLS regression of extendedprice (FLOOR to whole dollars — floor
    is unambiguous in IEEE double on both sides, unlike round-half on
    2-decimal prices) on quantity, from exact int64 moment sums
    (functions/stats.py::linreg_components) — slope/intercept/r² are
    closed-form float expressions over bit-exact integers, mirrored
    operand-for-operand in the oracle."""
    import numpy as np

    from kafka_connect_mongo_ray.functions.stats import linreg_components

    def prep(t: pa.Table) -> pa.Table:
        y = np.floor(np.asarray(t["l_extendedprice"], dtype=np.float64))
        return pa.table({"x": t["l_quantity"],
                         "y": pa.array(y, pa.float64())})

    ds = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_extendedprice"]).map_batches(
        prep, batch_format="pyarrow")
    return linreg_components(ds, "x", "y", x_scale=1, y_scale=1)


def q_lineitem_linreg_by_flag(sf_dir: str):
    """Per-returnflag OLS regression (functions/stats.py::
    grouped_linreg): the global lineitem_linreg generalized to GROUP
    BY — exact int64 moment partials, one group-domain exchange,
    HUGEINT-mirrored cross products, intercept from the ROUNDED
    slope."""
    import numpy as np

    from kafka_connect_mongo_ray.functions.stats import grouped_linreg

    def prep(t: pa.Table) -> pa.Table:
        y = np.floor(np.asarray(t["l_extendedprice"], dtype=np.float64))
        return pa.table({"l_returnflag": t["l_returnflag"],
                         "x": t["l_quantity"],
                         "y": pa.array(y, pa.float64())})

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity",
                        "l_extendedprice"]).map_batches(
        prep, batch_format="pyarrow")
    return grouped_linreg(ds, group_col="l_returnflag", x_col="x",
                          y_col="y")


def q_events_ntile(sf_dir: str):
    """NTILE(8) OVER (ORDER BY ts, event_id) riding the global
    ROW_NUMBER machinery (functions/ranking.py::global_row_number
    ``ntile=``): the tile is a pure integer function of (rn, total, k)
    computed inside the same rank pass — zero extra passes, no extra
    shuffle."""
    from kafka_connect_mongo_ray.functions.ranking import global_row_number

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
        })

    ds = _read(sf_dir, "events", columns=["event_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    ranked = global_row_number(ds, order_cols=["ts_us", "event_id"],
                               rank_col="rn", num_buckets=_gate_buckets(),
                               ntile=(8, "tile"))
    return ranked.select_columns(["event_id", "rn", "tile"])


def q_events_percent_rank(sf_dir: str):
    """PERCENT_RANK() and CUME_DIST() OVER (PARTITION BY user_id ORDER
    BY value) in one groupby shuffle (functions/ranking.py::
    group_percent_rank); both are int-derived float64 divisions so the
    SQL mirror is bit-identical, ties share outputs."""
    from kafka_connect_mongo_ray.functions.ranking import group_percent_rank

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    return group_percent_rank(ds, key="user_id", order_col="value",
                              pr_col="pr", cd_col="cd",
                              num_partitions=_gate_buckets())


def q_lineitem_histogram(sf_dir: str):
    """Fixed-width histogram of extendedprice (functions/stats.py::
    fixed_width_histogram): bin = FLOOR(price/5000), exact count and
    exact cents sum per bin; batches pre-aggregate to bin-domain-sized
    partials before the one tiny shuffle."""
    from kafka_connect_mongo_ray.functions.stats import fixed_width_histogram

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_extendedprice": t["l_extendedprice"],
            "cents": pc.cast(
                pc.round(pc.multiply(t["l_extendedprice"], 100.0), 0,
                         round_mode="half_towards_infinity"), pa.int64()),
        })

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"]).map_batches(
        prep, batch_format="pyarrow")
    return fixed_width_histogram(ds, "l_extendedprice", width=5000.0,
                                 cents_col="cents",
                                 num_partitions=_gate_buckets())


def q_events_mode_per_type(sf_dir: str):
    """Per-group MODE: the most frequent FLOOR(value) bucket per event
    type (ties → smallest bucket). Composition: batch-local counts →
    one (type, v) groupby-sum → group_argmax on (cnt DESC, v ASC);
    every shuffle is distinct-domain-sized."""
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.functions.stats import group_argmax

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        v = np.floor(np.asarray(batch["value"], dtype=np.float64)).astype(
            np.int64)
        df = pd.DataFrame({"event_type": np.asarray(batch["event_type"]),
                           "v": v})
        agg = df.groupby(["event_type", "v"], sort=False).size().rename(
            "cnt").reset_index()
        return pa.table({"event_type": pa.array(agg["event_type"],
                                                pa.string()),
                         "v": pa.array(agg["v"].to_numpy(), pa.int64()),
                         "cnt": pa.array(agg["cnt"].to_numpy(), pa.int64())})

    counts = (_read(sf_dir, "events", columns=["event_type", "value"])
              .map_batches(partial, batch_format="pyarrow")
              .groupby(["event_type", "v"],
                       num_partitions=_gate_buckets())
              .aggregate(Sum("cnt", alias_name="cnt")))

    picked = group_argmax(counts, keys=["event_type"],
                          order=[("cnt", "descending"), ("v", "ascending")],
                          num_partitions=_gate_buckets())
    return picked.map_batches(
        lambda t: pa.table({"event_type": t["event_type"], "v": t["v"],
                            "cnt": pc.cast(t["cnt"], pa.int64())}),
        batch_format="pyarrow")


def q_docs_repetition_stats(sf_dir: str):
    """Word-repetition quality signals (functions/text.py::
    repetition_stats_batch): per-doc total/distinct words, modal word
    (min-word tie-break), and the dup/top fractions corpus filters
    threshold on. Embarrassingly parallel — no shuffle at all."""
    from kafka_connect_mongo_ray.functions.text import repetition_stats_batch

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        repetition_stats_batch, batch_format="pyarrow")


def q_events_quantiles_approx(sf_dir: str):
    """Approximate quantiles over the CONTINUOUS value column — the
    scale path where exact_quantiles' value→count compaction doesn't
    apply (raw doubles have row-count-sized distinct domains). Two-level
    mergeable equi-depth summaries (functions/quantiles.py::
    approx_quantiles) bound worker AND driver state at fanin×cap pairs;
    the ≤2N/cap rank-error claim becomes a machine-checked boolean per
    quantile against the engine's own one-pass exact ranks, with the
    exact row count cross-checked by SQL (the HLL-query precedent)."""
    from kafka_connect_mongo_ray.functions.quantiles import (
        approx_quantiles,
        exact_ranks,
    )

    qs = [0.25, 0.5, 0.75, 0.9]
    est = approx_quantiles(_read(sf_dir, "events", columns=["value"]),
                           "value", qs, per_block_cap=256)
    ranks, n = exact_ranks(_read(sf_dir, "events", columns=["value"]),
                           "value", [est[q] for q in qs])
    ok = [bool(abs(r - q * n) <= 0.03 * n) for q, r in zip(qs, ranks)]
    return pd.DataFrame({"q": qs, "n": [int(n)] * len(qs),
                         "within_bound": ok})


def q_events_rank_ties(sf_dir: str):
    """Distributed SQL RANK() with ties (functions/ranking.py::
    rank_with_ties) over FLOOR(value) — a deliberately tie-heavy
    integer domain. Counts pass moves only bincount partials; the one
    row shuffle is the rank pass."""
    from kafka_connect_mongo_ray.functions.ranking import rank_with_ties

    def prep(t: pa.Table) -> pa.Table:
        v = np.floor(np.asarray(t["value"], dtype=np.float64))
        return pa.table({"event_id": t["event_id"],
                         "v": pa.array(v.astype(np.int64), pa.int64())})

    ds = _read(sf_dir, "events", columns=["event_id", "value"]).map_batches(
        prep, batch_format="pyarrow")
    out = rank_with_ties(ds, order_col="v", rank_col="rnk",
                         num_buckets=_gate_buckets())
    return out.select_columns(["event_id", "rnk"])


def q_orders_monthly_revenue(sf_dir: str):
    """Calendar-month rollup of order revenue — the date-family
    aggregate (dates extracted with Arrow's year()/month() kernels,
    revenue as exact int64 cents). Batch-local pure-Arrow pre-agg
    bounds the one shuffle at months-per-block rows."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ym = pc.add(pc.multiply(pc.cast(pc.year(batch["o_orderdate"]),
                                        pa.int64()), 100),
                    pc.cast(pc.month(batch["o_orderdate"]), pa.int64()))
        cents = pc.cast(pc.round(pc.multiply(batch["o_totalprice"], 100.0),
                                 0, round_mode="half_towards_infinity"),
                        pa.int64())
        g = pa.table({"ym": ym, "revenue_cents": cents}).group_by(
            "ym").aggregate([("revenue_cents", "sum"), ([], "count_all")])
        return g.rename_columns(["ym", "revenue_cents", "n"])

    return (_read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("ym")
            .aggregate(Sum("revenue_cents", alias_name="revenue_cents"),
                       Sum("n", alias_name="n")))


def q_events_distinct_users_exact(sf_dir: str):
    """EXACT COUNT(DISTINCT user) per event type (functions/stats.py::
    group_count_distinct) — the exact complement of the
    events_user_hll_by_type estimate: batch-local pair dedup, one
    pair-domain shuffle, group-domain Sum."""
    from kafka_connect_mongo_ray.functions.stats import group_count_distinct

    return group_count_distinct(
        _read(sf_dir, "events", columns=["event_type", "user_id"]),
        group_col="event_type", val_col="user_id", out_col="nd",
        num_partitions=_gate_buckets())


def q_events_user_paths(sf_dir: str):
    """Per-user ordered event-type path (functions/ranking.py::
    group_string_agg) — SQL STRING_AGG(type, '>' ORDER BY ts, id):
    one bucketed shuffle, per-bucket sort + join."""
    from kafka_connect_mongo_ray.functions.ranking import group_string_agg

    return group_string_agg(
        _events_ts_us(sf_dir, extra_cols=["event_type"]),
        key="user_id", order_cols=["ts_us", "event_id"],
        val_col="event_type", sep=">", out_col="path",
        num_partitions=_gate_buckets())


def q_lineitem_zscore(sf_dir: str):
    """Per-returnflag z-score outliers (functions/stats.py::
    group_zscore_outliers) over FLOOR(extendedprice) dollars: exact
    int64 moments per group broadcast back as closure scalars, filter
    on RAW z (|z| > 1.5 — the price domain is near-uniform, max |z|
    ~1.73), output z rounded to 9 — the float formula is
    mirrored operand-for-operand in the oracle."""
    from kafka_connect_mongo_ray.functions.stats import group_zscore_outliers

    def prep(t: pa.Table) -> pa.Table:
        v = np.floor(np.asarray(t["l_extendedprice"], dtype=np.float64))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_linenumber": t["l_linenumber"],
                         "l_returnflag": t["l_returnflag"],
                         "v": pa.array(v.astype(np.int64), pa.int64())})

    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_returnflag",
                        "l_extendedprice"]).map_batches(
        prep, batch_format="pyarrow")
    return group_zscore_outliers(ds, group_col="l_returnflag", int_col="v",
                                 id_cols=["l_orderkey", "l_linenumber"],
                                 z_thresh=1.5, z_col="z")


def q_events_funnel(sf_dir: str):
    """signup → click → purchase funnel (functions/ranking.py::
    funnel_counts): per-user earliest-anchor chain with strict time
    ordering; one bucketed shuffle, per-bucket masked groupby-mins,
    scalar partials."""
    from kafka_connect_mongo_ray.functions.ranking import funnel_counts

    return funnel_counts(
        _events_ts_us(sf_dir, extra_cols=["event_type"]),
        key="user_id", ts_col="ts_us", type_col="event_type",
        steps=["signup", "click", "purchase"],
        num_partitions=_gate_buckets())


def q_docs_tfidf_top(sf_dir: str):
    """Full-vocabulary TF-IDF top-3 terms per document
    (functions/retrieval.py::tfidf_top_terms): narrow (doc, term, tf)
    token table → vocabulary-sized df aggregate → bucketed tf ⋈ df
    join → per-doc top-k. N comes from the parquet footer."""
    from kafka_connect_mongo_ray.functions.retrieval import tfidf_top_terms

    return tfidf_top_terms(
        None, tf=_token_shared_tf(sf_dir),
        n_docs=_table_rows(sf_dir, "documents"), k=3,
        num_partitions=_gate_buckets())


def q_docs_unigram_logprob(sf_dir: str):
    """Per-document mean unigram LM log-probability
    (functions/retrieval.py::unigram_logprob) — the cheap corpus-LM
    quality score; shares the materialized token table with
    docs_tfidf_top (one tokenize pass for both gate queries)."""
    from kafka_connect_mongo_ray.functions.retrieval import unigram_logprob

    return unigram_logprob(None, tf=_token_shared_tf(sf_dir),
                           num_partitions=_gate_buckets())


def q_lineitem_corr_by_flag(sf_dir: str):
    """Per-group Pearson correlation (functions/stats.py::grouped_corr)
    of quantity vs discount per returnflag — grouped exact int64 moment
    partials, one group-domain exchange, closed-form float per group
    mirrored operand-for-operand in SQL."""
    from kafka_connect_mongo_ray.functions.stats import grouped_corr

    return grouped_corr(
        _read(sf_dir, "lineitem",
              columns=["l_returnflag", "l_quantity", "l_discount"]),
        group_col="l_returnflag", x_col="l_quantity", y_col="l_discount",
        x_scale=1, y_scale=100)


def q_dedup_edit_distance(sf_dir: str):
    """Exact Levenshtein similarity join at distance ≤ 10
    (functions/dedup.py::edit_distance_pairs): complete length
    blocking → complete char-histogram L1 prefilter → Myers
    bit-parallel verify on join-attached texts — the character-level
    dedup family member."""
    from kafka_connect_mongo_ray.functions.dedup import edit_distance_pairs

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    return edit_distance_pairs(
        docs.select_columns(["doc_id", "n_chars"]), docs, max_dist=10,
        num_partitions=_gate_buckets())


def q_docs_bigram_top(sf_dir: str):
    """Global top-50 adjacent word pairs (functions/vocab.py::
    bigram_topk) — the BPE-merge pair-count step: batch-local
    value_counts partials, one vocabulary-bounded groupby-sum, two-level
    candidate top-k (no global sort)."""
    from kafka_connect_mongo_ray.functions.vocab import bigram_topk

    return bigram_topk(_read(sf_dir, "documents",
                             columns=["doc_id", "text"]),
                       k=50, num_partitions=_gate_buckets())


def q_docs_contamination(sf_dir: str):
    """Train/test decontamination (functions/vocab.py::
    ngram_contamination): odd-doc_id test docs sharing ≥1 word 5-gram
    with any even-doc_id train doc, with the distinct contaminated-gram
    count. One bucketed semi join on the gram key is the only
    all-to-all (gate keeps gram strings; hash_grams=True is the 100-TB
    fingerprint configuration, asserted output-identical in tests)."""
    from kafka_connect_mongo_ray.functions.vocab import ngram_contamination

    return ngram_contamination(_read(sf_dir, "documents",
                                     columns=["doc_id", "text"]),
                               n=5, num_partitions=_gate_buckets())


def q_docs_length_trim(sf_dir: str):
    """Per-source length-percentile trim (functions/quantiles.py::
    quantile_band_filter): keep documents inside their source's exact
    [p10, p90] n_chars band — grouped value→count quantile pass, then a
    broadcast-band filter pass."""
    from kafka_connect_mongo_ray.functions.quantiles import (
        quantile_band_filter,
    )

    return quantile_band_filter(
        _read(sf_dir, "documents",
              columns=["doc_id", "source", "n_chars"]),
        "source", "n_chars", lo_q=0.1, hi_q=0.9, scale=1,
        num_partitions=_gate_buckets())


def q_lineitem_mad(sf_dir: str):
    """Per-group median absolute deviation (functions/quantiles.py::
    grouped_mad) of extendedprice cents by returnflag — two exact
    grouped-median passes, integer-exact."""
    from kafka_connect_mongo_ray.functions.quantiles import grouped_mad

    return grouped_mad(
        _read(sf_dir, "lineitem",
              columns=["l_returnflag", "l_extendedprice"]),
        "l_returnflag", "l_extendedprice", scale=100,
        num_partitions=_gate_buckets())


def q_lineitem_mad_refine(sf_dir: str):
    """grouped_mad on the coarse-then-refine plan (quantiles.py::
    grouped_mad_2pass) — bit-exact vs the one-pass MAD; the
    exchange-bounded scale path, gated here for a hard correctness
    signal on a different group column than lineitem_mad."""
    from kafka_connect_mongo_ray.functions.quantiles import (
        grouped_mad_2pass,
    )

    return grouped_mad_2pass(
        _read(sf_dir, "lineitem",
              columns=["l_linestatus", "l_extendedprice"]),
        "l_linestatus", "l_extendedprice", scale=100, coarse_bin=4096,
        num_partitions=_gate_buckets())


def q_orders_revenue_top(sf_dir: str):
    """TPC-H Q3-shaped composition: BUILDING-segment customers' orders
    placed before the cutoff, joined to lineitems shipped after it,
    top 10 orders by revenue. The scale shape: the customer side
    reduces to KEYS ONLY through a semi join, lineitem pre-aggregates
    revenue per orderkey inside each batch BEFORE its one bucketed
    exchange, and revenue is integer cents×(100−disc) so the oracle
    match is exact. Final top-k is a dimension-sized sort."""
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.stages.join import hash_join

    CUT = np.datetime64("1998-07-01")
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def building_keys(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["c_mktsegment"], pa.scalar("BUILDING"))
        return pa.table({"o_custkey": batch.filter(keep)["c_custkey"]})

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_orderpriority"])

    def early_orders(batch: pa.Table) -> pa.Table:
        keep = pc.less(batch["o_orderdate"],
                       pa.scalar(CUT.astype("datetime64[us]").item()))
        return batch.filter(keep)

    o_side = hash_join(
        orders.map_batches(early_orders, batch_format="pyarrow"),
        cust.map_batches(building_keys, batch_format="pyarrow"),
        on=["o_custkey"], how="semi", num_buckets=_gate_buckets(),
    ).map_batches(
        lambda t: t.select(["o_orderkey", "o_orderdate", "o_orderpriority"]),
        batch_format="pyarrow")

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])

    def li_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        keep = pc.greater(batch["l_shipdate"],
                          pa.scalar(CUT.astype("datetime64[us]").item()))
        b = batch.filter(keep)
        cents = np.rint(np.asarray(b["l_extendedprice"],
                                   dtype=np.float64) * 100).astype(np.int64)
        disc = np.rint(np.asarray(b["l_discount"],
                                  dtype=np.float64) * 100).astype(np.int64)
        df = pd.DataFrame({"o_orderkey": np.asarray(b["l_orderkey"],
                                                    dtype=np.int64),
                           "rev": cents * (100 - disc)})
        agg = df.groupby("o_orderkey", as_index=False)["rev"].sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    rev = (li.map_batches(li_partial, batch_format="pyarrow")
           .groupby("o_orderkey", num_partitions=_gate_buckets())
           .aggregate(Sum("rev", alias_name="revenue_cents")))
    joined = hash_join(rev, o_side, on=["o_orderkey"],
                       num_buckets=_gate_buckets())

    def topk(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas().sort_values(
            ["revenue_cents", "o_orderkey"], ascending=[False, True],
            kind="mergesort")
        return pa.Table.from_pandas(df.head(10), preserve_index=False)

    # batch-local top-10 then a single dimension-sized final cut
    out = (joined.map_batches(topk, batch_format="pyarrow")
           .repartition(1).map_batches(topk, batch_format="pyarrow"))
    return out.map_batches(
        lambda t: t.select(["o_orderkey", "o_orderdate", "o_orderpriority",
                            "revenue_cents"]),
        batch_format="pyarrow")


def q_docs_pii_scan(sf_dir: str):
    """Curation PII screen (functions/text.py::pii_counts_batch):
    per-source totals of email/phone/SSN-shaped matches plus the count
    of flagged documents. Vectorized RE2 kernels + batch-local
    pre-aggregation; one source-domain groupby."""
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.functions.text import (
        PII_PATTERNS,
        pii_counts_batch,
    )

    ds = _read(sf_dir, "documents", columns=["source", "text"])
    names = list(PII_PATTERNS)

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        t = pii_counts_batch(batch)
        df = pd.DataFrame({"source": t["source"].to_pandas()})
        any_hit = np.zeros(len(df), dtype=bool)
        for n in names:
            df[n] = np.asarray(t[n], dtype=np.int64)
            any_hit |= df[n].to_numpy() > 0
        df["flagged_docs"] = any_hit.astype(np.int64)
        df["n_docs"] = 1
        agg = df.groupby("source", as_index=False, dropna=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("source", num_partitions=_gate_buckets())
            .aggregate(*[Sum(n, alias_name=n) for n in names],
                       Sum("flagged_docs", alias_name="flagged_docs"),
                       Sum("n_docs", alias_name="n_docs")))


def q_dedup_normalized(sf_dir: str):
    """Fuzzy-exact dedup: duplicates under the canonical normalization
    (lowercase, non-alphanumeric runs → one space, trim) collapse to
    the min-id survivor — catches re-punctuated/re-cased copies raw
    md5 misses. Normalization is batch-local Arrow kernels; the dedup
    is the standard (id, hash)-only shuffle."""
    from kafka_connect_mongo_ray.functions.dedup import exact_dedup
    from kafka_connect_mongo_ray.functions.text import (
        normalize_text_batch,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    norm = ds.map_batches(normalize_text_batch, batch_format="pyarrow")
    return exact_dedup(norm, text_col="norm",
                       num_partitions=_gate_buckets())


def q_docs_char_entropy(sf_dir: str):
    """Per-document character-unigram Shannon entropy
    (functions/text.py::char_entropy_batch) — gibberish/boilerplate
    quality signal; shuffle-free vectorized batch map (one np.unique
    over packed (doc, codepoint) keys per batch)."""
    from kafka_connect_mongo_ray.functions.text import char_entropy_batch

    return _read(sf_dir, "documents",
                 columns=["doc_id", "text"]).map_batches(
        char_entropy_batch, batch_format="pyarrow")


def q_dedup_keep_best(sf_dir: str):
    """Canonical representative per near-dup cluster: verified pair set
    (shared memo) → connected components → join n_chars → per-cluster
    argmax (longest doc, ties to smallest id). The keep/drop decision
    LLM dedup actually needs, end to end; the oracle recomputes the
    transitive closure and the QUALIFY pick in SQL. The component
    labels are the shared memo (one propagation per process for this
    query and dedup_components)."""
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.stats import group_argmax
    from kafka_connect_mongo_ray.stages.join import hash_join

    comps = rd.from_arrow(dedup_component_labels(sf_dir))
    joined = hash_join(comps,
                       _read(sf_dir, "documents",
                             columns=["doc_id", "n_chars"]),
                       on=["doc_id"], num_buckets=_gate_buckets())
    best = group_argmax(joined, keys=["component"],
                        order=[("n_chars", "descending"),
                               ("doc_id", "ascending")],
                        num_partitions=_gate_buckets())
    return best.map_batches(
        lambda t: pa.table({"component": t["component"],
                            "keep_id": t["doc_id"],
                            "keep_chars": t["n_chars"]}),
        batch_format="pyarrow")


def q_events_winsorized(sf_dir: str):
    """Per-type winsorized cents sum (functions/quantiles.py::
    winsorized_sum): exact per-group [p5, p95] clamp then COUNT/SUM —
    robust aggregation that saturates outliers instead of dropping
    rows."""
    from kafka_connect_mongo_ray.functions.quantiles import winsorized_sum

    return winsorized_sum(
        _read(sf_dir, "events", columns=["event_type", "value"]),
        "event_type", "value", lo_q=0.05, hi_q=0.95, scale=100,
        num_partitions=_gate_buckets())


def q_orders_pareto(sf_dir: str):
    """Pareto cut: the smallest prefix of customers (by revenue desc)
    reaching 80% of total revenue. Fact-sized work is one pre-aggregated
    groupby-sum to the customer domain; the cumulative-share scan runs
    in a single task over that dimension-sized table (materialized once
    — multi-consumer staging rule), keeping rows whose PRIOR cumulative
    revenue is below 0.8·total (ties broken rev desc, custkey asc,
    mirrored in the SQL window ORDER BY)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "o_custkey": np.asarray(batch["o_custkey"], dtype=np.int64),
            "rev": np.rint(np.asarray(batch["o_totalprice"],
                                      dtype=np.float64)
                           * 100).astype(np.int64)})
        g = df.groupby("o_custkey", as_index=False)["rev"].sum()
        return pa.table({"o_custkey": pa.array(g["o_custkey"], pa.int64()),
                         "rev": pa.array(g["rev"], pa.int64())})

    agg = (_read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("o_custkey", num_partitions=_gate_buckets())
           .aggregate(Sum("rev", alias_name="rev"))
           .materialize())
    tot = agg.sum("rev")

    def cut(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("rev", "descending"),
                                              ("o_custkey", "ascending")])
        t = t.take(order)
        rev = np.asarray(t["rev"], dtype=np.int64)
        prior = np.cumsum(rev) - rev
        return t.filter(pa.array(prior < 0.8 * tot))

    return agg.repartition(1).map_batches(cut, batch_format="pyarrow")


def q_corpus_decontam_prep(sf_dir: str):
    """Curation composition over the session's new operators: per-source
    [p10, p90] length trim → drop contaminated test docs (odd doc_id
    sharing a word-5-gram with the even train split) via a bucketed
    ANTI join → per-source corpus stats. Three exchanges total (gram
    semi join inside contamination, keys-only anti join, group-domain
    final aggregate); the trim filter and both gram passes stream."""
    from ray.data.aggregate import Count, Sum

    from kafka_connect_mongo_ray.functions.quantiles import (
        quantile_band_filter,
    )
    from kafka_connect_mongo_ray.functions.vocab import ngram_contamination
    from kafka_connect_mongo_ray.stages.join import hash_join

    trimmed = quantile_band_filter(
        _read(sf_dir, "documents",
              columns=["doc_id", "source", "n_chars"]),
        "source", "n_chars", lo_q=0.1, hi_q=0.9, scale=1,
        num_partitions=_gate_buckets())
    # count_grams=False: the anti join only needs the id SET, so the
    # contamination count exchange is skipped; materializing the
    # flagged-id table (flagged-docs-sized) stages the plan between
    # the gram semi join and the anti join (lazy multi-all-to-all
    # chains starve the executor — NEXT.md #2)
    contaminated = ngram_contamination(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        n=5, num_partitions=_gate_buckets(),
        count_grams=False).materialize()
    clean = hash_join(trimmed, contaminated, on=["doc_id"], how="anti",
                      num_buckets=_gate_buckets())
    return (clean.groupby("source", num_partitions=_gate_buckets())
            .aggregate(Count(alias_name="n_docs"),
                       Sum("n_chars", alias_name="total_chars")))


def _parity_filter(keep: int):
    """Batch filter keeping rows with doc_id % 2 == keep (the
    deterministic window split the incremental-dedup gates use)."""
    def fn(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        return batch.filter(pa.array(ids % 2 == keep))

    return fn


def _fresh_tmp_index(prefix: str, sf_dir: str) -> str:
    """Deterministic per-(prefix, sf_dir) scratch index path, cleared on
    every call: re-runs reuse ONE directory instead of leaking a new
    randomized-hash path per process (hash() is seed-randomized)."""
    import hashlib as _hl
    import shutil
    import tempfile

    digest = _hl.md5(sf_dir.encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"{prefix}_{digest}")
    shutil.rmtree(path, ignore_errors=True)
    return path


def q_dedup_incremental(sf_dir: str):
    """Incremental exact dedup against a persisted fingerprint index
    (state/dedup_index.py): window 1 (even doc_ids) builds the bucketed
    index on disk, window 2 (odd doc_ids) is deduped against it AND
    within itself (first id wins). The streaming-ingest dedup contract:
    a fingerprint ever seen is dropped forever, one bucketed anti join
    per window."""
    from kafka_connect_mongo_ray.state.dedup_index import (
        incremental_exact_dedup,
    )

    idx = _fresh_tmp_index("kcm_dedup_idx", sf_dir)
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    incremental_exact_dedup(
        docs.map_batches(_parity_filter(0), batch_format="pyarrow"), idx,
        num_buckets=_gate_buckets())
    survivors = incremental_exact_dedup(
        docs.map_batches(_parity_filter(1), batch_format="pyarrow"), idx,
        num_buckets=_gate_buckets())
    return survivors.select_columns(["doc_id", "fp"])


def q_events_anomaly_mad(sf_dir: str):
    """Robust per-type outlier counting: |cents − med| > 5·MAD (the
    median/MAD analog of the z-score filter — insensitive to the very
    outliers it hunts). The med/MAD table comes from the one-histogram
    grouped_mad pass, broadcast as closure scalars into a count
    pre-aggregation; NULL groups excluded (equi-join mirror)."""
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.functions.quantiles import grouped_mad

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    mads = grouped_mad(ds, "event_type", "value", scale=100,
                       num_partitions=_gate_buckets()).to_pandas()
    med = dict(zip(mads.event_type, mads.med_scaled))
    mad = dict(zip(mads.event_type, mads.mad_scaled))

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        batch = batch.filter(pc.is_valid(batch["event_type"]))
        v = np.rint(np.asarray(batch["value"], dtype=np.float64)
                    * 100).astype(np.int64)
        g = batch["event_type"].to_pandas()
        dev = np.abs(v - g.map(med).to_numpy(dtype=np.int64))
        out = dev > 5 * g.map(mad).to_numpy(dtype=np.int64)
        agg = (pd.DataFrame({"event_type": g, "o": out.astype(np.int64)})
               .groupby("event_type", dropna=False)["o"]
               .agg(["count", "sum"]).reset_index())
        return pa.table({
            "event_type": pa.array(agg["event_type"], pa.string()),
            "n": pa.array(agg["count"].to_numpy(np.int64), pa.int64()),
            "outliers": pa.array(agg["sum"].to_numpy(np.int64),
                                 pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type", num_partitions=_gate_buckets())
            .aggregate(Sum("n", alias_name="n"),
                       Sum("outliers", alias_name="outliers")))


def q_orders_rfm(sf_dir: str):
    """RFM segmentation: per customer (recency = latest order day,
    frequency = order count, monetary = cents sum) → NTILE(4) on each
    dimension. The fact-sized work is ONE pre-aggregated groupby to
    the customer domain; the three NTILEs run in a single task over
    the materialized dimension-sized table (the Pareto-cut shape)."""
    from ray.data.aggregate import Count, Max, Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        day = (np.asarray(batch["o_orderdate"].cast(pa.int64()))
               // 86_400_000_000).astype(np.int64)
        cents = np.rint(np.asarray(batch["o_totalprice"],
                                   dtype=np.float64) * 100).astype(np.int64)
        df = (pd.DataFrame({"o_custkey": np.asarray(batch["o_custkey"],
                                                    dtype=np.int64),
                            "day": day, "cents": cents})
              .groupby("o_custkey", as_index=False)
              .agg(last_day=("day", "max"), n_orders=("day", "size"),
                   cents=("cents", "sum")))
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = (_read(sf_dir, "orders",
                 columns=["o_custkey", "o_orderdate", "o_totalprice"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("o_custkey", num_partitions=_gate_buckets())
           .aggregate(Max("last_day", alias_name="last_day"),
                      Sum("n_orders", alias_name="n_orders"),
                      Sum("cents", alias_name="cents"))
           .materialize())

    def ntiles(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas().sort_values("o_custkey").reset_index(drop=True)
        n = len(df)

        def ntile(order_cols, ascending):
            # NTILE(4) over ORDER BY ...: rank each row, then the SQL
            # bucket formula (uneven remainders go to the first tiles)
            idx = df.sort_values(order_cols, ascending=ascending,
                                 kind="mergesort").index.to_numpy()
            rn = np.empty(n, dtype=np.int64)
            rn[idx] = np.arange(n)
            big = n % 4
            size = n // 4 + 1
            return np.where(rn < big * size, rn // size,
                            big + (rn - big * size) // max(1, n // 4)) + 1

        return pa.table({
            "o_custkey": pa.array(df["o_custkey"].to_numpy(np.int64),
                                  pa.int64()),
            "r": pa.array(ntile(["last_day", "o_custkey"],
                                [False, True]), pa.int64()),
            "f": pa.array(ntile(["n_orders", "o_custkey"],
                                [False, True]), pa.int64()),
            "m": pa.array(ntile(["cents", "o_custkey"],
                                [False, True]), pa.int64()),
        })

    return agg.repartition(1).map_batches(ntiles, batch_format="pyarrow")


def q_dedup_incremental_minhash(sf_dir: str):
    """Incremental NEAR-dup screening vs the persisted LSH band index
    (state/dedup_index.py::incremental_minhash_dedup), two-window
    simulation (even ids build, odd ids screen). LSH drops are
    probabilistic, so the gate uses the HLL checked-boolean pattern:
    the engine computes invariants that are TRUE by construction —
    every exact cross-window duplicate drops (identical text ⇒
    identical signature ⇒ every band collides), and admitted ∪ dropped
    partitions the window — and the oracle asserts the literals plus
    the deterministic window size."""
    from kafka_connect_mongo_ray.state.dedup_index import (
        incremental_minhash_dedup,
    )

    idx = _fresh_tmp_index("kcm_mh_idx", sf_dir)
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    w1 = docs.map_batches(_parity_filter(0), batch_format="pyarrow")
    w2 = docs.map_batches(_parity_filter(1), batch_format="pyarrow")
    incremental_minhash_dedup(w1, idx, num_buckets=_gate_buckets())
    admitted = incremental_minhash_dedup(w2, idx,
                                         num_buckets=_gate_buckets())

    # checked-boolean invariants, computed DISTRIBUTEDLY (bucketed
    # semi/anti joins; only 0/1 violation counts reach the driver):
    # exact cross-window dups must all drop (identical text ⇒ identical
    # signature ⇒ every band collides — pinned exactly in
    # test_vocab_and_robust_stats.py::test_incremental_minhash_dedup_windows),
    # and admitted ⊆ window 2.
    from kafka_connect_mongo_ray.functions.text import md5_fingerprint_batch
    from kafka_connect_mongo_ray.stages.join import hash_join

    def _md5_fp(batch: pa.Table) -> pa.Table:
        return md5_fingerprint_batch(batch, out_col="fp").select(
            ["doc_id", "fp"])

    nb = _gate_buckets()
    w1_fp = (w1.map_batches(_md5_fp, batch_format="pyarrow")
             .map_batches(lambda t: t.select(["fp"]),
                          batch_format="pyarrow"))
    w2_fp = w2.map_batches(_md5_fp, batch_format="pyarrow").materialize()
    adm_ids = admitted.map_batches(lambda t: t.select(["doc_id"]),
                                   batch_format="pyarrow").materialize()
    exact_dups_w2 = hash_join(w2_fp, w1_fp, on=["fp"], how="semi",
                              num_buckets=nb).materialize()
    # an empty join output carries no schema (NEXT.md: dataset-level
    # column ops crash on it) — and zero dups means zero violations
    admitted_dups = 0 if exact_dups_w2.count() == 0 else hash_join(
        exact_dups_w2.map_batches(lambda t: t.select(["doc_id"]),
                                  batch_format="pyarrow"),
        adm_ids, on=["doc_id"], how="semi", num_buckets=nb).count()
    stray_admits = 0 if adm_ids.count() == 0 else hash_join(
        adm_ids,
        w2_fp.map_batches(lambda t: t.select(["doc_id"]),
                          batch_format="pyarrow"),
        on=["doc_id"], how="anti", num_buckets=nb).count()
    return pa.table({
        "n_w2": pa.array([w2_fp.count()], pa.int64()),
        "exact_dups_dropped": pa.array([admitted_dups == 0], pa.bool_()),
        "partition_ok": pa.array([stray_admits == 0], pa.bool_()),
    })


def _curated_events_batch(batch: pa.Table, window: int) -> pa.Table:
    """Three deterministic CDC windows over documents for the
    streaming-curation gate: window w inserts docs with doc_id%3==w at
    ts=w; window 1 additionally UPDATES the doc_id%6==0 docs (inserted
    in window 0) to text||':u' at ts=1 — so the change feed carries
    both new keys and changed content through the curation screen."""
    doc_id = np.asarray(batch["doc_id"], dtype=np.int64)
    text = np.asarray(batch["text"]).astype(object)
    lang = np.asarray(batch["lang"]).astype(object)
    source = np.asarray(batch["source"]).astype(object)
    ins = (doc_id % 3) == window
    ids, ops = [doc_id[ins]], [np.full(ins.sum(), "i", dtype=object)]
    content = [text[ins]]
    rows = [ins]
    if window == 1:
        upd = (doc_id % 6) == 0
        ids.append(doc_id[upd])
        ops.append(np.full(upd.sum(), "u", dtype=object))
        content.append((pd.Series(text[upd]) + ":u").to_numpy(dtype=object))
        rows.append(upd)
    all_ids = np.concatenate(ids)
    n = len(all_ids)
    row_mask = np.concatenate([np.flatnonzero(m) for m in rows])
    return pa.table(
        {
            "ts": pa.array(np.full(n, window, dtype=np.int64)),
            "inc": pa.array(np.zeros(n, dtype=np.int32)),
            "op": pa.array(np.concatenate(ops), pa.string()),
            "repo": pa.array(source[row_mask], pa.string()),
            "path": pa.array(all_ids.astype(str), pa.string()),
            "commit": pa.array(np.full(n, "", dtype=object), pa.string()),
            "lang": pa.array(lang[row_mask], pa.string()),
            "content": pa.array(np.concatenate(content), pa.large_string()),
            "partition_id": pa.array((all_ids % NUM_PARTITIONS).astype(np.int32)),
        },
        schema=CHANGE_EVENT_SCHEMA,
    )


def q_cdc_curated_stream(sf_dir: str):
    """Streaming curation end-to-end (pipelines/curate.py): three CDC
    windows are committed as replays, each window's CHANGE FEED is
    screened against the persisted fingerprint index, and admissions
    land under curated_dir/window={version}. Returns the full admission
    log (window, doc_id, fp) — first window to ever carry a fingerprint
    wins; in-window ties break on min doc_id."""
    import hashlib
    import shutil

    import ray.data as rd

    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.curate import run_curated_stream

    root = f"/tmp/kcm_curq_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    shutil.rmtree(root, ignore_errors=True)
    cfg = EngineConfig(snapshot_dir=f"{root}/s", checkpoint_dir=f"{root}/c",
                       num_buckets=16)

    def factory(w):
        def make():
            docs = _read(sf_dir, "documents",
                         columns=["doc_id", "text", "lang", "source"])
            return docs.map_batches(_curated_events_batch,
                                    fn_kwargs={"window": w},
                                    batch_format="pyarrow")
        return make

    run_curated_stream([factory(w) for w in range(3)], cfg,
                       index_dir=f"{root}/idx", curated_dir=f"{root}/cur",
                       index_buckets=_gate_buckets())
    parts = []
    for w in sorted(os.listdir(f"{root}/cur")):
        v = int(w.split("=")[1])
        d = rd.read_parquet(f"{root}/cur/{w}", columns=["doc_id", "fp"])
        parts.append(d.map_batches(
            lambda t, v=v: t.append_column(
                "win", pa.array(np.full(t.num_rows, v, np.int64))),
            batch_format="pyarrow"))
    out = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
    return out


def q_cdc_curated_ann(sf_dir: str):
    """Streaming curation FEEDING the persisted ANN index
    (pipelines/curate.py ann_dir mode): window 1 inserts the even
    docs, window 2 the odd docs; each committed window's admitted
    documents are stub-embedded and ingested into the persisted IVF
    index — BUILD on the first window, tagged APPEND afterwards, the
    (doc_id, embedding) sidecar persisted under ``wdir/_vecs/`` before
    the marker so recovery can replay the ingest. The gate asserts
    (1) the index holds exactly one vector per document, (2) a
    replayed window-2 curation (the recovery path) leaves the manifest
    byte-identical — tag idempotence, and (3) an nprobe=cells query
    EQUALS the brute-force top-k over all documents' embeddings."""
    import hashlib
    import json as _json
    import shutil

    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.functions.text import hash_embedding_batch
    from kafka_connect_mongo_ray.pipelines.curate import (
        curate_version,
        run_curated_stream,
    )
    from kafka_connect_mongo_ray.state.ann_index import ivf_index_topk
    from kafka_connect_mongo_ray.utils import embedding_matrix

    root = f"/tmp/kcm_curann_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    shutil.rmtree(root, ignore_errors=True)
    cfg = EngineConfig(snapshot_dir=f"{root}/s", checkpoint_dir=f"{root}/c",
                       num_buckets=16)

    def win_batch(batch: pa.Table, window: int) -> pa.Table:
        doc_id = np.asarray(batch["doc_id"], dtype=np.int64)
        ins = (doc_id % 2) == window
        ids = doc_id[ins]
        n = len(ids)
        return pa.table({
            "ts": pa.array(np.full(n, window, dtype=np.int64)),
            "inc": pa.array(np.zeros(n, dtype=np.int32)),
            "op": pa.array(np.full(n, "i", dtype=object), pa.string()),
            "repo": pa.array(np.asarray(batch["source"]).astype(object)[ins],
                             pa.string()),
            "path": pa.array(ids.astype(str), pa.string()),
            "commit": pa.array(np.full(n, "", dtype=object), pa.string()),
            "lang": pa.array(np.asarray(batch["lang"]).astype(object)[ins],
                             pa.string()),
            "content": pa.array(
                np.asarray(batch["text"]).astype(object)[ins],
                pa.large_string()),
            "partition_id": pa.array((ids % NUM_PARTITIONS).astype(np.int32)),
        }, schema=CHANGE_EVENT_SCHEMA)

    def factory(w):
        def make():
            docs = _read(sf_dir, "documents",
                         columns=["doc_id", "text", "lang", "source"])
            return docs.map_batches(win_batch, fn_kwargs={"window": w},
                                    batch_format="pyarrow")
        return make

    ann_dir = f"{root}/ann"
    run_curated_stream([factory(w) for w in range(2)], cfg,
                       index_dir=f"{root}/idx", curated_dir=f"{root}/cur",
                       index_buckets=_gate_buckets(), ann_dir=ann_dir)

    with open(f"{ann_dir}/manifest.json") as f:
        m_before = _json.load(f)
    # replay window 2's curation — the marker makes it take the
    # recovery path; the committed tag must make the ANN ingest a no-op
    curate_version(cfg, 2, index_dir=f"{root}/idx",
                   curated_dir=f"{root}/cur",
                   index_buckets=_gate_buckets(), ann_dir=ann_dir)
    with open(f"{ann_dir}/manifest.json") as f:
        m_after = _json.load(f)
    idempotent_ok = m_before == m_after

    # brute-force baseline over ALL documents' stub embeddings
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    vt = hash_embedding_batch(docs)
    ids_all = np.asarray(vt["doc_id"], dtype=np.int64)
    m = embedding_matrix(vt["embedding"])
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    order = np.argsort(ids_all)
    q_idx = order[:ANN_NUM_QUERIES]
    q, q_ids = m[q_idx], ids_all[q_idx]

    approx = ivf_index_topk(ann_dir, q, q_ids, k=ANN_K, nprobe=8)
    sims = q @ m.T
    exact_ok = True
    for row, qid in enumerate(q_ids):
        got = set(approx[approx["query_id"] == int(qid)]["neighbor_id"])
        want_order = np.lexsort((ids_all, -sims[row]))[:ANN_K]
        exact_ok = exact_ok and got == set(ids_all[want_order].tolist())
    return pd.DataFrame({
        "n_indexed": [int(m_after["rows"])],
        "exact_ok": [bool(exact_ok)],
        "idempotent_ok": [bool(idempotent_ok)],
    })


def _curated_ts_events_batch(batch: pa.Table, window: int) -> pa.Table:
    """Spread-ts variant of :func:`_curated_events_batch` for the
    time-scoped-reader gate: window w inserts doc_id%3==w at
    ts = 10·w + doc_id%10 (so each window spans a ten-tick range);
    window 1 additionally updates doc_id%6==0 docs to text||':u' at
    ts = 10 + doc_id%10 — the update beats the window-0 insert on ts
    (LWW) and lands inside window 1's range."""
    doc_id = np.asarray(batch["doc_id"], dtype=np.int64)
    text = np.asarray(batch["text"]).astype(object)
    lang = np.asarray(batch["lang"]).astype(object)
    source = np.asarray(batch["source"]).astype(object)
    ins = (doc_id % 3) == window
    ids, ops = [doc_id[ins]], [np.full(ins.sum(), "i", dtype=object)]
    content = [text[ins]]
    rows = [ins]
    if window == 1:
        upd = (doc_id % 6) == 0
        ids.append(doc_id[upd])
        ops.append(np.full(upd.sum(), "u", dtype=object))
        content.append((pd.Series(text[upd]) + ":u").to_numpy(dtype=object))
        rows.append(upd)
    all_ids = np.concatenate(ids)
    n = len(all_ids)
    row_mask = np.concatenate([np.flatnonzero(m) for m in rows])
    return pa.table(
        {
            "ts": pa.array(10 * window + all_ids % 10, pa.int64()),
            "inc": pa.array(np.zeros(n, dtype=np.int32)),
            "op": pa.array(np.concatenate(ops), pa.string()),
            "repo": pa.array(source[row_mask], pa.string()),
            "path": pa.array(all_ids.astype(str), pa.string()),
            "commit": pa.array(np.full(n, "", dtype=object), pa.string()),
            "lang": pa.array(lang[row_mask], pa.string()),
            "content": pa.array(np.concatenate(content), pa.large_string()),
            "partition_id": pa.array((all_ids % NUM_PARTITIONS).astype(np.int32)),
        },
        schema=CHANGE_EVENT_SCHEMA,
    )


def q_cdc_curated_time_scoped(sf_dir: str):
    """Time-scoped read over the curated corpus
    (pipelines/curate.py::read_curated): three CDC windows with SPREAD
    event ts (window w spans ts 10w..10w+9) are committed and curated;
    the read scopes to ts ∈ [5, 14] — the per-window ts zone maps
    recorded in the `_CURATED` markers prune window 3 (ts 20..29)
    without opening a file, and the pushed-down Parquet filter cuts
    the surviving windows to the exact row range. Returns
    (win, doc_id, ts, fp) of the in-range admissions."""
    import hashlib
    import shutil

    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.curate import (
        read_curated,
        run_curated_stream,
    )

    root = f"/tmp/kcm_curts_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    shutil.rmtree(root, ignore_errors=True)
    cfg = EngineConfig(snapshot_dir=f"{root}/s", checkpoint_dir=f"{root}/c",
                       num_buckets=16)

    def factory(w):
        def make():
            docs = _read(sf_dir, "documents",
                         columns=["doc_id", "text", "lang", "source"])
            return docs.map_batches(_curated_ts_events_batch,
                                    fn_kwargs={"window": w},
                                    batch_format="pyarrow")
        return make

    run_curated_stream([factory(w) for w in range(3)], cfg,
                       index_dir=f"{root}/idx", curated_dir=f"{root}/cur",
                       index_buckets=_gate_buckets())
    ds = read_curated(f"{root}/cur", ts_min=5, ts_max=14,
                      columns=["doc_id", "ts", "fp"], include_window=True)
    return ds.map_batches(lambda t: t.select(["win", "doc_id", "ts", "fp"]),
                          batch_format="pyarrow")


def q_cdc_curated_minhash(sf_dir: str):
    """Streaming curation with NEAR-dup screening (screen='minhash',
    pipelines/curate.py): window 1 inserts the even docs; window 2
    inserts the odd docs PLUS exact re-inserts of the doc_id%4==0
    texts under fresh keys (+10M). LSH drops are probabilistic, so the
    gate uses the checked-boolean pattern: every exact re-insert drops
    (identical text ⇒ identical bands — guaranteed), admissions
    partition the window, and the oracle asserts the literals plus the
    deterministic window-2 candidate count."""
    import hashlib
    import shutil

    import ray.data as rd

    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.curate import run_curated_stream

    root = f"/tmp/kcm_curmh_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    shutil.rmtree(root, ignore_errors=True)
    cfg = EngineConfig(snapshot_dir=f"{root}/s", checkpoint_dir=f"{root}/c",
                       num_buckets=16)
    COPY_BASE = 10_000_000

    def win_batch(batch: pa.Table, window: int) -> pa.Table:
        doc_id = np.asarray(batch["doc_id"], dtype=np.int64)
        text = np.asarray(batch["text"]).astype(object)
        source = np.asarray(batch["source"]).astype(object)
        ins = (doc_id % 2) == window
        ids = [doc_id[ins]]
        content = [text[ins]]
        srcs = [source[ins]]
        if window == 1:
            cp = (doc_id % 4) == 0
            ids.append(doc_id[cp] + COPY_BASE)
            content.append(text[cp])
            srcs.append(source[cp])
        all_ids = np.concatenate(ids)
        n = len(all_ids)
        return pa.table(
            {
                "ts": pa.array(np.full(n, window, dtype=np.int64)),
                "inc": pa.array(np.zeros(n, dtype=np.int32)),
                "op": pa.array(np.full(n, "i", dtype=object), pa.string()),
                "repo": pa.array(np.concatenate(srcs), pa.string()),
                "path": pa.array(all_ids.astype(str), pa.string()),
                "commit": pa.array(np.full(n, "", dtype=object),
                                   pa.string()),
                "lang": pa.array(np.full(n, "en", dtype=object),
                                 pa.string()),
                "content": pa.array(np.concatenate(content),
                                    pa.large_string()),
                "partition_id": pa.array(
                    (all_ids % NUM_PARTITIONS).astype(np.int32)),
            },
            schema=CHANGE_EVENT_SCHEMA,
        )

    def factory(w):
        def make():
            docs = _read(sf_dir, "documents",
                         columns=["doc_id", "text", "source"])
            return docs.map_batches(win_batch, fn_kwargs={"window": w},
                                    batch_format="pyarrow")
        return make

    run_curated_stream([factory(w) for w in range(2)], cfg,
                       index_dir=f"{root}/idx", curated_dir=f"{root}/cur",
                       index_buckets=_gate_buckets(), screen="minhash")

    w2 = rd.read_parquet(f"{root}/cur/window=2", columns=["doc_id"]
                         ).to_pandas() if any(
        f.endswith(".parquet") for f in os.listdir(f"{root}/cur/window=2")
    ) else pd.DataFrame({"doc_id": []})
    adm = set(w2["doc_id"].astype(np.int64))
    docs = _read(sf_dir, "documents", columns=["doc_id"]).to_pandas()
    odd = set(docs.doc_id[docs.doc_id % 2 == 1].astype(np.int64))
    copies = set(docs.doc_id[docs.doc_id % 4 == 0].astype(np.int64)
                 + COPY_BASE)
    n_w1 = len(odd) + len(copies)
    return pa.table({
        "n_w1": pa.array([n_w1], pa.int64()),
        "copies_dropped": pa.array([adm.isdisjoint(copies)], pa.bool_()),
        "partition_ok": pa.array([adm <= (odd | copies)], pa.bool_()),
    })


def q_events_cohort_retention(sf_dir: str):
    """Daily cohort retention triangle (functions/analytics.py::
    cohort_retention): cohort = user's first active day, one row per
    (cohort_day, day_offset) with the distinct-user count. Batch-local
    (user, day) dedup bounds the ONE user-keyed shuffle; the final
    exchange is cohort×offset-domain-sized."""
    from kafka_connect_mongo_ray.functions.analytics import cohort_retention

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return cohort_retention(ds, user_col="user_id", ts_col="ts",
                            num_partitions=_gate_buckets())


def q_part_skyline(sf_dir: str):
    """2-D Pareto frontier of parts — cheapest-for-the-size: no other
    part is both ≤ on retailprice and ≥ on size with one strict (SQL
    NOT EXISTS dominance anti-join). Per-block local skylines reduce
    each block to its frontier before a single-task final pass — the
    operator needs NO shuffle at any scale
    (functions/analytics.py::skyline_2d)."""
    from kafka_connect_mongo_ray.functions.analytics import skyline_2d

    ds = _read(sf_dir, "part",
               columns=["p_partkey", "p_retailprice", "p_size"])
    return skyline_2d(ds, x_col="p_retailprice", y_col="p_size")


def q_orders_weighted_sample(sf_dir: str):
    """Deterministic weighted priority sample of orders (Duffield–
    Lund–Thorup priority sampling): q = w/u with w = totalprice cents
    and u a dyadic-rational md5 hash of the orderkey, top-500 by q.
    Priorities are one IEEE multiply + one IEEE divide of exactly
    representable integers, mirrored operand-for-operand in the SQL —
    bit-identical selection, no libm
    (functions/analytics.py::weighted_priority_sample)."""
    from kafka_connect_mongo_ray.functions.analytics import (
        weighted_priority_sample,
    )

    def cents(t: pa.Table) -> pa.Table:
        w = np.rint(np.asarray(t["o_totalprice"], dtype=np.float64)
                    * 100).astype(np.int64)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "w": pa.array(w, pa.int64())})

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_totalprice"]).map_batches(
        cents, batch_format="pyarrow")
    return weighted_priority_sample(ds, id_col="o_orderkey",
                                    weight_cents_col="w", k=500,
                                    num_partitions=_gate_buckets())


def q_events_type_cooccurrence(sf_dir: str):
    """Event-type co-occurrence matrix: for each unordered type pair,
    the number of distinct users that emitted BOTH (the market-basket
    shape at type granularity). Batch-local (user, type) dedup → one
    user-keyed shuffle → per-bucket uint64 bitset kernel → a
    types²-domain final sum
    (functions/analytics.py::cooccurrence_counts)."""
    from kafka_connect_mongo_ray.functions.analytics import (
        cooccurrence_counts,
    )

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    return cooccurrence_counts(ds, user_col="user_id",
                               item_col="event_type",
                               num_partitions=_gate_buckets())


def q_events_ohlc(sf_dir: str):
    """Hourly OHLC bars per event type: open/close = value at the
    extreme (ts, event_id) carriers, high/low/n per (type, hour) —
    all four price fields are SELECTIONS of raw float64 values so the
    oracle mirror is bit-exact. Associative partials bound the one
    bucket shuffle at bars-present-per-block rows
    (functions/analytics.py::ohlc_bars)."""
    from kafka_connect_mongo_ray.functions.analytics import ohlc_bars

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "event_type", "value"])
    return ohlc_bars(ds, key_col="event_type", ts_col="ts",
                     val_col="value", id_col="event_id",
                     num_partitions=_gate_buckets())


def q_events_rolling_wau(sf_dir: str):
    """7-day rolling active users per observed day (WAU-per-day —
    the stickiness denominator). Batch-local (user, day) dedup, one
    user-keyed shuffle with a per-bucket window expansion (a user
    contributes once per covered day globally), calendar-domain final
    sum + observed-day filter
    (functions/analytics.py::rolling_active_users)."""
    from kafka_connect_mongo_ray.functions.analytics import (
        rolling_active_users,
    )

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return rolling_active_users(ds, user_col="user_id", ts_col="ts",
                                window_days=7,
                                num_partitions=_gate_buckets())


def q_orders_revenue_gini(sf_dir: str):
    """Gini coefficient of per-customer revenue (concentration — the
    inequality complement of the Pareto cut). Facts collapse to the
    customer domain in one pre-aggregated groupby-sum; the sorted scan
    runs in a single dimension-sized task accumulating in Python ints
    (exact at any key count), mirrored by HUGEINT sums in SQL with the
    same two float64 casts and one division
    (functions/analytics.py::gini_concentration)."""
    from kafka_connect_mongo_ray.functions.analytics import (
        gini_concentration,
    )

    def cents(t: pa.Table) -> pa.Table:
        w = np.rint(np.asarray(t["o_totalprice"], dtype=np.float64)
                    * 100).astype(np.int64)
        return pa.table({"o_custkey": t["o_custkey"],
                         "cents": pa.array(w, pa.int64())})

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_totalprice"]).map_batches(
        cents, batch_format="pyarrow")
    return gini_concentration(ds, key_col="o_custkey", cents_col="cents",
                              num_partitions=_gate_buckets())


def q_events_transitions(sf_dir: str):
    """First-order event-type transition matrix — LEAD(type) OVER
    (PARTITION BY user ORDER BY ts, id) pair counts, the behavioral
    "next action" table. One key-bucketed shuffle; the per-bucket
    kernel is the window family's key-sorted segment pass emitting
    types²-domain partials
    (functions/analytics.py::transition_counts)."""
    from kafka_connect_mongo_ray.functions.analytics import (
        transition_counts,
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "ts_us": pc.cast(t["ts"], pa.int64()),
                         "event_id": t["event_id"],
                         "event_type": t["event_type"]})

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id",
                        "event_type"]).map_batches(
        prep, batch_format="pyarrow")
    return transition_counts(ds, key_col="user_id",
                             order_cols=["ts_us", "event_id"],
                             state_col="event_type",
                             num_partitions=_gate_buckets())


def q_events_chi2(sf_dir: str):
    """Chi-squared independence test between event type and user-id
    parity (the A/B-bucket shape): exact contingency counts in one
    domain-sized exchange, the statistic in a single task, 9-dp
    rounding absorbing only the cross-cell summation-order ULPs
    (functions/analytics.py::chi2_independence)."""
    from kafka_connect_mongo_ray.functions.analytics import (
        chi2_independence,
    )

    def prep(t: pa.Table) -> pa.Table:
        par = np.asarray(t["user_id"], dtype=np.int64) % 2
        return pa.table({"event_type": t["event_type"],
                         "par": pa.array(par, pa.int64())})

    ds = _read(sf_dir, "events",
               columns=["event_type", "user_id"]).map_batches(
        prep, batch_format="pyarrow")
    return chi2_independence(ds, a_col="event_type", b_col="par",
                             num_partitions=_gate_buckets())


def q_cdc_incremental_view(sf_dir: str):
    """Incremental view maintenance (state/ivm.py): the per-repo
    (n_live, total_chars) aggregate built purely from change-feed
    DELTAS across the backfill (v1) and tail (v2) windows — the final
    snapshot is never rescanned. Retractions are null-driven (pre-image
    vs post-image live-ness), each window's work is COW-bounded to
    changed buckets, and every exchange is group-domain-sized. The
    oracle recomputes the same aggregate analytically over the final
    live set."""
    import hashlib
    import shutil

    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.cdc import run_replay
    from kafka_connect_mongo_ray.state.ivm import maintain_group_aggregate

    root = f"/tmp/kcm_ivmq_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    shutil.rmtree(root, ignore_errors=True)
    cfg = EngineConfig(snapshot_dir=f"{root}/s", checkpoint_dir=f"{root}/c",
                       num_buckets=16)
    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang", "source"])
    run_replay(docs.map_batches(_backfill_events, batch_format="pyarrow"),
               cfg)
    docs2 = _read(sf_dir, "documents",
                  columns=["doc_id", "text", "lang", "source"])
    run_replay(docs2.map_batches(_tail_events, batch_format="pyarrow"), cfg)
    from kafka_connect_mongo_ray.state.ivm import (
        METRIC_CHARS,
        METRIC_TOKENS,
    )

    return maintain_group_aggregate(
        cfg.snapshot_dir, [0, 1, 2], num_partitions=_gate_buckets(8),
        metrics={"total_chars": METRIC_CHARS, "n_tokens": METRIC_TOKENS})


def q_cdc_incremental_moments(sf_dir: str):
    """Incrementally-maintained MEAN and VARIANCE (state/ivm.py::
    MOMENT_METRICS + derive_moments): the per-repo (n, Σchars,
    Σchars²) state is folded from change-feed deltas only — second
    moments are SUM-decomposable, so retractions stay
    subtraction-only — and the derived stats are computed at read
    time from the exact int64 sums (single-division operand order,
    mirrored by the oracle)."""
    import hashlib
    import shutil

    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.cdc import run_replay
    from kafka_connect_mongo_ray.state.ivm import (
        MOMENT_METRICS,
        derive_moments,
        maintain_group_aggregate,
    )

    root = f"/tmp/kcm_ivmm_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    shutil.rmtree(root, ignore_errors=True)
    cfg = EngineConfig(snapshot_dir=f"{root}/s", checkpoint_dir=f"{root}/c",
                       num_buckets=16)
    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang", "source"])
    run_replay(docs.map_batches(_backfill_events, batch_format="pyarrow"),
               cfg)
    docs2 = _read(sf_dir, "documents",
                  columns=["doc_id", "text", "lang", "source"])
    run_replay(docs2.map_batches(_tail_events, batch_format="pyarrow"), cfg)
    state = maintain_group_aggregate(
        cfg.snapshot_dir, [0, 1, 2], num_partitions=_gate_buckets(8),
        metrics=MOMENT_METRICS)
    return state.map_batches(derive_moments, batch_format="pyarrow")


def q_cdc_state_as_of(sf_dir: str):
    """Point-in-time state read BY TIMESTAMP (the log-position
    complement of version-based cdc_time_travel): LWW replay of only
    the change events at or before the cutoff position — "the table
    as consumers saw it at ts=1002". The cutoff filter pushes into the
    batch map (rows drop before the bucket shuffle), so the replay
    cost is the PREFIX of the log, not the whole stream."""
    from kafka_connect_mongo_ray.pipelines.cdc import replay_collect

    cutoff = 1002

    def upto(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less_equal(batch["ts"],
                                          pa.scalar(cutoff, pa.int64())))

    ds = doc_change_events(sf_dir).map_batches(upto, batch_format="pyarrow")
    out = replay_collect(ds, num_buckets=16)
    return out.select_columns(["repo", "path", "lang", "content"])


def q_cdc_secondary_lookup(sf_dir: str):
    """Persisted attribute→key secondary index (state/
    secondary_index.py): built incrementally from the change feeds of
    the backfill and tail windows (signed postings from pre/post
    images — a lang change moves the key, a tombstone retracts it),
    then one single-bucket lookup answers "every live 'fr' document"
    without scanning the table. The oracle recomputes the same
    membership analytically over the final live set."""
    import hashlib
    import shutil

    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.cdc import run_replay
    from kafka_connect_mongo_ray.state.secondary_index import SecondaryIndex

    root = f"/tmp/kcm_sidxq_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    shutil.rmtree(root, ignore_errors=True)
    cfg = EngineConfig(snapshot_dir=f"{root}/s", checkpoint_dir=f"{root}/c",
                       num_buckets=16)
    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang", "source"])
    run_replay(docs.map_batches(_backfill_events, batch_format="pyarrow"),
               cfg)
    docs2 = _read(sf_dir, "documents",
                  columns=["doc_id", "text", "lang", "source"])
    run_replay(docs2.map_batches(_tail_events, batch_format="pyarrow"), cfg)
    idx = SecondaryIndex(f"{root}/idx", column="lang",
                         num_buckets=_gate_buckets(8))
    idx.apply_window(cfg.snapshot_dir, 0, 1)
    idx.apply_window(cfg.snapshot_dir, 1, 2)
    return idx.lookup("fr")


def q_cdc_incremental_distinct(sf_dir: str):
    """Incrementally-maintained per-value DISTINCT-KEY counts — the
    retraction-safe distinct that HLL cannot give (deletions break
    sketches): the secondary index's signed postings ARE the
    per-(value, key) state, so ``counts()`` folds net>0 membership per
    value in a triple-bucketed pass. Maintained across the backfill
    and tail windows like cdc_secondary_lookup; the oracle recomputes
    COUNT(DISTINCT key) per value over the final live set."""
    import hashlib
    import shutil

    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.cdc import run_replay
    from kafka_connect_mongo_ray.state.secondary_index import SecondaryIndex

    root = f"/tmp/kcm_sidxd_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    shutil.rmtree(root, ignore_errors=True)
    cfg = EngineConfig(snapshot_dir=f"{root}/s", checkpoint_dir=f"{root}/c",
                       num_buckets=16)
    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang", "source"])
    run_replay(docs.map_batches(_backfill_events, batch_format="pyarrow"),
               cfg)
    docs2 = _read(sf_dir, "documents",
                  columns=["doc_id", "text", "lang", "source"])
    run_replay(docs2.map_batches(_tail_events, batch_format="pyarrow"), cfg)
    idx = SecondaryIndex(f"{root}/idx", column="lang",
                         num_buckets=_gate_buckets(8))
    idx.apply_window(cfg.snapshot_dir, 0, 1)
    idx.apply_window(cfg.snapshot_dir, 1, 2)
    return idx.counts()


def q_events_attribution(sf_dir: str):
    """Stream-stream windowed join (stages/join.py::window_join): every
    (purchase, click) pair of the same user with the click in the hour
    before the purchase — the ad-attribution shape. One key-bucketed
    shuffle per side; vectorized composite-searchsorted window bounds
    and cumsum/arange pair expansion inside each bucket."""
    from kafka_connect_mongo_ray.stages.join import window_join

    def typed(tp, id_name):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["event_type"], tp))
            return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                             id_name: t["event_id"]})
        return fn

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])
    purchases = ev.map_batches(typed("purchase", "purchase_id"),
                               batch_format="pyarrow")
    clicks = ev.map_batches(typed("click", "click_id"),
                            batch_format="pyarrow")
    return window_join(purchases, clicks, key_col="user_id", ts_col="ts",
                       left_id="purchase_id", right_id="click_id",
                       before_us=3_600_000_000, after_us=0,
                       num_buckets=_gate_buckets())


def q_events_except_all_views(sf_dir: str):
    """Bag-semantics EXCEPT ALL (functions/setops.py::set_op_all): one
    row per SURPLUS view — a user with 5 views and 2 clicks appears 3
    times. Batch-local key counts bound the one exchange at
    distinct-keys-per-block; multiplicities replicate via np.repeat."""
    from kafka_connect_mongo_ray.functions.setops import set_op_all

    def typed(tp):
        def fn(t: pa.Table) -> pa.Table:
            return (t.filter(pc.equal(t["event_type"], tp))
                    .select(["user_id"]))
        return fn

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    views = ev.map_batches(typed("view"), batch_format="pyarrow")
    clicks = ev.map_batches(typed("click"), batch_format="pyarrow")
    return set_op_all(views, clicks, on=["user_id"], op="except_all",
                      num_buckets=_gate_buckets())


def q_docs_balanced_sample(sf_dir: str):
    """Per-source FIXED-SIZE balanced sample (functions/quantiles.py::
    balanced_sample_by_md5): exactly min(50, group size) docs per
    source by ascending md5(doc_id) — QUALIFY ROW_NUMBER() <= k over a
    deterministic hash order. Associative per-batch top-k bounds every
    block's output at groups×k rows; one group-bucketed merge."""
    from kafka_connect_mongo_ray.functions.quantiles import (
        balanced_sample_by_md5,
    )

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])
    out = balanced_sample_by_md5(docs, "doc_id", "source", k=50,
                                 num_partitions=_gate_buckets())
    return out.select_columns(["doc_id", "source"])


def q_events_throttle(sf_dir: str):
    """Rate-limit throttle (functions/ranking.py::throttle): drop an
    event when the same (user, type) fired within the previous minute
    — LAG-based, windowless, exactly SQL-mirrorable. One key-bucketed
    shuffle + segment arithmetic."""
    from kafka_connect_mongo_ray.functions.ranking import throttle

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "event_type": t["event_type"],
                         "ts_us": pc.cast(t["ts"], pa.int64()),
                         "event_id": t["event_id"]})

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts",
                        "event_id"]).map_batches(
        prep, batch_format="pyarrow")
    out = throttle(ds, keys=["user_id", "event_type"],
                   order_cols=["ts_us", "event_id"], ts_col="ts_us",
                   min_gap_us=60_000_000,
                   num_partitions=_gate_buckets())
    return out.select_columns(["event_id"])


def q_lineitem_profile(sf_dir: str):
    """Data profiling (ANALYZE TABLE shape): one streaming pass emits
    per-column {n, n_null, min, max} partials — trivially mergeable —
    and a domain-sized final reduce. Numeric columns of lineitem;
    min/max as float64 (selection-only, bit-exact)."""
    from ray.data.aggregate import Max, Min, Sum

    cols = ["l_quantity", "l_extendedprice", "l_discount"]

    def partial(t: pa.Table) -> pa.Table:
        out = {"column": [], "n": [], "n_null": [], "min_v": [],
               "max_v": []}
        for c in cols:
            a = t[c]
            out["column"].append(c)
            out["n"].append(len(a))
            out["n_null"].append(a.null_count)
            valid = pc.drop_null(a)
            out["min_v"].append(
                float(pc.min(valid).as_py()) if len(valid) else None)
            out["max_v"].append(
                float(pc.max(valid).as_py()) if len(valid) else None)
        return pa.table({
            "column": pa.array(out["column"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "n_null": pa.array(out["n_null"], pa.int64()),
            "min_v": pa.array(out["min_v"], pa.float64()),
            "max_v": pa.array(out["max_v"], pa.float64())})

    prof = (_read(sf_dir, "lineitem", columns=cols)
            .map_batches(partial, batch_format="pyarrow")
            .groupby("column", num_partitions=4)
            .aggregate(Sum("n", alias_name="n"),
                       Sum("n_null", alias_name="n_null"),
                       Min("min_v", alias_name="min_v"),
                       Max("max_v", alias_name="max_v")))

    def conform(t: pa.Table) -> pa.Table:
        return pa.table({"column": pc.cast(t["column"], pa.string()),
                         "n": pc.cast(t["n"], pa.int64()),
                         "n_null": pc.cast(t["n_null"], pa.int64()),
                         "min_v": pc.cast(t["min_v"], pa.float64()),
                         "max_v": pc.cast(t["max_v"], pa.float64())})

    return prof.map_batches(conform, batch_format="pyarrow")


def q_cdc_time_travel(sf_dir: str):
    """Explicit time-travel read: after the backfill (v1) AND tail
    (v2) commits, read version 1 AS OF — the pre-tail state, every doc
    at its original text, tombstones-to-come still live. The COW
    manifest makes the old version a first-class read
    (pipelines/cdc.py::final_state_dataset(version=)); the oracle is
    the analytic backfill state."""
    import hashlib
    import shutil

    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.cdc import (
        final_state_dataset,
        run_replay,
    )

    root = f"/tmp/kcm_ttq_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    shutil.rmtree(root, ignore_errors=True)
    cfg = EngineConfig(snapshot_dir=f"{root}/s", checkpoint_dir=f"{root}/c",
                       num_buckets=16)
    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang", "source"])
    run_replay(docs.map_batches(_backfill_events, batch_format="pyarrow"),
               cfg)
    docs2 = _read(sf_dir, "documents",
                  columns=["doc_id", "text", "lang", "source"])
    run_replay(docs2.map_batches(_tail_events, batch_format="pyarrow"), cfg)
    old = final_state_dataset(cfg, version=1)
    return old.map_batches(
        lambda t: t.select(["repo", "path", "content"]),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# TPC-H-shaped deep compositions (Q4/Q5/Q12/Q18/Q22 adapted to the
# fixture schema — it carries no commitdate/receiptdate/shipmode/phone
# columns, so each query keeps the REFERENCE QUERY's composition shape
# (existence join, 6-way star, conditional aggregate, having-join-back,
# scalar-threshold anti join) over the columns that exist. Every join
# is the bucketed hash_join; every aggregate pre-reduces inside the
# batch before its one exchange.


def q_tpch_late_ship_priority(sf_dir: str):
    """TPC-H Q4-shaped existence join: orders placed in 1997 with at
    least one lineitem shipped >90 days after the order date, counted
    per priority. EXISTS(l_shipdate > o_orderdate + 90d) collapses to
    max(l_shipdate) per orderkey — a batch-local max then one
    orderkey-distinct-bounded exchange — so the join ships one row per
    order, not one per lineitem."""
    from ray.data.aggregate import Max, Sum

    from kafka_connect_mongo_ray.stages.join import hash_join

    LO = np.datetime64("1997-01-01").astype("datetime64[us]").item()
    HI = np.datetime64("1998-01-01").astype("datetime64[us]").item()
    NINETY_US = 90 * 86_400_000_000

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def li_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"o_orderkey": batch["l_orderkey"],
                      "ship_us": pc.cast(batch["l_shipdate"], pa.int64())})
        return t.group_by("o_orderkey").aggregate(
            [("ship_us", "max")]).rename_columns(["o_orderkey", "ship_us"])

    maxship = li.map_batches(li_partial, batch_format="pyarrow").groupby(
        "o_orderkey").aggregate(Max("ship_us", alias_name="ship_us"))

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def in_window(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(batch["o_orderdate"], pa.scalar(LO)),
                       pc.less(batch["o_orderdate"], pa.scalar(HI)))
        b = batch.filter(keep)
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "date_us": pc.cast(b["o_orderdate"], pa.int64()),
                         "o_orderpriority": b["o_orderpriority"]})

    joined = hash_join(orders.map_batches(in_window, batch_format="pyarrow"),
                       maxship, on=["o_orderkey"],
                       num_buckets=_gate_buckets())

    def late_partial(batch: pa.Table) -> pa.Table:
        ship = np.asarray(batch["ship_us"], dtype=np.int64)
        date = np.asarray(batch["date_us"], dtype=np.int64)
        b = batch.filter(pa.array(ship > date + NINETY_US))
        g = b.group_by("o_orderpriority").aggregate([([], "count_all")])
        return g.rename_columns(["o_orderpriority", "n_late"])

    agg = joined.map_batches(late_partial, batch_format="pyarrow").groupby(
        "o_orderpriority").aggregate(Sum("n_late", alias_name="n_late"))
    return agg.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("n_late"), "n_late",
                               pc.cast(t["n_late"], pa.int64())),
        batch_format="pyarrow")


# supplier broadcast guard for q_tpch_regional_revenue: below this many
# rows the suppkey→nationkey dict (two ints per row, ~16 B) ships once
# via ray.put; above it the supplier side becomes a third bucketed join
_SUPP_BROADCAST_MAX_ROWS = 2_000_000


def q_tpch_regional_revenue(sf_dir: str, force_bucketed: bool = False):
    """TPC-H Q5-shaped 6-way star: revenue by (region, nation) where
    the supplying supplier and the ordering customer share a nation,
    orders placed 1996–1997. Revenue is int cents × (100−disc) so the
    oracle match is exact; nation⋈region (fixed 25×5 rows) attaches to
    the nationkey-sized FINAL aggregate driver-side.

    TWO size-guarded plans (the PageRank/Q2 broadcast-state rule, both
    pinned equal by test):

    - BROADCAST-STATE (customer, date-windowed orders, and supplier all
      under `_SUPP_BROADCAST_MAX_ROWS`): the orderkey→customer-nation
      and suppkey→supplier-nation maps ship once as sorted numpy array
      pairs (``ray.put``), and ONE searchsorted pass over lineitem does
      both hops, the nation-equality filter, and a 25-row batch-local
      partial — the only exchange is the nationkey-domain groupby-sum.
      Measured at sf0.1/32 CPUs: 20–26 s as three chained lazy joins →
      6.4 s with one broadcast + staging → ~1.5 s with this plan.
    - BUCKETED fallback (any side above the guard): two bucketed fact
      joins (orders⋈customer on custkey, lineitem⋈that on orderkey)
      with the first STAGED between the all-to-alls (the NEXT.md #2
      lazy-multi-shuffle starvation rule; the staged intermediate is
      two int64 columns of the date-windowed orders — narrow and
      object-store-spillable), supplier side broadcast under its own
      guard else a third bucketed join."""
    import ray
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.stages.join import hash_join

    LO = np.datetime64("1996-01-01").astype("datetime64[us]").item()
    HI = np.datetime64("1998-01-01").astype("datetime64[us]").item()

    def attach_names(agg):
        import pyarrow.parquet as pq

        nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
        reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
        names = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")

        def attach(t: pa.Table) -> pa.Table:
            df = t.to_pandas().merge(
                names[["n_nationkey", "n_name", "r_name"]],
                left_on="c_nationkey", right_on="n_nationkey")
            out = df[["r_name", "n_name", "revenue_cents"]].copy()
            out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
            return pa.Table.from_pandas(out, preserve_index=False)

        return agg.map_batches(attach, batch_format="pyarrow")

    small = (not force_bucketed
             and _table_rows(sf_dir, "supplier") <= _SUPP_BROADCAST_MAX_ROWS
             and _table_rows(sf_dir, "customer") <= _SUPP_BROADCAST_MAX_ROWS
             and _table_rows(sf_dir, "orders") <= _SUPP_BROADCAST_MAX_ROWS)
    if small:
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        ot = pads.dataset(f"{sf_dir}/orders.parquet").to_table(
            columns=["o_orderkey", "o_custkey"],
            filter=(pads.field("o_orderdate") >= LO)
            & (pads.field("o_orderdate") < HI))
        ct = pq.read_table(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
        ck = np.asarray(ct["c_custkey"], dtype=np.int64)
        cn = np.asarray(ct["c_nationkey"], dtype=np.int64)
        o = np.argsort(ck)
        ck, cn = ck[o], cn[o]
        ok = np.asarray(ot["o_orderkey"], dtype=np.int64)
        oc = np.asarray(ot["o_custkey"], dtype=np.int64)
        p = np.minimum(np.searchsorted(ck, oc), len(ck) - 1)
        hit = ck[p] == oc  # inner-join semantics: orphan orders drop
        ok, onat = ok[hit], cn[p[hit]]
        o = np.argsort(ok)
        ok, onat = ok[o], onat[o]
        st = pq.read_table(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"])
        sk = np.asarray(st["s_suppkey"], dtype=np.int64)
        sn = np.asarray(st["s_nationkey"], dtype=np.int64)
        o = np.argsort(sk)
        sk, sn = sk[o], sn[o]
        if len(ok) == 0 or len(sk) == 0:
            # an empty broadcast map makes the clipped searchsorted
            # index with -1 on an empty array — and the join result is
            # definitionally empty anyway
            import ray.data as rd

            return rd.from_arrow(pa.table({
                "r_name": pa.array([], pa.string()),
                "n_name": pa.array([], pa.string()),
                "revenue_cents": pa.array([], pa.int64())}))
        maps_ref = ray.put((ok, onat, sk, sn))

        def li_pass(batch: pa.Table) -> pa.Table:
            okeys, onats, skeys, snats = ray.get(maps_ref)
            lok = np.asarray(batch["l_orderkey"], dtype=np.int64)
            p = np.minimum(np.searchsorted(okeys, lok), len(okeys) - 1)
            in_window = okeys[p] == lok
            lsk = np.asarray(batch["l_suppkey"], dtype=np.int64)
            q = np.minimum(np.searchsorted(skeys, lsk), len(skeys) - 1)
            has_supp = skeys[q] == lsk
            keep = in_window & has_supp & (onats[p] == snats[q])
            cents = np.rint(np.asarray(batch["l_extendedprice"],
                                       dtype=np.float64)[keep]
                            * 100).astype(np.int64)
            disc = np.rint(np.asarray(batch["l_discount"],
                                      dtype=np.float64)[keep]
                           * 100).astype(np.int64)
            rev = cents * (100 - disc)
            nat = onats[p][keep]
            o = np.argsort(nat, kind="stable")
            nat, rev = nat[o], rev[o]
            starts = np.flatnonzero(np.r_[True, nat[1:] != nat[:-1]]) \
                if len(nat) else np.array([], dtype=np.int64)
            sums = (np.add.reduceat(rev, starts) if len(starts)
                    else np.array([], dtype=np.int64))
            return pa.table({
                "c_nationkey": pa.array(nat[starts], pa.int64()),
                "revenue_cents": pa.array(sums, pa.int64())})

        li = _read(sf_dir, "lineitem",
                   columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                            "l_discount"])
        agg = (li.map_batches(li_pass, batch_format="pyarrow")
               .groupby("c_nationkey")
               .aggregate(Sum("revenue_cents", alias_name="revenue_cents")))
        return attach_names(agg)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
                 ).map_batches(
        lambda t: pa.table({"o_custkey": t["c_custkey"],
                            "c_nationkey": pc.cast(t["c_nationkey"],
                                                   pa.int64())}),
        batch_format="pyarrow")

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_window(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(batch["o_orderdate"], pa.scalar(LO)),
                       pc.less(batch["o_orderdate"], pa.scalar(HI)))
        return batch.filter(keep).select(["o_orderkey", "o_custkey"])

    cust_orders = hash_join(
        orders.map_batches(o_window, batch_format="pyarrow"), cust,
        on=["o_custkey"], num_buckets=_gate_buckets(),
    ).map_batches(lambda t: t.select(["o_orderkey", "c_nationkey"]),
                  batch_format="pyarrow").materialize()

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])
    small_supplier = _table_rows(sf_dir, "supplier") <= _SUPP_BROADCAST_MAX_ROWS

    if small_supplier:
        import pyarrow.parquet as pq

        st = pq.read_table(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"])
        supp_ref = ray.put(dict(zip(st["s_suppkey"].to_pylist(),
                                    (int(v) for v in
                                     st["s_nationkey"].to_pylist()))))

    def li_prep(batch: pa.Table) -> pa.Table:
        cents = np.rint(np.asarray(batch["l_extendedprice"],
                                   dtype=np.float64) * 100).astype(np.int64)
        disc = np.rint(np.asarray(batch["l_discount"],
                                  dtype=np.float64) * 100).astype(np.int64)
        cols = {"o_orderkey": batch["l_orderkey"],
                "rev": pa.array(cents * (100 - disc))}
        if small_supplier:
            smap = ray.get(supp_ref)
            sk = np.asarray(batch["l_suppkey"], dtype=np.int64)
            cols["s_nationkey"] = pa.array(
                pd.Series(sk).map(smap).to_numpy(dtype=np.int64))
        else:
            cols["l_suppkey"] = batch["l_suppkey"]
        return pa.table(cols)

    li_orders = hash_join(li.map_batches(li_prep, batch_format="pyarrow"),
                          cust_orders, on=["o_orderkey"],
                          num_buckets=_gate_buckets())

    if not small_supplier:
        supp = _read(sf_dir, "supplier",
                     columns=["s_suppkey", "s_nationkey"]).map_batches(
            lambda t: pa.table({"l_suppkey": t["s_suppkey"],
                                "s_nationkey": pc.cast(t["s_nationkey"],
                                                       pa.int64())}),
            batch_format="pyarrow")
        li_orders = hash_join(
            li_orders.map_batches(
                lambda t: t.select(["l_suppkey", "c_nationkey", "rev"]),
                batch_format="pyarrow"),
            supp, on=["l_suppkey"], num_buckets=_gate_buckets())

    def rev_partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch["c_nationkey"],
                                  batch["s_nationkey"]))
        g = pa.table({"c_nationkey": b["c_nationkey"], "rev": b["rev"]}
                     ).group_by("c_nationkey").aggregate([("rev", "sum")])
        return g.rename_columns(["c_nationkey", "revenue_cents"])

    agg = li_orders.map_batches(rev_partial, batch_format="pyarrow").groupby(
        "c_nationkey").aggregate(Sum("revenue_cents",
                                     alias_name="revenue_cents"))
    return attach_names(agg)


def _broadcast_or_none(sf_dir: str, table: str, ref_builder):
    """ray.put a small-side lookup built by ``ref_builder`` when the
    table is under the broadcast guard; None means the caller must take
    its bucketed-join fallback (the `_SUPP_BROADCAST_MAX_ROWS` rule)."""
    import ray

    if _table_rows(sf_dir, table) > _SUPP_BROADCAST_MAX_ROWS:
        return None
    return ray.put(ref_builder())


def q_tpch_market_share(sf_dir: str):
    """TPC-H Q8-shaped market share: within ASIA-region customers'
    1996–1997 orders of PROMO parts, the revenue delivered by suppliers
    of one nation (nationkey 2) vs ALL revenue, per order year. The
    share ships as the TWO int-cent sums (nation_rev_cents,
    total_rev_cents) — no division crosses the engine boundary (the
    Q22 scalar rule). Plan shape: nation/region resolve driver-side to
    a 5-int nation set (a literal filter on customer); PROMO partkeys
    and the suppkey→nationkey map are size-guarded broadcasts with
    bucketed-join fallbacks; the one staged intermediate is the narrow
    date-windowed orders⋈customer output (the Q5 staging rule); the
    final exchange is year-domain-sized after batch-local pre-agg."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.stages.join import hash_join

    LO = np.datetime64("1996-01-01").astype("datetime64[us]").item()
    HI = np.datetime64("1998-01-01").astype("datetime64[us]").item()
    TARGET_NATION = 2

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    asia = set(nat.merge(reg[reg.r_name == "ASIA"], left_on="n_regionkey",
                         right_on="r_regionkey")["n_nationkey"].astype(int))

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
                 ).map_batches(
        lambda t: pa.table({"o_custkey": t.filter(
            pc.is_in(pc.cast(t["c_nationkey"], pa.int64()),
                     pa.array(sorted(asia), pa.int64())))["c_custkey"]}),
        batch_format="pyarrow")

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_window(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(batch["o_orderdate"], pa.scalar(LO)),
                       pc.less(batch["o_orderdate"], pa.scalar(HI)))
        b = batch.filter(keep)
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "o_custkey": b["o_custkey"],
                         "o_year": pc.cast(pc.year(b["o_orderdate"]),
                                           pa.int64())})

    cust_orders = hash_join(
        orders.map_batches(o_window, batch_format="pyarrow"), cust,
        on=["o_custkey"], num_buckets=_gate_buckets(),
    ).map_batches(lambda t: t.select(["o_orderkey", "o_year"]),
                  batch_format="pyarrow").materialize()

    part_ref = _broadcast_or_none(
        sf_dir, "part",
        lambda: set(pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"],
            filters=[("p_type", "==", "PROMO")])["p_partkey"].to_pylist()))
    supp_ref = _broadcast_or_none(
        sf_dir, "supplier",
        lambda: dict(zip(
            (t := pq.read_table(f"{sf_dir}/supplier.parquet",
                                columns=["s_suppkey", "s_nationkey"])
             )["s_suppkey"].to_pylist(),
            (int(v) for v in t["s_nationkey"].to_pylist()))))

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_extendedprice", "l_discount"])

    def li_prep(batch: pa.Table) -> pa.Table:
        if part_ref is not None:
            keys = ray.get(part_ref)
            pk = np.asarray(batch["l_partkey"], dtype=np.int64)
            batch = batch.filter(pa.array(
                pd.Series(pk).isin(keys).to_numpy()))
        cols = {"o_orderkey": batch["l_orderkey"]}
        if part_ref is None:
            cols["l_partkey"] = batch["l_partkey"]
        cents = np.rint(np.asarray(batch["l_extendedprice"],
                                   dtype=np.float64) * 100).astype(np.int64)
        disc = np.rint(np.asarray(batch["l_discount"],
                                  dtype=np.float64) * 100).astype(np.int64)
        cols["rev"] = pa.array(cents * (100 - disc))
        if supp_ref is not None:
            smap = ray.get(supp_ref)
            sk = np.asarray(batch["l_suppkey"], dtype=np.int64)
            cols["s_nationkey"] = pa.array(
                pd.Series(sk).map(smap).to_numpy(dtype=np.int64))
        else:
            cols["l_suppkey"] = batch["l_suppkey"]
        return pa.table(cols)

    li = li.map_batches(li_prep, batch_format="pyarrow")
    if part_ref is None:
        promo = _read(sf_dir, "part", columns=["p_partkey", "p_type"]
                      ).map_batches(
            lambda t: pa.table({"l_partkey": t.filter(
                pc.equal(t["p_type"], pa.scalar("PROMO")))["p_partkey"]}),
            batch_format="pyarrow")
        li = hash_join(li, promo, on=["l_partkey"], how="semi",
                       num_buckets=_gate_buckets())
    if supp_ref is None:
        supp = _read(sf_dir, "supplier",
                     columns=["s_suppkey", "s_nationkey"]).map_batches(
            lambda t: pa.table({"l_suppkey": t["s_suppkey"],
                                "s_nationkey": pc.cast(t["s_nationkey"],
                                                       pa.int64())}),
            batch_format="pyarrow")
        li = hash_join(li, supp, on=["l_suppkey"],
                       num_buckets=_gate_buckets())

    joined = hash_join(li, cust_orders, on=["o_orderkey"],
                       num_buckets=_gate_buckets())

    def share_partial(batch: pa.Table) -> pa.Table:
        yr = np.asarray(batch["o_year"], dtype=np.int64)
        rev = np.asarray(batch["rev"], dtype=np.int64)
        is_n = np.asarray(batch["s_nationkey"],
                          dtype=np.int64) == TARGET_NATION
        df = pd.DataFrame({"o_year": yr,
                           "nation_rev_cents": np.where(is_n, rev, 0),
                           "total_rev_cents": rev})
        g = df.groupby("o_year", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (joined.map_batches(share_partial, batch_format="pyarrow")
            .groupby("o_year")
            .aggregate(Sum("nation_rev_cents", alias_name="nation_rev_cents"),
                       Sum("total_rev_cents", alias_name="total_rev_cents"))
            .map_batches(lambda t: pa.table({
                "o_year": t["o_year"],
                "nation_rev_cents": pc.cast(t["nation_rev_cents"],
                                            pa.int64()),
                "total_rev_cents": pc.cast(t["total_rev_cents"],
                                           pa.int64())}),
                         batch_format="pyarrow"))


def q_tpch_product_profit(sf_dir: str):
    """TPC-H Q9-shaped product-line profit by (supplier nation, order
    year) over parts whose name contains 'red'. Without a partsupp
    table (not in the testdata inventory) the cost side is the
    retail-price proxy: profit_cents = cents(extprice)·(100−disc) −
    cents(retailprice)·qty·100 — pure int64 arithmetic mirrored
    verbatim in the oracle. part (name-filtered, carrying its
    retail-cents payload) and supplier (suppkey→nationkey) are
    size-guarded broadcasts with bucketed-join fallbacks; orders
    attaches per year through ONE bucketed orderkey join; the final
    exchange is (nation × year)-domain-sized after batch-local
    pre-aggregation."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.stages.join import hash_join

    def build_part_map():
        t = pq.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_name", "p_retailprice"])
        t = t.filter(pc.match_substring(t["p_name"], "red"))
        cents = np.rint(np.asarray(t["p_retailprice"],
                                   dtype=np.float64) * 100).astype(np.int64)
        return dict(zip(t["p_partkey"].to_pylist(), (int(c) for c in cents)))

    part_ref = _broadcast_or_none(sf_dir, "part", build_part_map)
    supp_ref = _broadcast_or_none(
        sf_dir, "supplier",
        lambda: dict(zip(
            (t := pq.read_table(f"{sf_dir}/supplier.parquet",
                                columns=["s_suppkey", "s_nationkey"])
             )["s_suppkey"].to_pylist(),
            (int(v) for v in t["s_nationkey"].to_pylist()))))

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_quantity", "l_extendedprice", "l_discount"])

    def li_prep(batch: pa.Table) -> pa.Table:
        cols: dict = {}
        retail_c = None
        if part_ref is not None:
            pmap = ray.get(part_ref)
            pk = pd.Series(np.asarray(batch["l_partkey"], dtype=np.int64))
            retail = pk.map(pmap)
            batch = batch.filter(pa.array(retail.notna().to_numpy()))
            retail_c = retail.dropna().to_numpy(dtype=np.int64)
        else:
            cols["l_partkey"] = batch["l_partkey"]
        rev = (np.rint(np.asarray(batch["l_extendedprice"],
                                  dtype=np.float64) * 100).astype(np.int64)
               * (100 - np.rint(np.asarray(batch["l_discount"],
                                           dtype=np.float64) * 100
                                ).astype(np.int64)))
        qty = np.rint(np.asarray(batch["l_quantity"],
                                 dtype=np.float64)).astype(np.int64)
        cols["o_orderkey"] = batch["l_orderkey"]
        if retail_c is not None:
            cols["profit_cents"] = pa.array(rev - retail_c * qty * 100)
        else:
            cols["rev"], cols["qty"] = pa.array(rev), pa.array(qty)
        if supp_ref is not None:
            smap = ray.get(supp_ref)
            sk = np.asarray(batch["l_suppkey"], dtype=np.int64)
            cols["s_nationkey"] = pa.array(
                pd.Series(sk).map(smap).to_numpy(dtype=np.int64))
        else:
            cols["l_suppkey"] = batch["l_suppkey"]
        return pa.table(cols)

    li = li.map_batches(li_prep, batch_format="pyarrow")
    if part_ref is None:
        red = _read(sf_dir, "part",
                    columns=["p_partkey", "p_name", "p_retailprice"]
                    ).map_batches(
            lambda t: (lambda f: pa.table({
                "l_partkey": f["p_partkey"],
                "retail_c": pa.array(np.rint(np.asarray(
                    f["p_retailprice"], dtype=np.float64) * 100
                ).astype(np.int64))}))(
                t.filter(pc.match_substring(t["p_name"], "red"))),
            batch_format="pyarrow")
        li = hash_join(li, red, on=["l_partkey"],
                       num_buckets=_gate_buckets()).map_batches(
            lambda t: pa.table({
                "o_orderkey": t["o_orderkey"],
                "profit_cents": pc.subtract(
                    t["rev"], pc.multiply(pc.multiply(
                        t["retail_c"], t["qty"]), pa.scalar(100))),
                **({"s_nationkey": t["s_nationkey"]}
                   if "s_nationkey" in t.schema.names
                   else {"l_suppkey": t["l_suppkey"]})}),
            batch_format="pyarrow")
    if supp_ref is None:
        supp = _read(sf_dir, "supplier",
                     columns=["s_suppkey", "s_nationkey"]).map_batches(
            lambda t: pa.table({"l_suppkey": t["s_suppkey"],
                                "s_nationkey": pc.cast(t["s_nationkey"],
                                                       pa.int64())}),
            batch_format="pyarrow")
        li = hash_join(li, supp, on=["l_suppkey"],
                       num_buckets=_gate_buckets())

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]
                   ).map_batches(
        lambda t: pa.table({"o_orderkey": t["o_orderkey"],
                            "o_year": pc.cast(pc.year(t["o_orderdate"]),
                                              pa.int64())}),
        batch_format="pyarrow")
    joined = hash_join(li, orders, on=["o_orderkey"],
                       num_buckets=_gate_buckets())

    def profit_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "s_nationkey": np.asarray(batch["s_nationkey"], dtype=np.int64),
            "o_year": np.asarray(batch["o_year"], dtype=np.int64),
            "profit_cents": np.asarray(batch["profit_cents"],
                                       dtype=np.int64)})
        return pa.Table.from_pandas(
            df.groupby(["s_nationkey", "o_year"], as_index=False).sum(),
            preserve_index=False)

    agg = (joined.map_batches(profit_partial, batch_format="pyarrow")
           .groupby(["s_nationkey", "o_year"])
           .aggregate(Sum("profit_cents", alias_name="profit_cents")))

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nmap = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    def attach(t: pa.Table) -> pa.Table:
        nk = np.asarray(t["s_nationkey"], dtype=np.int64)
        return pa.table({
            "n_name": pa.array([nmap[int(k)] for k in nk], pa.string()),
            "o_year": t["o_year"],
            "profit_cents": pc.cast(t["profit_cents"], pa.int64())})

    return agg.map_batches(attach, batch_format="pyarrow")


def q_tpch_priority_linestatus_mix(sf_dir: str):
    """TPC-H Q12-shaped conditional aggregate: lineitems shipped
    1997–1998 joined back to their order's priority, counted per
    linestatus split high (URGENT/HIGH) vs low. One bucketed join on
    orderkey; both counts pre-reduce per batch."""
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.stages.join import hash_join

    LO = np.datetime64("1997-01-01").astype("datetime64[us]").item()
    HI = np.datetime64("1999-01-01").astype("datetime64[us]").item()

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority"]).map_batches(
        lambda t: pa.table({
            "o_orderkey": t["o_orderkey"],
            "is_high": pc.cast(pc.is_in(
                t["o_orderpriority"],
                value_set=pa.array(["1-URGENT", "2-HIGH"])), pa.int64())}),
        batch_format="pyarrow")

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linestatus", "l_shipdate"])

    def li_window(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(batch["l_shipdate"], pa.scalar(LO)),
                       pc.less(batch["l_shipdate"], pa.scalar(HI)))
        b = batch.filter(keep)
        return pa.table({"o_orderkey": b["l_orderkey"],
                         "l_linestatus": b["l_linestatus"]})

    joined = hash_join(li.map_batches(li_window, batch_format="pyarrow"),
                       orders, on=["o_orderkey"],
                       num_buckets=_gate_buckets())

    def mix_partial(batch: pa.Table) -> pa.Table:
        g = pa.table({"l_linestatus": batch["l_linestatus"],
                      "is_high": batch["is_high"]}
                     ).group_by("l_linestatus").aggregate(
            [("is_high", "sum"), ([], "count_all")])
        g = g.rename_columns(["l_linestatus", "hi", "n"])
        return g.append_column(
            "lo", pc.subtract(g["n"], g["hi"])).drop_columns(["n"])

    agg = joined.map_batches(mix_partial, batch_format="pyarrow").groupby(
        "l_linestatus").aggregate(
        Sum("hi", alias_name="high_line_count"),
        Sum("lo", alias_name="low_line_count"))
    return agg.map_batches(
        lambda t: pa.table({
            "l_linestatus": t["l_linestatus"],
            "high_line_count": pc.cast(t["high_line_count"], pa.int64()),
            "low_line_count": pc.cast(t["low_line_count"], pa.int64())}),
        batch_format="pyarrow")


def q_tpch_large_orders(sf_dir: str):
    """TPC-H Q18-shaped having-join-back: orders whose total lineitem
    quantity exceeds 200, joined back to the order row and its
    customer's name. The HAVING side is a batch-local int-quantity
    pre-sum then one orderkey exchange; only qualifying keys (a tiny
    fraction) flow into the two bucketed joins."""
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.stages.join import hash_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def qty_partial(batch: pa.Table) -> pa.Table:
        qty = np.rint(np.asarray(batch["l_quantity"],
                                 dtype=np.float64)).astype(np.int64)
        t = pa.table({"o_orderkey": batch["l_orderkey"],
                      "sum_qty": pa.array(qty)})
        return t.group_by("o_orderkey").aggregate(
            [("sum_qty", "sum")]).rename_columns(["o_orderkey", "sum_qty"])

    big = li.map_batches(qty_partial, batch_format="pyarrow").groupby(
        "o_orderkey").aggregate(Sum("sum_qty", alias_name="sum_qty")
                                ).map_batches(
        lambda t: pa.table({
            "o_orderkey": t["o_orderkey"],
            "sum_qty": pc.cast(t["sum_qty"], pa.int64())}).filter(
            pc.greater(pc.cast(t["sum_qty"], pa.int64()), pa.scalar(200))),
        batch_format="pyarrow")

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_totalprice"]).map_batches(
        lambda t: pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "o_orderdate": t["o_orderdate"],
            "total_cents": pa.array(np.rint(np.asarray(
                t["o_totalprice"], dtype=np.float64) * 100
            ).astype(np.int64))}),
        batch_format="pyarrow")

    j1 = hash_join(big, orders, on=["o_orderkey"],
                   num_buckets=_gate_buckets())
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"]
                 ).map_batches(
        lambda t: pa.table({"o_custkey": t["c_custkey"],
                            "c_name": t["c_name"]}),
        batch_format="pyarrow")
    return hash_join(j1, cust, on=["o_custkey"],
                     num_buckets=_gate_buckets())


def q_tpch_lapsed_rich_customers(sf_dir: str):
    """TPC-H Q22-shaped scalar-threshold anti join: customers whose
    balance exceeds the mean positive balance and who placed NO order
    since 1999, counted per nation. The threshold comparison is kept
    EXACT across engines by cross-multiplying (bal × count > sum of
    floor-dollars — identical double ops on identical ints both sides,
    no division); the anti side ships deduplicated recent-order keys
    only."""
    from ray.data.aggregate import Count, Sum

    from kafka_connect_mongo_ray.stages.join import hash_join

    CUT = np.datetime64("1999-01-01").astype("datetime64[us]").item()

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey", "c_acctbal"])

    # global scalar: sum of floor-dollars and count over positive
    # balances — an exact-int reduction, two numbers to the driver
    pos = cust.map_batches(
        lambda t: pa.table({"fl": pc.cast(pc.floor(t.filter(
            pc.greater(t["c_acctbal"],
                       pa.scalar(0.0)))["c_acctbal"]), pa.int64())}),
        batch_format="pyarrow")
    stats = pos.aggregate(Sum("fl", alias_name="s"),
                          Count(alias_name="n"))
    s_total = float(stats["s"])
    n_total = float(stats["n"])

    recent = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"]
                   ).map_batches(
        lambda t: pa.table({"c_custkey": t.filter(
            pc.greater_equal(t["o_orderdate"],
                             pa.scalar(CUT)))["o_custkey"]}),
        batch_format="pyarrow")

    def rich_only(batch: pa.Table) -> pa.Table:
        bal = np.asarray(batch["c_acctbal"], dtype=np.float64)
        return batch.filter(pa.array(bal * n_total > s_total))

    lapsed = hash_join(cust.map_batches(rich_only, batch_format="pyarrow"),
                       recent, on=["c_custkey"], how="anti",
                       num_buckets=_gate_buckets())

    def nat_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "c_nationkey": pc.cast(batch["c_nationkey"], pa.int64()),
            "fl": pc.cast(pc.floor(batch["c_acctbal"]), pa.int64())})
        g = t.group_by("c_nationkey").aggregate(
            [([], "count_all"), ("fl", "sum")])
        return g.rename_columns(["c_nationkey", "n_rich", "bal_floor"])

    agg = lapsed.map_batches(nat_partial, batch_format="pyarrow").groupby(
        "c_nationkey").aggregate(Sum("n_rich", alias_name="n_rich"),
                                 Sum("bal_floor", alias_name="bal_floor"))
    return agg.map_batches(
        lambda t: pa.table({
            "c_nationkey": t["c_nationkey"],
            "n_rich": pc.cast(t["n_rich"], pa.int64()),
            "bal_floor": pc.cast(t["bal_floor"], pa.int64())}),
        batch_format="pyarrow")


def q_events_hourly_gapfill(sf_dir: str):
    """Time-series resample with zero-fill: per (event_type, hour)
    counts densified over the FULL hour range — missing hours appear
    with n=0 (the gap-fill every downstream anomaly/forecast job
    needs; plain GROUP BY silently skips empty buckets). The fact scan
    pre-reduces per batch to (type, hour) partials before ONE
    domain-bounded exchange; densification runs driver-side on the
    aggregate because its size is types × wall-clock-hours — bounded
    by the time RANGE, not the data volume (a year is 8,760 rows per
    type at any SF)."""
    from ray.data.aggregate import Sum

    HOUR_US = 3_600_000_000
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        hr = np.asarray(pc.cast(batch["ts"], pa.int64())) // HOUR_US
        g = pa.table({"event_type": batch["event_type"],
                      "hour": pa.array(hr)}
                     ).group_by(["event_type", "hour"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", "hour", "n"])

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["event_type", "hour"]).aggregate(Sum("n", alias_name="n"))
    df = agg.to_pandas()
    lo, hi = int(df["hour"].min()), int(df["hour"].max())
    types = sorted(df["event_type"].unique())
    hours = np.arange(lo, hi + 1, dtype=np.int64)
    full = pd.DataFrame({
        "event_type": np.repeat(np.asarray(types, dtype=object),
                                hours.shape[0]),
        "hour": np.tile(hours, len(types))})
    out = full.merge(df, on=["event_type", "hour"], how="left")
    out["n"] = out["n"].fillna(0).astype(np.int64)
    out["hour_ts"] = pd.to_datetime(out["hour"] * HOUR_US, unit="us")
    return out[["event_type", "hour_ts", "n"]]


def q_tpch_returned_top_customers(sf_dir: str):
    """TPC-H Q10-shaped top-k join-back: revenue lost to returned
    ('R') lineitems on 1998 orders, per customer, top 20. Return
    revenue pre-sums per orderkey inside each batch, joins the
    windowed orders, re-sums per custkey (custkey-domain exchange),
    attaches names, and the top-20 runs as batch-local top-k + one
    dimension-sized final cut (the Q3 pattern)."""
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.stages.join import hash_join

    LO = np.datetime64("1998-01-01").astype("datetime64[us]").item()
    HI = np.datetime64("1999-01-01").astype("datetime64[us]").item()

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                        "l_discount"])

    def returned_partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch["l_returnflag"], pa.scalar("R")))
        cents = np.rint(np.asarray(b["l_extendedprice"],
                                   dtype=np.float64) * 100).astype(np.int64)
        disc = np.rint(np.asarray(b["l_discount"],
                                  dtype=np.float64) * 100).astype(np.int64)
        t = pa.table({"o_orderkey": b["l_orderkey"],
                      "rev": pa.array(cents * (100 - disc))})
        return t.group_by("o_orderkey").aggregate(
            [("rev", "sum")]).rename_columns(["o_orderkey", "rev"])

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_window(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(batch["o_orderdate"], pa.scalar(LO)),
                       pc.less(batch["o_orderdate"], pa.scalar(HI)))
        return batch.filter(keep).select(["o_orderkey", "o_custkey"])

    joined = hash_join(
        li.map_batches(returned_partial, batch_format="pyarrow"),
        orders.map_batches(o_window, batch_format="pyarrow"),
        on=["o_orderkey"], num_buckets=_gate_buckets())

    def cust_partial(batch: pa.Table) -> pa.Table:
        g = pa.table({"o_custkey": batch["o_custkey"],
                      "rev": batch["rev"]}).group_by(
            "o_custkey").aggregate([("rev", "sum")])
        return g.rename_columns(["o_custkey", "revenue_cents"])

    per_cust = joined.map_batches(cust_partial, batch_format="pyarrow"
                                  ).groupby("o_custkey").aggregate(
        Sum("revenue_cents", alias_name="revenue_cents"))
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"]
                 ).map_batches(
        lambda t: pa.table({"o_custkey": t["c_custkey"],
                            "c_name": t["c_name"]}),
        batch_format="pyarrow")
    named = hash_join(per_cust.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("revenue_cents"),
                               "revenue_cents",
                               pc.cast(t["revenue_cents"], pa.int64())),
        batch_format="pyarrow"), cust, on=["o_custkey"],
        num_buckets=_gate_buckets())

    def topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["revenue_cents", "o_custkey"], ascending=[False, True],
            kind="mergesort")
        return pa.Table.from_pandas(df.head(20), preserve_index=False)

    return (named.map_batches(topk, batch_format="pyarrow")
            .repartition(1).map_batches(topk, batch_format="pyarrow"))


def q_tpch_promo_share(sf_dir: str):
    """TPC-H Q14-shaped ratio aggregate: per ship-month percentage of
    revenue from PROMO-type parts. One bucketed partkey join; both
    revenue sums pre-reduce per batch per month; the share is a single
    int-derived division (×100) — bit-stable across engines."""
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.stages.join import hash_join

    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"]
                 ).map_batches(
        lambda t: pa.table({
            "l_partkey": t["p_partkey"],
            "is_promo": pc.cast(pc.equal(t["p_type"], pa.scalar("PROMO")),
                                pa.int64())}),
        batch_format="pyarrow")

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate", "l_extendedprice",
                        "l_discount"])

    def li_prep(batch: pa.Table) -> pa.Table:
        cents = np.rint(np.asarray(batch["l_extendedprice"],
                                   dtype=np.float64) * 100).astype(np.int64)
        disc = np.rint(np.asarray(batch["l_discount"],
                                  dtype=np.float64) * 100).astype(np.int64)
        ym = (pc.multiply(pc.cast(pc.year(batch["l_shipdate"]), pa.int64()),
                          pa.scalar(100, pa.int64())))
        ym = pc.add(ym, pc.cast(pc.month(batch["l_shipdate"]), pa.int64()))
        return pa.table({"l_partkey": batch["l_partkey"], "ym": ym,
                         "rev": pa.array(cents * (100 - disc))})

    joined = hash_join(li.map_batches(li_prep, batch_format="pyarrow"),
                       part, on=["l_partkey"], num_buckets=_gate_buckets())

    def month_partial(batch: pa.Table) -> pa.Table:
        promo = pc.multiply(batch["is_promo"], batch["rev"])
        g = pa.table({"ym": batch["ym"], "promo_rev": promo,
                      "total_rev": batch["rev"]}).group_by("ym").aggregate(
            [("promo_rev", "sum"), ("total_rev", "sum")])
        return g.rename_columns(["ym", "promo_rev", "total_rev"])

    agg = joined.map_batches(month_partial, batch_format="pyarrow").groupby(
        "ym").aggregate(Sum("promo_rev", alias_name="promo_rev"),
                        Sum("total_rev", alias_name="total_rev"))

    def share(t: pa.Table) -> pa.Table:
        promo = np.asarray(t["promo_rev"], dtype=np.float64)
        total = np.asarray(t["total_rev"], dtype=np.float64)
        return pa.table({"ym": t["ym"],
                         "promo_share": pa.array(
                             np.round(100.0 * promo / total, 9))})

    return agg.map_batches(share, batch_format="pyarrow")


def q_tpch_supplier_variety(sf_dir: str):
    """TPC-H Q16-shaped distinct-count with exclusion: how many
    DISTINCT suppliers shipped each (brand, size) of part, excluding
    Brand#13. The (brand,size) pair rides as one composite key through
    :func:`group_count_distinct`'s exact machinery (batch-local pair
    dedup → one pair-domain exchange → group-domain Sum) and splits
    back on the group-domain-sized result."""
    from kafka_connect_mongo_ray.functions.stats import (
        group_count_distinct,
    )
    from kafka_connect_mongo_ray.stages.join import hash_join

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand", "p_size"]).map_batches(
        lambda t: (lambda f: pa.table({
            "l_partkey": f["p_partkey"],
            "grp": pc.binary_join_element_wise(
                f["p_brand"],
                pc.cast(pc.cast(f["p_size"], pa.int64()), pa.string()),
                "|")}))(t.filter(pc.not_equal(t["p_brand"],
                                              pa.scalar("Brand#13")))),
        batch_format="pyarrow")

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    joined = hash_join(li, part, on=["l_partkey"],
                       num_buckets=_gate_buckets())
    nd = group_count_distinct(joined, group_col="grp",
                              val_col="l_suppkey",
                              out_col="supplier_cnt",
                              num_partitions=_gate_buckets())

    def split(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["grp"], "|")
        return pa.table({
            "p_brand": pc.list_element(parts, 0),
            "p_size": pc.cast(pc.list_element(parts, 1), pa.int64()),
            "supplier_cnt": t["supplier_cnt"]})

    return nd.map_batches(split, batch_format="pyarrow")


def q_tpch_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19-shaped disjunctive-predicate join: revenue from
    lineitems matching ANY of three (brand/size/quantity | type/
    quantity) conjunction clauses spanning BOTH joined tables — the
    predicate cannot push below the join, so the shape is one bucketed
    partkey join with a vectorized OR-of-ANDs filter and a scalar
    reduction (no second exchange)."""
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.stages.join import hash_join

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand", "p_size", "p_type"]
                 ).map_batches(
        lambda t: pa.table({"l_partkey": t["p_partkey"],
                            "p_brand": t["p_brand"],
                            "p_size": pc.cast(t["p_size"], pa.int64()),
                            "p_type": t["p_type"]}),
        batch_format="pyarrow")
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"])
    joined = hash_join(li, part, on=["l_partkey"],
                       num_buckets=_gate_buckets())

    def rev_partial(batch: pa.Table) -> pa.Table:
        brand = np.asarray(batch["p_brand"]).astype(object)
        size = np.asarray(batch["p_size"], dtype=np.int64)
        ptype = np.asarray(batch["p_type"]).astype(object)
        qty = np.rint(np.asarray(batch["l_quantity"],
                                 dtype=np.float64)).astype(np.int64)
        keep = (((brand == "Brand#5") & (size >= 1) & (size <= 10)
                 & (qty >= 1) & (qty <= 20))
                | ((brand == "Brand#19") & (size >= 5) & (size <= 25)
                   & (qty >= 10) & (qty <= 40))
                | ((ptype == "PROMO") & (qty >= 30)))
        b = batch.filter(pa.array(keep))
        cents = np.rint(np.asarray(b["l_extendedprice"],
                                   dtype=np.float64) * 100).astype(np.int64)
        disc = np.rint(np.asarray(b["l_discount"],
                                  dtype=np.float64) * 100).astype(np.int64)
        return pa.table({"rev": pa.array((cents * (100 - disc)).reshape(-1))})

    total = joined.map_batches(rev_partial, batch_format="pyarrow"
                               ).aggregate(Sum("rev", alias_name="rev"))
    return pa.table({"revenue_cents": pa.array([int(total["rev"])],
                                               pa.int64())})


def q_docs_source_policy(sf_dir: str):
    """Domain-level curation policy table: per source, doc count,
    total whitespace tokens, total chars, and a keep-verdict (mean
    tokens/doc ≥ 24 — compared as the pure-INT cross-multiplication
    sum_tokens ≥ 24·n_docs, no float crosses the engines). The
    drop-bad-domains decision every web-corpus pipeline makes before
    touching individual documents; one source-domain exchange after
    batch-local int pre-sums."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        t = pa.table({
            "source": batch["source"],
            "one": pa.array(np.ones(batch.num_rows, np.int64)),
            "tok": pc.cast(pc.list_value_length(
                pc.ascii_split_whitespace(text)), pa.int64()),
            "ch": pc.cast(pc.utf8_length(text), pa.int64())})
        g = t.group_by("source").aggregate(
            [("one", "sum"), ("tok", "sum"), ("ch", "sum")])
        return g.rename_columns(["source", "n_docs", "sum_tokens",
                                 "sum_chars"])

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(
        "source").aggregate(Sum("n_docs", alias_name="n_docs"),
                            Sum("sum_tokens", alias_name="sum_tokens"),
                            Sum("sum_chars", alias_name="sum_chars"))

    def verdict(t: pa.Table) -> pa.Table:
        nd = pc.cast(t["n_docs"], pa.int64())
        st = pc.cast(t["sum_tokens"], pa.int64())
        keep = pc.greater_equal(st, pc.multiply(
            pa.scalar(24, pa.int64()), nd))
        return pa.table({"source": t["source"], "n_docs": nd,
                         "sum_tokens": st,
                         "sum_chars": pc.cast(t["sum_chars"], pa.int64()),
                         "keep": keep})

    return agg.map_batches(verdict, batch_format="pyarrow")


def q_embedding_pca(sf_dir: str):
    """Top principal component of the embedding table via distributed
    power iteration (functions/similarity.py::pca_power_iteration):
    one column-pruned pass per iteration, d-domain exchanges, nothing
    fact-sized gathers. Machine-checked claim (HLL precedent): seeded
    at the max-variance axis, the PSD Rayleigh quotient is monotone,
    so rq ≥ max-axis-variance by construction; the oracle verifies
    dim / n_vectors exactly and the claim as a checked boolean."""
    from kafka_connect_mongo_ray.functions.similarity import (
        pca_power_iteration,
    )

    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    out = pca_power_iteration(ds, vec_col="embedding", iters=6)
    # rq is float-reduction-order-sensitive in the last ULPs; the gate
    # carries the exact ints + the checked boolean (tests pin rq
    # against numpy's eigendecomposition directly)
    return out.drop_columns(["rq"])


# corpus-mixture targets: language → share of the output mix. The
# oracle SQL is COMPOSED from this same dict (the PII-patterns
# precedent) so the two sides cannot drift. Shares need not sum to 1;
# unlisted languages get weight 0 (excluded).
_MIX_WEIGHTS = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}
_MIX_FRACTION = 0.5  # output size as a fraction of the corpus


def q_corpus_mixture(sf_dir: str):
    """Deterministic training-mix construction: select floor(weight ×
    total) docs per language (capped at availability — no quota
    redistribution, so the output is a pure function of per-lang
    counts), chosen by ascending md5(str(doc_id)) — reproducible
    across runs, partitionings, and cluster sizes. The pretraining
    data-mixing primitive: re-weight a multilingual corpus to target
    proportions without a global sort.

    Scale shape: per-lang counts are a batch-local pre-reduce + one
    lang-domain exchange; quotas broadcast as a closure dict; the
    selection reuses :func:`balanced_sample_by_md5`'s associative
    md5-priority kernel (per-block top-quota, then ONE group-bucketed
    merge — a lang's full row set never gathers)."""
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.functions.quantiles import (
        balanced_sample_by_md5,
    )

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def cnt_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("lang").aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n"])

    cnt = docs.map_batches(cnt_partial, batch_format="pyarrow").groupby(
        "lang").aggregate(Sum("n", alias_name="n")).to_pandas()
    total = int(np.floor(_MIX_FRACTION * float(cnt["n"].sum())))
    quotas = {
        str(row.lang): min(int(row.n),
                           int(np.floor(_MIX_WEIGHTS.get(str(row.lang), 0.0)
                                        * float(total))))
        for row in cnt.itertuples()}
    return balanced_sample_by_md5(docs, "doc_id", "lang", quotas=quotas,
                                  num_partitions=_gate_buckets())


def _mixture_oracle_sql() -> str:
    cases = " ".join(f"WHEN '{lang}' THEN CAST({w!r} AS DOUBLE)"
                     for lang, w in _MIX_WEIGHTS.items())
    return f"""
        WITH cnt AS (SELECT lang, COUNT(*) AS n FROM documents
                     GROUP BY lang),
             tot AS (SELECT FLOOR(CAST({_MIX_FRACTION!r} AS DOUBLE)
                                  * SUM(n)) AS total FROM cnt),
             quota AS (SELECT lang,
                              LEAST(n, CAST(FLOOR(
                                  (CASE lang {cases} ELSE 0.0 END)
                                  * (SELECT total FROM tot))
                                  AS BIGINT)) AS q
                       FROM cnt)
        SELECT d.doc_id, d.lang
        FROM (SELECT doc_id, lang,
                     ROW_NUMBER() OVER (
                         PARTITION BY lang
                         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                     AS rn
              FROM documents) d
        JOIN quota USING (lang)
        WHERE d.rn <= quota.q
    """


def q_tpch_custorder_distribution(sf_dir: str):
    """TPC-H Q13-shaped two-level count distribution: how many
    customers placed exactly k orders, INCLUDING the zero-order bucket
    a plain GROUP BY silently drops. Level 1 is a custkey-domain
    exchange of batch-local count partials; level 2 re-histograms the
    (customer, count) rows over the tiny count domain. The zero bucket
    is arithmetic — total customers (parquet footer) minus customers
    seen in orders — so no customer⟕order join ships any rows (valid
    because every o_custkey references a customer; the oracle's LEFT
    JOIN would diverge on dangling keys, asserted absent in testdata)."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_custkey"])

    def per_cust(batch: pa.Table) -> pa.Table:
        g = batch.group_by("o_custkey").aggregate([([], "count_all")])
        return g.rename_columns(["o_custkey", "n"])

    per = (orders.map_batches(per_cust, batch_format="pyarrow")
           .groupby("o_custkey").aggregate(Sum("n", alias_name="c_count"))
           ).materialize()  # consumed twice: count + histogram
    n_active = per.count()
    n_customers = _table_rows(sf_dir, "customer")

    def hist_partial(batch: pa.Table) -> pa.Table:
        g = pa.table({"c_count": pc.cast(batch["c_count"], pa.int64())}
                     ).group_by("c_count").aggregate([([], "count_all")])
        return g.rename_columns(["c_count", "custdist"])

    hist = (per.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("c_count").aggregate(Sum("custdist",
                                              alias_name="custdist")))
    df = hist.to_pandas()  # bounded by the distinct-order-count domain
    df["c_count"] = df["c_count"].astype(np.int64)
    df["custdist"] = df["custdist"].astype(np.int64)
    zero = n_customers - n_active
    if zero > 0:
        df = pd.concat([df, pd.DataFrame({"c_count": [0],
                                          "custdist": [zero]})],
                       ignore_index=True)
    return df.sort_values("c_count", ignore_index=True)


def q_tpch_small_qty_revenue(sf_dir: str):
    """TPC-H Q17-shaped correlated-average filter: revenue from
    lineitems of Brand#13 parts whose quantity is below 20% of that
    part's average quantity. The per-part average never becomes a
    float: the predicate cross-multiplies (5·qty·n_part < sum_qty —
    identical int64 ops both engines). The brand join bounds the fact
    stream to a brand-sized fraction first and the filtered stream is
    staged once (stats pass + compare pass share the same blocks)."""
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.stages.join import hash_join

    brand_parts = _read(sf_dir, "part", columns=["p_partkey", "p_brand"]
                        ).map_batches(
        lambda t: pa.table({"l_partkey": t.filter(
            pc.equal(t["p_brand"], pa.scalar("Brand#13")))["p_partkey"]}),
        batch_format="pyarrow")

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def li_prep(batch: pa.Table) -> pa.Table:
        qty = np.rint(np.asarray(batch["l_quantity"],
                                 dtype=np.float64)).astype(np.int64)
        cents = np.rint(np.asarray(batch["l_extendedprice"],
                                   dtype=np.float64) * 100).astype(np.int64)
        return pa.table({"l_partkey": batch["l_partkey"],
                         "qty": pa.array(qty), "cents": pa.array(cents)})

    bli = hash_join(li.map_batches(li_prep, batch_format="pyarrow"),
                    brand_parts, on=["l_partkey"], how="semi",
                    num_buckets=_gate_buckets()).materialize()

    def stats_partial(batch: pa.Table) -> pa.Table:
        g = pa.table({"l_partkey": batch["l_partkey"], "q": batch["qty"]}
                     ).group_by("l_partkey").aggregate(
            [("q", "sum"), ([], "count_all")])
        return g.rename_columns(["l_partkey", "sum_qty", "n_li"])

    stats = (bli.map_batches(stats_partial, batch_format="pyarrow")
             .groupby("l_partkey").aggregate(
                 Sum("sum_qty", alias_name="sum_qty"),
                 Sum("n_li", alias_name="n_li")))

    joined = hash_join(bli, stats, on=["l_partkey"],
                       num_buckets=_gate_buckets())

    def small_partial(batch: pa.Table) -> pa.Table:
        qty = np.asarray(batch["qty"], dtype=np.int64)
        n = np.asarray(batch["n_li"], dtype=np.int64)
        s = np.asarray(batch["sum_qty"], dtype=np.int64)
        keep = qty * 5 * n < s
        cents = np.asarray(batch["cents"], dtype=np.int64)[keep]
        return pa.table({"n_small": pa.array([int(keep.sum())]),
                         "sum_cents": pa.array([int(cents.sum())])})

    agg = joined.map_batches(small_partial, batch_format="pyarrow"
                             ).aggregate(Sum("n_small", alias_name="n_small"),
                                         Sum("sum_cents",
                                             alias_name="sum_cents"))
    return pd.DataFrame({"n_small": [int(agg["n_small"] or 0)],
                         "sum_cents": [int(agg["sum_cents"] or 0)]})


def q_tpch_top_supplier(sf_dir: str):
    """TPC-H Q15-shaped argmax-over-aggregated-view: supplier(s) whose
    1997-Q1 revenue equals the global maximum. The revenue view is a
    supplier-domain exchange of batch-local partials, staged once so
    the max scan and the equality cut share blocks; revenue is exact
    int64 (cents × (100−disc%)) so cross-engine equality is safe —
    the reason Q15's `= (SELECT MAX…)` pattern is usually fragile."""
    from ray.data.aggregate import Max, Sum

    from kafka_connect_mongo_ray.stages.join import hash_join

    LO = np.datetime64("1997-01-01").astype("datetime64[us]").item()
    HI = np.datetime64("1997-04-01").astype("datetime64[us]").item()

    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                        "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.and_(
            pc.greater_equal(batch["l_shipdate"], pa.scalar(LO)),
            pc.less(batch["l_shipdate"], pa.scalar(HI))))
        cents = np.rint(np.asarray(b["l_extendedprice"],
                                   dtype=np.float64) * 100).astype(np.int64)
        disc = np.rint(np.asarray(b["l_discount"],
                                  dtype=np.float64) * 100).astype(np.int64)
        g = pa.table({"s_suppkey": b["l_suppkey"],
                      "rev": pa.array(cents * (100 - disc))}
                     ).group_by("s_suppkey").aggregate([("rev", "sum")])
        return g.rename_columns(["s_suppkey", "total_rev"])

    rev = (li.map_batches(partial, batch_format="pyarrow")
           .groupby("s_suppkey").aggregate(Sum("total_rev",
                                               alias_name="total_rev"))
           .map_batches(lambda t: t.set_column(
               t.schema.get_field_index("total_rev"), "total_rev",
               pc.cast(t["total_rev"], pa.int64())),
               batch_format="pyarrow")).materialize()
    agg = rev.aggregate(Max("total_rev", alias_name="m"))
    if not agg or agg.get("m") is None:  # empty window ⇒ oracle's 0 rows
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                             "total_rev": pd.Series([], dtype=np.int64),
                             "s_name": pd.Series([], dtype=object)})
    best = int(agg["m"])
    top = rev.map_batches(
        lambda t: t.filter(pc.equal(t["total_rev"],
                                    pa.scalar(best, pa.int64()))),
        batch_format="pyarrow")
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    return hash_join(top, supp, on=["s_suppkey"],
                     num_buckets=_gate_buckets())


def q_tpch_dominant_suppliers(sf_dir: str):
    """TPC-H Q20-shaped excess-share cut (adapted: no partsupp table,
    so 'availability' becomes shipped volume): among 1997 shipments of
    'red'-named parts, a supplier DOMINATES a part when it shipped
    more than half that part's total (2·qty > total — the
    division-free compare, the Q22 scalar rule); count dominated parts
    per supplier. The fact stream collapses batch-locally to
    (partkey, suppkey) quantity sums and shuffles ONCE; the per-part
    totals, the dominance cut, and the supplier tally all run on
    part/supplier-domain-bounded data, and the name attach is a
    dimension×dimension join."""
    from ray.data.aggregate import Count, Sum

    from kafka_connect_mongo_ray.stages.join import hash_join

    LO = np.datetime64("1997-01-01").astype("datetime64[us]").item()
    HI = np.datetime64("1998-01-01").astype("datetime64[us]").item()

    import pyarrow.parquet as pq
    import ray

    part_ref = _broadcast_or_none(
        sf_dir, "part",
        lambda: set((t := pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"])
        ).filter(pc.match_substring(t["p_name"], "red"))
            ["p_partkey"].to_pylist()))

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_quantity",
                        "l_shipdate"])

    def li_prep(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(batch["l_shipdate"], pa.scalar(LO)),
                       pc.less(batch["l_shipdate"], pa.scalar(HI)))
        b = batch.filter(keep)
        if part_ref is not None:
            keys = ray.get(part_ref)
            pk = np.asarray(b["l_partkey"], dtype=np.int64)
            b = b.filter(pa.array(pd.Series(pk).isin(keys).to_numpy()))
        qty = np.rint(np.asarray(b["l_quantity"],
                                 dtype=np.float64)).astype(np.int64)
        g = pa.table({"l_partkey": b["l_partkey"],
                      "l_suppkey": b["l_suppkey"], "qty": pa.array(qty)}
                     ).group_by(["l_partkey", "l_suppkey"]).aggregate(
            [("qty", "sum")])
        return g.rename_columns(["l_partkey", "l_suppkey", "qty"])

    li = li.map_batches(li_prep, batch_format="pyarrow")
    if part_ref is None:
        red = _read(sf_dir, "part", columns=["p_partkey", "p_name"]
                    ).map_batches(
            lambda t: pa.table({"l_partkey": t.filter(
                pc.match_substring(t["p_name"], "red"))["p_partkey"]}),
            batch_format="pyarrow")
        li = hash_join(li, red, on=["l_partkey"], how="semi",
                       num_buckets=_gate_buckets())

    # the ONE fact-sized exchange; pairs feed both the totals and the
    # dominance compare (the multi-consumer staging rule)
    pairs = (li.groupby(["l_partkey", "l_suppkey"])
             .aggregate(Sum("qty", alias_name="qty"))).materialize()
    totals = (pairs.groupby("l_partkey")
              .aggregate(Sum("qty", alias_name="tq")))

    dom = hash_join(pairs, totals, on=["l_partkey"],
                    num_buckets=_gate_buckets()).map_batches(
        lambda t: pa.table({"l_suppkey": t.filter(
            pc.greater(pc.multiply(pc.cast(t["qty"], pa.int64()),
                                   pa.scalar(2, pa.int64())),
                       pc.cast(t["tq"], pa.int64())))["l_suppkey"]}),
        batch_format="pyarrow")

    tally = dom.groupby("l_suppkey").aggregate(
        Count(alias_name="n_dominated"))
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"]
                 ).map_batches(
        lambda t: pa.table({"l_suppkey": t["s_suppkey"],
                            "s_name": t["s_name"]}),
        batch_format="pyarrow")
    return hash_join(tally, supp, on=["l_suppkey"],
                     num_buckets=_gate_buckets()).map_batches(
        lambda t: pa.table({"s_name": t["s_name"],
                            "n_dominated": pc.cast(t["n_dominated"],
                                                   pa.int64())}),
        batch_format="pyarrow")


def _supp_names(sf_dir: str) -> dict:
    """suppkey -> s_name lookup for broadcast name attaches."""
    import pyarrow.parquet as pq

    st = pq.read_table(f"{sf_dir}/supplier.parquet",
                       columns=["s_suppkey", "s_name"])
    return dict(zip(st["s_suppkey"].to_pylist(), st["s_name"].to_pylist()))


def q_tpch_waiting_suppliers(sf_dir: str):
    """TPC-H Q21-shaped sole-blame existence composition (adapted to
    this schema's dates: 'late' = shipped >90 days after the order
    date): for finalized ('F') orders with ≥2 suppliers where EXACTLY
    ONE supplier shipped late, count blamed orders per supplier. The
    lineitem×orders join collapses immediately to distinct
    (order, supplier, ever-late) pairs — a batch-local max then one
    pair-domain exchange; the per-order aggregate carries
    sum(late*suppkey) so the sole-blame EXISTS and the blame join-back
    are both answered by that one order-domain exchange, and the
    supplier-name attach is a size-guarded broadcast. The raw fact
    stream shuffles exactly once."""
    from ray.data.aggregate import Max, Sum

    from kafka_connect_mongo_ray.stages.join import hash_join

    LATE_US = 90 * 86_400 * 1_000_000

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate", "o_orderstatus"]
                   ).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], pa.scalar("F"))
                           ).select(["o_orderkey", "o_orderdate"]),
        batch_format="pyarrow")

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate"]
               ).map_batches(
        lambda t: pa.table({"o_orderkey": t["l_orderkey"],
                            "l_suppkey": t["l_suppkey"],
                            "ship_us": pc.cast(t["l_shipdate"],
                                               pa.int64())}),
        batch_format="pyarrow")

    j = hash_join(li, orders, on=["o_orderkey"],
                  num_buckets=_gate_buckets())

    def pair_partial(batch: pa.Table) -> pa.Table:
        late = pc.cast(pc.greater(
            batch["ship_us"],
            pc.add(pc.cast(batch["o_orderdate"], pa.int64()),
                   pa.scalar(LATE_US, pa.int64()))), pa.int64())
        g = pa.table({"o_orderkey": batch["o_orderkey"],
                      "l_suppkey": batch["l_suppkey"], "late": late}
                     ).group_by(["o_orderkey", "l_suppkey"]).aggregate(
            [("late", "max")])
        return g.rename_columns(["o_orderkey", "l_suppkey", "late"])

    pairs = (j.map_batches(pair_partial, batch_format="pyarrow")
             .groupby(["o_orderkey", "l_suppkey"])
             .aggregate(Max("late", alias_name="late"))).materialize()

    # Per order: supplier count, late count, and sum(late * suppkey).
    # When EXACTLY ONE supplier is late that sum IS the blamed suppkey,
    # so the sole-blame semi join and the blame join-back both collapse
    # into this single order-domain aggregate (7 exchanges -> 4;
    # 18 s -> ~8 s at the sf0.001 gate).
    def order_partial(batch: pa.Table) -> pa.Table:
        late = pc.cast(batch["late"], pa.int64())
        blame = pc.multiply(late, pc.cast(batch["l_suppkey"], pa.int64()))
        g = pa.table({"o_orderkey": batch["o_orderkey"], "late": late,
                      "blame": blame}
                     ).group_by("o_orderkey").aggregate(
            [([], "count_all"), ("late", "sum"), ("blame", "sum")])
        return g.rename_columns(["o_orderkey", "n_supp", "n_late", "blame"])

    def sole_blame(t: pa.Table) -> pa.Table:
        keep = t.filter(
            pc.and_(pc.greater_equal(pc.cast(t["n_supp"], pa.int64()),
                                     pa.scalar(2, pa.int64())),
                    pc.equal(pc.cast(t["n_late"], pa.int64()),
                             pa.scalar(1, pa.int64()))))
        g = pa.table({"s_suppkey": pc.cast(keep["blame"], pa.int64())}
                     ).group_by("s_suppkey").aggregate([([], "count_all")])
        return g.rename_columns(["s_suppkey", "numwait"])

    tally = (pairs.map_batches(order_partial, batch_format="pyarrow")
             .groupby("o_orderkey").aggregate(
                 Sum("n_supp", alias_name="n_supp"),
                 Sum("n_late", alias_name="n_late"),
                 Sum("blame", alias_name="blame"))
             .map_batches(sole_blame, batch_format="pyarrow")
             .groupby("s_suppkey").aggregate(Sum("numwait",
                                                 alias_name="numwait"))
             .map_batches(lambda t: t.set_column(
                 t.schema.get_field_index("numwait"), "numwait",
                 pc.cast(t["numwait"], pa.int64())),
                 batch_format="pyarrow"))

    # supplier-name attach: size-guarded broadcast (dimension side),
    # bucketed-join fallback above the guard
    name_ref = _broadcast_or_none(sf_dir, "supplier", lambda: _supp_names(sf_dir))
    if name_ref is None:
        supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
        return hash_join(tally, supp, on=["s_suppkey"],
                         num_buckets=_gate_buckets())
    import ray

    def attach(t: pa.Table) -> pa.Table:
        names = ray.get(name_ref)
        sk = t["s_suppkey"].to_pylist()
        return t.append_column("s_name",
                               pa.array([names[k] for k in sk], pa.string()))

    return tally.map_batches(attach, batch_format="pyarrow")


def q_tpch_shipping_priority(sf_dir: str):
    """TPC-H Q3-shaped segment top-k: revenue still shippable after
    the cut date for BUILDING-segment customers' orders placed before
    it, top 10 by revenue. The segment filter ships keys only (semi
    join); lineitem revenue pre-sums per orderkey inside each batch
    before its single exchange; the top-10 is batch-local top-k plus
    one 10-row final reduce — no global sort."""
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.stages.join import hash_join

    CUT = np.datetime64("1998-06-01").astype("datetime64[us]").item()

    bcust = _read(sf_dir, "customer",
                  columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: pa.table({"o_custkey": t.filter(
            pc.equal(t["c_mktsegment"],
                     pa.scalar("BUILDING")))["c_custkey"]}),
        batch_format="pyarrow")

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_orderpriority"]).map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"], pa.scalar(CUT))),
        batch_format="pyarrow")
    orders_b = hash_join(orders, bcust, on=["o_custkey"], how="semi",
                         num_buckets=_gate_buckets()
                         ).drop_columns(["o_custkey"])

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_shipdate", "l_extendedprice",
                        "l_discount"])

    def rev_partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.greater(batch["l_shipdate"], pa.scalar(CUT)))
        cents = np.rint(np.asarray(b["l_extendedprice"],
                                   dtype=np.float64) * 100).astype(np.int64)
        disc = np.rint(np.asarray(b["l_discount"],
                                  dtype=np.float64) * 100).astype(np.int64)
        g = pa.table({"o_orderkey": b["l_orderkey"],
                      "rev": pa.array(cents * (100 - disc))}
                     ).group_by("o_orderkey").aggregate([("rev", "sum")])
        return g.rename_columns(["o_orderkey", "revenue_cents"])

    rev = (li.map_batches(rev_partial, batch_format="pyarrow")
           .groupby("o_orderkey").aggregate(Sum("revenue_cents",
                                                alias_name="revenue_cents"))
           .map_batches(lambda t: t.set_column(
               t.schema.get_field_index("revenue_cents"), "revenue_cents",
               pc.cast(t["revenue_cents"], pa.int64())),
               batch_format="pyarrow"))

    joined = hash_join(rev, orders_b, on=["o_orderkey"],
                       num_buckets=_gate_buckets())

    def topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["revenue_cents", "o_orderkey"], ascending=[False, True],
            kind="mergesort")
        return pa.Table.from_pandas(df.head(10), preserve_index=False)

    return (joined.map_batches(topk, batch_format="pyarrow")
            .repartition(1).map_batches(topk, batch_format="pyarrow"))


def q_cdc_key_range_scan(sf_dir: str):
    """Zone-map-pruned key-range read: replay the full derived change
    stream into a PERSISTED store whose buckets split into many small
    part files, then range-scan repos src2..src4 through
    ``key_range_dataset`` — only part files whose manifest-recorded
    [first_key, last_key] overlaps the range are opened (asserted:
    pruning must actually skip files), the residual filter trims
    boundary files. The oracle is the analytic final state restricted
    to the same lexicographic repo range."""
    import hashlib
    import shutil

    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.cdc import (
        key_range_dataset,
        run_replay,
    )

    root = f"/tmp/kcm_zmq_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    shutil.rmtree(root, ignore_errors=True)
    cfg = EngineConfig(snapshot_dir=f"{root}/s", checkpoint_dir=f"{root}/c",
                       num_buckets=8, snapshot_rows_per_file=32)
    run_replay(doc_change_events(sf_dir), cfg)
    ds = key_range_dataset(cfg, ("src2", ""), ("src4", "￿"))
    assert ds.files_scanned < ds.files_total, (
        "zone maps pruned nothing — stats missing from the manifest?")
    return ds.map_batches(
        lambda t: t.select(["repo", "path", "lang", "content"]),
        batch_format="pyarrow")


def q_tpch_nation_volume(sf_dir: str):
    """TPC-H Q7-shaped bidirectional nation-pair volume: revenue
    shipped 1997-1998 between NATION_3 and NATION_8 in either
    direction, per (supplier nation, customer nation, year). The
    nation table is constant-sized (25 rows) so its name map rides
    driver-side; the supplier and customer dimensions filter to the
    two nations BEFORE their joins (a 2/25 cut on each side of the
    fact stream), and revenue pre-sums per batch before the final
    3-key exchange over a pair×year domain."""
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.stages.join import hash_join

    LO = np.datetime64("1997-01-01").astype("datetime64[us]").item()
    HI = np.datetime64("1999-01-01").astype("datetime64[us]").item()
    WANT = ("NATION_3", "NATION_8")

    nat = {int(r["n_nationkey"]): str(r["n_name"])
           for r in _read(sf_dir, "nation",
                          columns=["n_nationkey", "n_name"]).take_all()}
    want_keys = [k for k, v in nat.items() if v in WANT]

    def dim(table, key_col, out_key, out_name):
        def f(batch: pa.Table) -> pa.Table:
            nk = np.asarray(batch[key_col[1]], dtype=np.int64)
            keep = np.isin(nk, want_keys)
            names = np.array([nat[int(x)] for x in nk[keep]], dtype=object)
            return pa.table({out_key: pa.array(
                np.asarray(batch[key_col[0]], dtype=np.int64)[keep]),
                out_name: pa.array(names, pa.string())})
        return _read(sf_dir, table, columns=list(key_col)).map_batches(
            f, batch_format="pyarrow")

    supp = dim("supplier", ("s_suppkey", "s_nationkey"),
               "l_suppkey", "supp_nation")
    cust = dim("customer", ("c_custkey", "c_nationkey"),
               "o_custkey", "cust_nation")

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    # column ops ride inside map_batches: Dataset.drop_columns needs a
    # schema, and a join whose dimension side matched nothing (possible
    # at the smallest sf) has none
    ord_cust = hash_join(orders, cust, on=["o_custkey"],
                         num_buckets=_gate_buckets()).map_batches(
        lambda t: t.select(["o_orderkey", "cust_nation"]),
        batch_format="pyarrow")

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate",
                        "l_extendedprice", "l_discount"])

    def li_prep(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.and_(
            pc.greater_equal(batch["l_shipdate"], pa.scalar(LO)),
            pc.less(batch["l_shipdate"], pa.scalar(HI))))
        cents = np.rint(np.asarray(b["l_extendedprice"],
                                   dtype=np.float64) * 100).astype(np.int64)
        disc = np.rint(np.asarray(b["l_discount"],
                                  dtype=np.float64) * 100).astype(np.int64)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"],
                         "l_year": pc.cast(pc.year(b["l_shipdate"]),
                                           pa.int64()),
                         "rev": pa.array(cents * (100 - disc))})

    li_s = hash_join(li.map_batches(li_prep, batch_format="pyarrow"),
                     supp, on=["l_suppkey"], num_buckets=_gate_buckets()
                     ).map_batches(
        lambda t: t.drop_columns(["l_suppkey"]).rename_columns(
            ["o_orderkey" if c == "l_orderkey" else c
             for c in t.column_names if c != "l_suppkey"]),
        batch_format="pyarrow")
    # stage the narrow first-join output before the second bucketed
    # join — chained lazy all-to-alls starve the executor (NEXT.md #2;
    # the Q5 star measured 20 s → 6.4 s from exactly this staging)
    li_s = li_s.materialize()
    j = hash_join(li_s, ord_cust, on=["o_orderkey"],
                  num_buckets=_gate_buckets())

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch["supp_nation"], batch["cust_nation"])
        b = batch.filter(keep)
        g = pa.table({"supp_nation": b["supp_nation"],
                      "cust_nation": b["cust_nation"],
                      "l_year": b["l_year"], "rev": b["rev"]}
                     ).group_by(["supp_nation", "cust_nation", "l_year"]
                                ).aggregate([("rev", "sum")])
        return g.rename_columns(["supp_nation", "cust_nation", "l_year",
                                 "revenue_cents"])

    return (j.map_batches(partial, batch_format="pyarrow")
            .groupby(["supp_nation", "cust_nation", "l_year"])
            .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
            .map_batches(lambda t: t.set_column(
                t.schema.get_field_index("revenue_cents"), "revenue_cents",
                pc.cast(t["revenue_cents"], pa.int64())),
                batch_format="pyarrow"))


# chunk-level dedup: composite (doc_id, chunk_index) encoding bounds
_CHUNK_WORDS = 10
_CHUNK_IDX_SPAN = 4096  # doc texts are ≤ ~100 words; guarded per batch


def q_tpch_important_parts(sf_dir: str):
    """TPC-H Q11-shaped group-vs-global-scalar HAVING: parts whose
    revenue exceeds 1.3× the mean per-part revenue (Q11's
    value > fraction × SUM(value) shape, with an adaptive mean-based
    cut because the synthetic revenue is uniform across parts — any
    fixed share degenerates as the part count scales). The compare
    ships as v·n·10 > 13·total — identical int64 ops both engines, the
    Q22 cross-multiplication rule. One partkey-domain exchange; the
    two global scalars reduce from the same staged blocks."""
    from ray.data.aggregate import Count, Sum

    from kafka_connect_mongo_ray.stages.join import hash_join

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(np.asarray(batch["l_extendedprice"],
                                   dtype=np.float64) * 100).astype(np.int64)
        g = pa.table({"p_partkey": batch["l_partkey"],
                      "v": pa.array(cents)}).group_by(
            "p_partkey").aggregate([("v", "sum")])
        return g.rename_columns(["p_partkey", "value_cents"])

    pv = (li.map_batches(partial, batch_format="pyarrow")
          .groupby("p_partkey").aggregate(Sum("value_cents",
                                              alias_name="value_cents"))
          .map_batches(lambda t: t.set_column(
              t.schema.get_field_index("value_cents"), "value_cents",
              pc.cast(t["value_cents"], pa.int64())),
              batch_format="pyarrow")).materialize()
    from ray.data.aggregate import Max

    scal = pv.aggregate(Sum("value_cents", alias_name="s"),
                        Count(alias_name="n"),
                        Max("value_cents", alias_name="mx"))
    total, n = int(scal["s"] or 0), int(scal["n"])
    # magnitude guard (the repo's composite-int rule): both sides of
    # the cross-multiplied compare must stay inside int64
    assert (scal["mx"] is None
            or max(int(scal["mx"]) * n * 10, 13 * total) < 2 ** 63)
    if n == 0:
        return pd.DataFrame({"p_partkey": pd.Series([], dtype=np.int64),
                             "value_cents": pd.Series([], dtype=np.int64),
                             "p_name": pd.Series([], dtype=object)})
    big = pv.map_batches(
        lambda t: t.filter(pc.greater(
            pc.multiply(t["value_cents"],
                        pa.scalar(n * 10, pa.int64())),
            pa.scalar(13 * total, pa.int64()))),
        batch_format="pyarrow")
    names = _read(sf_dir, "part", columns=["p_partkey", "p_name"])
    return hash_join(big, names, on=["p_partkey"],
                     num_buckets=_gate_buckets())


def q_docs_chunk_dedup(sf_dir: str):
    """Chunk-level (paragraph-style) corpus dedup: explode every
    document into 10-word chunks, keep each distinct chunk only at its
    FIRST corpus position (minimal (doc_id, chunk_index)), and
    reassemble the surviving chunks per document — the
    explode→first-wins→reassemble shape CC-style pipelines use for
    paragraph dedup (here fixed word windows because the synthetic
    texts have no paragraph marks). The explode is pure Arrow
    (split_pattern → list offsets → np.add.reduceat); first-wins is
    ONE chunk-text-keyed exchange of Min(composite) — the composite
    doc_id·4096+idx makes "earliest position" a single int64 Min, and
    both factors are magnitude-guarded. Docs whose every chunk lost
    are dropped (mirrored in SQL by building from winners)."""
    from ray.data.aggregate import Min, Sum

    from kafka_connect_mongo_ray.stages.join import hash_join

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        # null text explodes to nothing (SQL unnest semantics) — and a
        # null-bearing list_value_length would poison the int64 numpy
        # cast below (the repo's recurring NaN-key lesson)
        batch = batch.filter(pc.is_valid(batch["text"]))
        words = pc.split_pattern(batch["text"], " ")
        lens = np.asarray(pc.list_value_length(words), dtype=np.int64)
        doc = np.asarray(batch["doc_id"], dtype=np.int64)
        if len(doc) == 0:
            return pa.table({"chunk": pa.array([], pa.string()),
                             "comp": pa.array([], pa.int64())})
        flat = np.asarray(pc.list_flatten(words)).astype(object)
        total = int(lens.sum())
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        wi = np.arange(total, dtype=np.int64) - starts
        pidx = wi // _CHUNK_WORDS
        # every chunk's first word marks a reduceat boundary
        bounds = np.flatnonzero(wi % _CHUNK_WORDS == 0)
        chunks = np.add.reduceat(flat + " ", bounds)
        chunks = np.array([c[:-1] for c in chunks], dtype=object)
        cdoc = np.repeat(doc, -(-lens // _CHUNK_WORDS))
        cidx = pidx[bounds]
        if cidx.size and (int(cidx.max()) >= _CHUNK_IDX_SPAN
                          or int(np.abs(cdoc).max())
                          >= (2 ** 62) // _CHUNK_IDX_SPAN
                          or int(cdoc.min()) < 0):
            raise ValueError("chunk composite out of guarded range")
        comp = cdoc * _CHUNK_IDX_SPAN + cidx
        return pa.table({"chunk": pa.array(chunks, pa.string()),
                         "comp": pa.array(comp)})

    chunks = docs.map_batches(explode, batch_format="pyarrow"
                              ).materialize()  # winners pass + counts pass

    winners = (chunks.groupby("chunk").aggregate(Min("comp",
                                                     alias_name="comp"))
               .map_batches(lambda t: pa.table({
                   "doc_id": pc.divide(pc.cast(t["comp"], pa.int64()),
                                       pa.scalar(_CHUNK_IDX_SPAN,
                                                 pa.int64())),
                   "pidx": pc.subtract(
                       pc.cast(t["comp"], pa.int64()),
                       pc.multiply(pc.divide(
                           pc.cast(t["comp"], pa.int64()),
                           pa.scalar(_CHUNK_IDX_SPAN, pa.int64())),
                           pa.scalar(_CHUNK_IDX_SPAN, pa.int64()))),
                   "chunk": t["chunk"]}), batch_format="pyarrow"))

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("pidx", kind="mergesort")
        return pd.DataFrame({
            "doc_id": [np.int64(df["doc_id"].iloc[0])],
            "n_kept": [np.int64(len(df))],
            "text_dedup": [" ".join(df["chunk"].tolist())]})

    # pin Arrow types after the pandas group conversion (a pandas-born
    # schema reaches hash_join with numpy/object types otherwise)
    kept = winners.groupby("doc_id").map_groups(
        reassemble, batch_format="pandas").map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_kept": pc.cast(t["n_kept"], pa.int64()),
            "text_dedup": pc.cast(t["text_dedup"], pa.string())}),
        batch_format="pyarrow")

    def count_partial(batch: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(batch["comp"], pa.int64()),
                      pa.scalar(_CHUNK_IDX_SPAN, pa.int64()))
        g = pa.table({"doc_id": d}).group_by("doc_id").aggregate(
            [([], "count_all")])
        return g.rename_columns(["doc_id", "n_chunks"])

    totals = (chunks.map_batches(count_partial, batch_format="pyarrow")
              .groupby("doc_id").aggregate(Sum("n_chunks",
                                               alias_name="n_chunks"))
              .map_batches(lambda t: t.set_column(
                  t.schema.get_field_index("n_chunks"), "n_chunks",
                  pc.cast(t["n_chunks"], pa.int64())),
                  batch_format="pyarrow"))

    return hash_join(kept, totals, on=["doc_id"],
                     num_buckets=_gate_buckets())


def q_tpch_forecast_revenue(sf_dir: str):
    """TPC-H Q6-shaped forecast-revenue aggregate: total revenue the
    1995 discounts in the 5–7% band on sub-24-quantity lines gave
    away. Pure scan shape — per-batch predicate + two int64 partials
    (count, Σcents·disc_cents), ONE scalar reduction, no exchange of
    row data at any scale. The dollar figure is a single division of
    the exact integer (the Q14/Q22 rule)."""
    from ray.data.aggregate import Count, Sum

    li = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_discount", "l_quantity",
                        "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        disc = np.rint(np.asarray(batch["l_discount"],
                                  dtype=np.float64) * 100).astype(np.int64)
        year = np.asarray(pc.year(batch["l_shipdate"]), dtype=np.int64)
        qty = np.asarray(batch["l_quantity"], dtype=np.float64)
        keep = (year == 1995) & (disc >= 5) & (disc <= 7) & (qty < 24.0)
        cents = np.rint(np.asarray(batch["l_extendedprice"],
                                   dtype=np.float64)[keep]
                        * 100).astype(np.int64)
        units = cents * disc[keep]
        _f = cents.astype(np.float64) * disc[keep]
        if abs(float(units.sum()) - float(_f.sum())) > 1e-6 * abs(float(_f.sum())) + 16:
            raise OverflowError("forecast_revenue partial overflowed int64")
        return pa.table({"n": pa.array([len(units)], pa.int64()),
                         "units": pa.array([int(units.sum())], pa.int64())})

    res = li.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("units", alias_name="units"))
    n = int(res["n"] or 0)
    units = int(res["units"] or 0)
    return pa.table({
        "n_items": pa.array([n], pa.int64()),
        "revenue_units": pa.array([units], pa.int64()),
        "revenue": pa.array([round(units / 10000.0, 9)], pa.float64()),
    })


def q_tpch_min_cost_supplier(sf_dir: str):
    """TPC-H Q2-shaped group-min join-back KEEPING TIES: for every
    part, the EUROPE-region supplier(s) offering it at the minimum
    observed line price. Distinct from the Q15 argmax (one winner per
    view) and Q17 (scalar filter): the correlated ``cost =
    (SELECT MIN ...)`` equality must return ALL min-achieving rows.
    Shape: the region's nationkeys resolve driver-side (nation-domain,
    ≤25 rows at any SF); when the supplier table fits the
    `_SUPP_BROADCAST_MAX_ROWS` guard the EUROPE suppliers broadcast as
    a sorted key array + name list, so the plan is a FILTER on the
    fact scan, batch-local (part,supp) Min partials, one pair-domain
    exchange, one part-domain Min (broadcast back under the same
    guard), and one dimension-sized names join — two exchanges and a
    join in total. Above the guard every broadcast falls back to the
    bucketed-join plan (pinned value-identical by
    test_q2_join_fallback_matches_broadcast)."""
    from ray.data.aggregate import Min

    import ray

    from kafka_connect_mongo_ray.stages.join import hash_join

    import pyarrow.parquet as pq

    # nation/region are nation-domain tables (≤25/5 rows at ANY SF) —
    # driver-side resolution is the documented broadcast-side pattern
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"])
    euro_rk = set(
        region.filter(pc.equal(region["r_name"], pa.scalar("EUROPE")))
        ["r_regionkey"].to_pylist())
    euro_nk = {int(nk) for nk, rk in zip(
        nation["n_nationkey"].to_pylist(),
        nation["n_regionkey"].to_pylist()) if rk in euro_rk}

    small = (_table_rows(sf_dir, "supplier") <= _SUPP_BROADCAST_MAX_ROWS
             and _table_rows(sf_dir, "part") <= _SUPP_BROADCAST_MAX_ROWS)

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_extendedprice"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(np.asarray(batch["l_extendedprice"],
                                   dtype=np.float64) * 100).astype(np.int64)
        g = pa.table({"p_partkey": batch["l_partkey"],
                      "s_suppkey": batch["l_suppkey"],
                      "cost_cents": pa.array(cents)}).group_by(
            ["p_partkey", "s_suppkey"]).aggregate([("cost_cents", "min")])
        return g.rename_columns(["p_partkey", "s_suppkey", "cost_cents"])

    def _pin(col):
        return lambda t: t.set_column(
            t.schema.get_field_index(col), col, pc.cast(t[col], pa.int64()))

    if small:
        st = pq.read_table(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey", "s_name"])
        st = st.filter(pc.is_in(pc.cast(st["s_nationkey"], pa.int64()),
                                value_set=pa.array(sorted(euro_nk),
                                                   pa.int64())))
        skeys = np.asarray(st["s_suppkey"], dtype=np.int64)
        order = np.argsort(skeys, kind="stable")
        skeys = skeys[order]
        snames = np.asarray(st["s_name"].to_pylist(), dtype=object)[order]
        skeys_ref = ray.put(skeys)

        def euro_filter(batch: pa.Table) -> pa.Table:
            keys = ray.get(skeys_ref)
            sk = np.asarray(batch["l_suppkey"], dtype=np.int64)
            idx = np.searchsorted(keys, sk)
            hit = (idx < len(keys)) & (keys[np.minimum(
                idx, len(keys) - 1)] == sk)
            return batch.filter(pa.array(hit))

        pairs = (li.map_batches(euro_filter, batch_format="pyarrow")
                 .map_batches(pair_partial, batch_format="pyarrow")
                 .groupby(["p_partkey", "s_suppkey"])
                 .aggregate(Min("cost_cents", alias_name="cost_cents"))
                 .map_batches(_pin("cost_cents"), batch_format="pyarrow")
                 ).materialize()

        # part-domain minima fit the same guard → broadcast join-back
        best_df = (pairs.groupby("p_partkey")
                   .aggregate(Min("cost_cents", alias_name="min_cost"))
                   .to_pandas())
        bkeys = best_df["p_partkey"].to_numpy(dtype=np.int64)
        border = np.argsort(bkeys, kind="stable")
        bkeys = bkeys[border]
        bmin = best_df["min_cost"].to_numpy(dtype=np.int64)[border]
        best_ref = ray.put((bkeys, bmin))
        sname_ref = ray.put((skeys, snames))

        def keep_min(batch: pa.Table) -> pa.Table:
            kb, mb = ray.get(best_ref)
            pk = np.asarray(batch["p_partkey"], dtype=np.int64)
            cost = np.asarray(batch["cost_cents"], dtype=np.int64)
            win = cost == mb[np.searchsorted(kb, pk)]
            t = batch.filter(pa.array(win))
            ks, ns = ray.get(sname_ref)
            sk = np.asarray(t["s_suppkey"], dtype=np.int64)
            return t.append_column(
                "s_name", pa.array(ns[np.searchsorted(ks, sk)],
                                   pa.string()))

        winners = pairs.map_batches(keep_min, batch_format="pyarrow"
                                    ).materialize()
        names = _read(sf_dir, "part", columns=["p_partkey", "p_name"])
        return hash_join(winners, names, on=["p_partkey"],
                         num_buckets=_gate_buckets())

    rs = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey",
                                            "s_name"]).map_batches(
        lambda t: (lambda f: pa.table({
            "l_suppkey": pc.cast(f["s_suppkey"], pa.int64()),
            "s_name": f["s_name"]}))(
            t.filter(pc.is_in(pc.cast(t["s_nationkey"], pa.int64()),
                              value_set=pa.array(sorted(euro_nk),
                                                 pa.int64())))),
        batch_format="pyarrow")

    joined = hash_join(li, rs.map_batches(
        lambda t: t.select(["l_suppkey"]), batch_format="pyarrow"),
        on=["l_suppkey"], num_buckets=_gate_buckets())

    pairs = (joined.map_batches(pair_partial, batch_format="pyarrow")
             .groupby(["p_partkey", "s_suppkey"])
             .aggregate(Min("cost_cents", alias_name="cost_cents"))
             .map_batches(_pin("cost_cents"), batch_format="pyarrow")
             ).materialize()

    best = pairs.groupby("p_partkey").aggregate(
        Min("cost_cents", alias_name="min_cost")).map_batches(
        _pin("min_cost"), batch_format="pyarrow")

    winners = hash_join(pairs, best, on=["p_partkey"],
                        num_buckets=_gate_buckets()).map_batches(
        lambda t: t.filter(pc.equal(t["cost_cents"], t["min_cost"]))
        .select(["p_partkey", "s_suppkey", "cost_cents"]),
        batch_format="pyarrow").materialize()

    names = _read(sf_dir, "part", columns=["p_partkey", "p_name"])
    withp = hash_join(winners, names, on=["p_partkey"],
                      num_buckets=_gate_buckets()).materialize()
    return hash_join(withp, rs.map_batches(
        lambda t: pa.table({"s_suppkey": t["l_suppkey"],
                            "s_name": t["s_name"]}),
        batch_format="pyarrow"), on=["s_suppkey"],
        num_buckets=_gate_buckets())


def q_lineitem_skew_by_flag(sf_dir: str):
    """Per-returnflag skewness + excess kurtosis of quantity
    (functions/stats.py::grouped_skew_kurt): exact int64 moment
    partials to the 4th power, one group-domain exchange, operand-
    order-mirrored closed forms (sqrt(m2)·m2 instead of pow — sqrt is
    correctly rounded IEEE in both engines, libm pow is not)."""
    from kafka_connect_mongo_ray.functions.stats import grouped_skew_kurt

    li = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    return grouped_skew_kurt(li, group_col="l_returnflag",
                             int_col="l_quantity", scale=1).map_batches(
        lambda t: t.rename_columns(["l_returnflag", "n", "skew", "kurt"]),
        batch_format="pyarrow")


def q_orders_mom_growth(sf_dir: str):
    """Month-over-month revenue growth: monthly order revenue (exact
    cents) with LAG-based percent change — the period-over-period
    reporting shape. Batch-local month partials → one month-domain
    exchange (bounded by wall-clock months at any SF) → a single-task
    ordered LAG pass; growth is one subtract (exact int), one multiply
    and one division mirrored verbatim."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(np.asarray(batch["o_totalprice"],
                                   dtype=np.float64) * 100).astype(np.int64)
        ym = pc.add(
            pc.multiply(pc.cast(pc.year(batch["o_orderdate"]), pa.int64()),
                        pa.scalar(100, pa.int64())),
            pc.cast(pc.month(batch["o_orderdate"]), pa.int64()))
        g = pa.table({"ym": ym, "revenue_cents": pa.array(cents)}
                     ).group_by("ym").aggregate([("revenue_cents", "sum")])
        return g.rename_columns(["ym", "revenue_cents"])

    monthly = (orders.map_batches(partial, batch_format="pyarrow")
               .groupby("ym").aggregate(Sum("revenue_cents",
                                            alias_name="revenue_cents"))
               .repartition(1))

    def growth(t: pa.Table) -> pa.Table:
        order = np.argsort(np.asarray(t["ym"], dtype=np.int64),
                           kind="stable")
        ym = np.asarray(t["ym"], dtype=np.int64)[order]
        rev = np.asarray(t["revenue_cents"], dtype=np.int64)[order]
        g = np.full(len(ym), np.nan, np.float64)
        if len(ym) > 1:
            diff = (rev[1:] - rev[:-1]).astype(np.float64)
            g[1:] = (100.0 * diff) / rev[:-1].astype(np.float64)
        return pa.table({
            "ym": pa.array(ym),
            "revenue_cents": pa.array(rev),
            "growth_pct": pc.round(pa.array(g, pa.float64()), 9,
                                   round_mode="half_towards_infinity"),
        })

    return monthly.map_batches(growth, batch_format="pyarrow",
                               batch_size=None)


def q_dq_audit(sf_dir: str):
    """Declarative data-quality audit over lineitem + orders: one row
    per expectation ``(check_name, n_checked, n_violations)``. The
    five batch-local checks fuse into ONE streaming scan per table;
    uniqueness is a keys-only exchange; referential integrity is the
    tagged-union single-shuffle plan (see
    ``functions/expectations.py``). Mixes clean checks (violations=0
    on this corpus) with real policy violations (discount ≤ 5%,
    priority domain subset) so nonzero counts are exercised."""
    from kafka_connect_mongo_ray.functions import expectations as ex

    datasets = {
        "lineitem": _read(sf_dir, "lineitem",
                          columns=["l_orderkey", "l_quantity",
                                   "l_extendedprice", "l_discount",
                                   "l_returnflag"]),
        "orders": _read(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderpriority"]),
    }
    return ex.run_expectations(datasets, [
        ex.not_null("li_quantity_not_null", "lineitem", "l_quantity"),
        ex.in_range("li_price_nonnegative", "lineitem",
                    "l_extendedprice", lo=0.0),
        ex.in_range("li_discount_policy", "lineitem", "l_discount",
                    lo=0.0, hi=0.05),
        ex.in_set("li_returnflag_domain", "lineitem", "l_returnflag",
                  ["A", "N", "R"]),
        ex.in_set("ord_priority_strict", "orders", "o_orderpriority",
                  ["1-URGENT", "2-HIGH", "3-MEDIUM"]),
        ex.unique("ord_orderkey_unique", "orders", "o_orderkey"),
        ex.foreign_key("li_orderkey_fk", "lineitem", "l_orderkey",
                       "orders", "o_orderkey"),
    ])


def _roundtrip_dir(sf_dir: str, fmt: str) -> str:
    """Fresh scratch dir for a source-format round trip — keyed by the
    sf tag so concurrent gates at different scales don't collide."""
    import os
    import shutil

    d = f"/tmp/kcmr_sources/{os.path.basename(sf_dir.rstrip('/'))}/{fmt}"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d


def q_events_json_source(sf_dir: str):
    """NDJSON source coverage: export a 3-column integer/string slice
    of events to line-delimited JSON (one file per block — the
    partitioned layout a log-shipping producer would hand us), read it
    back with ``ray.data.read_json``, and aggregate per type. Integer
    columns only cross the text format so the round trip is exact
    (doubles through JSON would re-test float printing, not the
    source). The reference's JSON ingest path is `JSONHandler` parse
    (cited in ``pipelines/cdc.py``); this is the file-source analog."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Sum

    out = _roundtrip_dir(sf_dir, "events_json")
    (_read(sf_dir, "events", columns=["event_id", "user_id", "event_type"])
     .write_json(out))

    back = rd.read_json(out)
    g = back.groupby("event_type").aggregate(
        Count(alias_name="n_events"),
        Sum("user_id", alias_name="sum_user_id"),
        Max("event_id", alias_name="max_event_id"))
    return g.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "sum_user_id": pc.cast(t["sum_user_id"], pa.int64()),
            "max_event_id": pc.cast(t["max_event_id"], pa.int64()),
        }), batch_format="pyarrow")


def q_lineitem_csv_source(sf_dir: str):
    """CSV source coverage: export an integer/string slice of lineitem
    to headered CSV part files, read them back with
    ``ray.data.read_csv``, and aggregate per return flag. Quantity is
    converted to an integer count BEFORE the text hop (it is a whole
    number in the domain), keeping the round trip exact."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Sum

    out = _roundtrip_dir(sf_dir, "lineitem_csv")

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
            "l_returnflag": t["l_returnflag"],
        })

    (_read(sf_dir, "lineitem",
           columns=["l_orderkey", "l_quantity", "l_returnflag"])
     .map_batches(prep, batch_format="pyarrow").write_csv(out))

    back = rd.read_csv(out)
    g = back.groupby("l_returnflag").aggregate(
        Count(alias_name="n_items"),
        Sum("qty", alias_name="sum_qty"),
        Max("l_orderkey", alias_name="max_orderkey"))
    return g.map_batches(
        lambda t: pa.table({
            "l_returnflag": t["l_returnflag"],
            "n_items": pc.cast(t["n_items"], pa.int64()),
            "sum_qty": pc.cast(t["sum_qty"], pa.int64()),
            "max_orderkey": pc.cast(t["max_orderkey"], pa.int64()),
        }), batch_format="pyarrow")


def q_events_user_streaks(sf_dir: str):
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands window pattern (functions/ranking.py::
    longest_streak). Day = epoch-µs integer-divided by 86,400,000,000
    (both sides use integer division, so the day boundary is
    bit-identical to the SQL mirror's ``epoch_us(ts) // 86400000000``)."""
    from kafka_connect_mongo_ray.functions.ranking import longest_streak

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "d": pc.divide(us, pa.scalar(86_400_000_000,
                                                      pa.int64()))})

    return longest_streak(ds.map_batches(prep, batch_format="pyarrow"),
                          key="user_id", day_col="d",
                          out_col="streak_days",
                          num_partitions=_gate_buckets())


def q_cdc_scd2_history(sf_dir: str):
    """SCD Type-2 dimension history from the change stream
    (functions/ranking.py::validity_intervals): every upsert opens a
    validity interval, the key's next change (upsert or tombstone)
    closes it, tombstones consume rows — the history table a CDC
    consumer materializes instead of the LWW head. One hash-bucket
    exchange; the oracle derives the same intervals analytically from
    the deterministic stream."""
    from kafka_connect_mongo_ray.functions.ranking import validity_intervals

    out = validity_intervals(doc_change_events(sf_dir),
                             key_cols=["path"], order_cols=["ts", "inc"],
                             ts_col="ts", op_col="op",
                             num_partitions=_gate_buckets())
    return out.select_columns(["repo", "path", "lang", "content",
                               "valid_from", "valid_to", "is_current"])


def q_events_twa_value(sf_dir: str):
    """Per-user TIME-weighted average of the value series
    (functions/ranking.py::time_weighted_avg): each observation is
    held until the user's next event, so the mean weights each value
    by its holding duration. Numerator and denominator are exact int64
    sums (cents × µs); the single float op is the final division, so
    the mirror is bit-exact. Single-observation users emit no row."""
    from kafka_connect_mongo_ray.functions.ranking import time_weighted_avg

    out = time_weighted_avg(_events_ts_us(sf_dir, extra_cols=["value"],
                                          cents=True),
                            key="user_id", order_cols=["ts_us", "event_id"],
                            ts_col="ts_us", val_col="cents",
                            out_col="twa_cents",
                            num_partitions=_gate_buckets())
    return out.select_columns(["user_id", "twa_cents"])


def q_events_user_entropy(sf_dir: str):
    """Per-user Shannon entropy of the event-type distribution
    (functions/stats.py::grouped_entropy) — the behavioural-diversity
    signal (0 ⇒ single-type users). Two count-domain stages: batch-
    local (user, type) partial counts, one hash-bucket exchange,
    reduceat merge + the entropy closed form at the shared 6-dp grid
    (the same float path as docs_char_entropy, whose DuckDB
    ``entropy()`` mirror is pinned by the gate)."""
    from kafka_connect_mongo_ray.functions.stats import grouped_entropy

    return grouped_entropy(
        _read(sf_dir, "events", columns=["user_id", "event_type"]),
        group_col="user_id", val_col="event_type")


def q_events_welch_ttest(sf_dir: str):
    """Welch's unequal-variance t between purchase and click values
    (functions/stats.py::welch_t_components) — the A/B-test primitive:
    exact int64 (n, Σx, Σx²) partials per batch, one 2-row exchange,
    operand-order-mirrored closed forms for t and the Welch–
    Satterthwaite df. Scalar output (one row)."""
    from kafka_connect_mongo_ray.functions.stats import welch_t_components

    return welch_t_components(
        _read(sf_dir, "events", columns=["event_type", "value"]),
        label_col="event_type", int_col="value",
        label_a="purchase", label_b="click", scale=100)


# ---------------------------------------------------------------------------
# registry


def build_queries():
    return {
    # Ordering contract (round 5): the driver snapshots the FIRST
    # min(50, N) entries each round, so the 82 queries without any
    # CORRECTNESS_r01..r04 row come first -- the 50 highest-value
    # (compositions, persisted-index, dedup, text/embedding
    # families) in slots 0-49, the remaining 32 no-row variants
    # next, then the 100 driver-green queries (r01-r04 union),
    # whose implementations are unchanged since their green commit.
    # Registry FROZEN at 182 until the backlog is driver-green.
        # -- slots 0-49: driver-unverified, highest value --
        "cdc_curated_stream": q_cdc_curated_stream,
        "cdc_incremental_view": q_cdc_incremental_view,
        "cdc_time_travel": q_cdc_time_travel,
        "dedup_incremental": q_dedup_incremental,
        "docs_bm25": q_docs_bm25,
        "ann_ivf_persisted": q_ann_ivf_persisted,
        "embedding_pca": q_embedding_pca,
        "training_set_prep": q_training_set_prep,
        "dedup_components": q_dedup_components,
        "events_rollup": q_events_rollup,
        "cdc_curated_time_scoped": q_cdc_curated_time_scoped,
        "cdc_curated_minhash": q_cdc_curated_minhash,
        "dedup_incremental_minhash": q_dedup_incremental_minhash,
        "corpus_decontam_prep": q_corpus_decontam_prep,
        "dedup_keep_best": q_dedup_keep_best,
        "dedup_normalized": q_dedup_normalized,
        "dedup_edit_distance": q_dedup_edit_distance,
        "docs_tfidf_top": q_docs_tfidf_top,
        "docs_bm25_multi": q_docs_bm25_multi,
        "docs_unigram_logprob": q_docs_unigram_logprob,
        "docs_bigram_top": q_docs_bigram_top,
        "docs_contamination": q_docs_contamination,
        "docs_pack_sequences": q_docs_pack_sequences,
        "embedding_kmeans": q_embedding_kmeans,
        "embedding_group_centroids": q_embedding_group_centroids,
        "join_parts_bloom_semi": q_join_parts_bloom_semi,
        "join_full_outer": q_join_full_outer,
        "docs_pii_scan": q_docs_pii_scan,
        "docs_source_policy": q_docs_source_policy,
        "docs_balanced_sample": q_docs_balanced_sample,
        "docs_stratified_sample": q_docs_stratified_sample,
        "docs_length_trim": q_docs_length_trim,
        "docs_char_entropy": q_docs_char_entropy,
        "docs_repetition_stats": q_docs_repetition_stats,
        "orders_revenue_gini": q_orders_revenue_gini,
        "lineitem_quantiles_cont": q_lineitem_quantiles_cont,
        "lineitem_quantiles_by_flag": q_lineitem_quantiles_by_flag,
        "lineitem_quantiles_refine": q_lineitem_quantiles_refine,
        "lineitem_mad": q_lineitem_mad,
        "lineitem_mad_refine": q_lineitem_mad_refine,
        "lineitem_profile": q_lineitem_profile,
        "events_cube": q_events_cube,
        "events_grouping_sets": q_events_grouping_sets,
        "events_pivot_types": q_events_pivot_types,
        "events_unpivot_roundtrip": q_events_unpivot_roundtrip,
        "events_asof_forward": q_events_asof_forward,
        "events_cohort_retention": q_events_cohort_retention,
        "events_funnel": q_events_funnel,
        "events_attribution": q_events_attribution,
        "events_transitions": q_events_transitions,
        # -- slots 50-81: driver-unverified variants --
        "part_skyline": q_part_skyline,
        "orders_weighted_sample": q_orders_weighted_sample,
        "events_type_cooccurrence": q_events_type_cooccurrence,
        "events_ohlc": q_events_ohlc,
        "events_rolling_wau": q_events_rolling_wau,
        "events_chi2": q_events_chi2,
        "events_except_all_views": q_events_except_all_views,
        "events_throttle": q_events_throttle,
        "orders_revenue_top": q_orders_revenue_top,
        "events_winsorized": q_events_winsorized,
        "orders_pareto": q_orders_pareto,
        "events_anomaly_mad": q_events_anomaly_mad,
        "orders_rfm": q_orders_rfm,
        "events_moving_avg": q_events_moving_avg,
        "lineitem_corr": q_lineitem_corr,
        "events_heavy_hitters": q_events_heavy_hitters,
        "events_user_dense_rank": q_events_user_dense_rank,
        "events_intersect_users": q_events_intersect_users,
        "events_except_users": q_events_except_users,
        "orders_argmax_order": q_orders_argmax_order,
        "lineitem_linreg": q_lineitem_linreg,
        "events_ntile": q_events_ntile,
        "events_percent_rank": q_events_percent_rank,
        "lineitem_histogram": q_lineitem_histogram,
        "events_mode_per_type": q_events_mode_per_type,
        "events_quantiles_approx": q_events_quantiles_approx,
        "events_rank_ties": q_events_rank_ties,
        "orders_monthly_revenue": q_orders_monthly_revenue,
        "events_distinct_users_exact": q_events_distinct_users_exact,
        "events_user_paths": q_events_user_paths,
        "lineitem_zscore": q_lineitem_zscore,
        "lineitem_corr_by_flag": q_lineitem_corr_by_flag,
        # -- slots 82+: driver-green r01-r04 --
        "cdc_scd2_history": q_cdc_scd2_history,
        "cdc_incremental_moments": q_cdc_incremental_moments,
        "cdc_secondary_lookup": q_cdc_secondary_lookup,
        "cdc_incremental_distinct": q_cdc_incremental_distinct,
        "cdc_state_as_of": q_cdc_state_as_of,
        "lineitem_linreg_by_flag": q_lineitem_linreg_by_flag,
        "events_twa_value": q_events_twa_value,
        "events_user_entropy": q_events_user_entropy,
        "events_welch_ttest": q_events_welch_ttest,
        "dq_audit": q_dq_audit,
        "events_user_streaks": q_events_user_streaks,
        "events_json_source": q_events_json_source,
        "lineitem_csv_source": q_lineitem_csv_source,
        "tpch_forecast_revenue": q_tpch_forecast_revenue,
        "tpch_min_cost_supplier": q_tpch_min_cost_supplier,
        "lineitem_skew_by_flag": q_lineitem_skew_by_flag,
        "orders_mom_growth": q_orders_mom_growth,
        "multimodal_resize": q_multimodal_resize,
        "multimodal_audio_features": q_multimodal_audio_features,
        "ann_ivf_incremental": q_ann_ivf_incremental,
        "docs_bm25_persisted": q_docs_bm25_persisted,
        "cdc_curated_ann": q_cdc_curated_ann,
        "events_fill_forward": q_events_fill_forward,
        "events_asof_tolerance": q_events_asof_tolerance,
        "events_interpolate": q_events_interpolate,
        "supplier_customer_pagerank": q_supplier_customer_pagerank,
        "supplier_cosupply_triangles": q_supplier_cosupply_triangles,
        "tpch_custorder_distribution": q_tpch_custorder_distribution,
        "tpch_small_qty_revenue": q_tpch_small_qty_revenue,
        "tpch_top_supplier": q_tpch_top_supplier,
        "tpch_waiting_suppliers": q_tpch_waiting_suppliers,
        "tpch_dominant_suppliers": q_tpch_dominant_suppliers,
        "tpch_shipping_priority": q_tpch_shipping_priority,
        "tpch_nation_volume": q_tpch_nation_volume,
        "docs_chunk_dedup": q_docs_chunk_dedup,
        "cdc_key_range_scan": q_cdc_key_range_scan,
        "tpch_important_parts": q_tpch_important_parts,
        "tpch_late_ship_priority": q_tpch_late_ship_priority,
        "tpch_regional_revenue": q_tpch_regional_revenue,
        "tpch_market_share": q_tpch_market_share,
        "tpch_product_profit": q_tpch_product_profit,
        "tpch_priority_linestatus_mix": q_tpch_priority_linestatus_mix,
        "tpch_large_orders": q_tpch_large_orders,
        "tpch_lapsed_rich_customers": q_tpch_lapsed_rich_customers,
        "events_hourly_gapfill": q_events_hourly_gapfill,
        "corpus_mixture": q_corpus_mixture,
        "tpch_returned_top_customers": q_tpch_returned_top_customers,
        "tpch_promo_share": q_tpch_promo_share,
        "tpch_supplier_variety": q_tpch_supplier_variety,
        "tpch_disjunctive_revenue": q_tpch_disjunctive_revenue,
        "cdc_final_state": q_cdc_final_state,
        "cdc_event_counts": q_cdc_event_counts,
        "cdc_tombstone_keys": q_cdc_tombstone_keys,
        "cdc_lww_user_state": q_cdc_lww_user_state,
        "cdc_resume_tokens": q_cdc_resume_tokens,
        "cdc_backfill_union_tail": q_cdc_backfill_union_tail,
        "cdc_wal_tail": q_cdc_wal_tail,
        "cdc_change_feed": q_cdc_change_feed,
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
        "tpch_pricing_summary": q_tpch_pricing_summary,
        "join_lineitem_part_supplier": q_join_lineitem_part_supplier,
        "events_hopping_window": q_events_hopping_window,
        "events_topk_per_group": q_events_topk_per_group,
        "events_asof_join": q_events_asof_join,
        "docs_quality_filter": q_docs_quality_filter,
        "corpus_prep": q_corpus_prep,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "dedup_embedding_lsh": q_dedup_embedding_lsh,
        "events_distinct_users_hll": q_events_distinct_users_hll,
        "docs_langid": q_docs_langid,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_simhash": q_dedup_simhash,
        "multimodal_decode": q_multimodal_decode,
        "multimodal_audio": q_multimodal_audio,
        "multimodal_video": q_multimodal_video,
        "multimodal_frames": q_multimodal_frames,
        "lineitem_quantiles": q_lineitem_quantiles,
        "orders_sample_md5": q_orders_sample_md5,
        "lineitem_price_brackets": q_lineitem_price_brackets,
        "events_user_hll_by_type": q_events_user_hll_by_type,
        "events_lag_delta": q_events_lag_delta,
        "events_running_sum": q_events_running_sum,
        "events_global_rank": q_events_global_rank,
        "join_anti_customers": q_join_anti_customers,
        "join_semi_parts": q_join_semi_parts,
    }


def build_oracle_sql():
    from kafka_connect_mongo_ray.functions.text import PII_PATTERNS as _PII

    # composed from the SAME pattern constants the engine compiles, so
    # the two sides cannot drift (both are RE2)
    _pii_cols = ",\n                   ".join(
        f"CAST(SUM(len(regexp_extract_all(coalesce(text, ''), "
        f"'{p}'))) AS BIGINT) AS {n}" for n, p in _PII.items())
    _pii_flag = " OR ".join(
        f"len(regexp_extract_all(coalesce(text, ''), '{p}')) > 0"
        for p in _PII.values())
    return {
        # analytic mirror of the deterministic change stream: version
        # ver of doc d lives at ts=1000+ver, the next version (or the
        # doc's tombstone at 1000+(doc_id%5)+1 when doc_id%7=0) closes
        # it; the last un-closed version is current
        "cdc_scd2_history": """
            WITH v AS (
                SELECT doc_id, source, lang, text,
                       doc_id % 5 AS maxv,
                       (doc_id % 7 = 0) AS deleted,
                       unnest(generate_series(0, doc_id % 5)) AS ver
                FROM documents)
            SELECT source AS repo,
                   CAST(doc_id AS VARCHAR) AS path,
                   lang,
                   text || ':v' || CAST(ver AS VARCHAR) AS content,
                   CAST(1000 + ver AS BIGINT) AS valid_from,
                   CAST(CASE WHEN ver < maxv OR deleted
                             THEN 1001 + ver END AS BIGINT) AS valid_to,
                   (ver = maxv AND NOT deleted) AS is_current
            FROM v
        """,
        # the global lineitem_linreg mirror with GROUP BY; HUGEINT
        # keeps the cross products exact, intercept uses the ROUNDED
        # slope (same staged CTE), half-away 9-dp grid on both sides
        "lineitem_linreg_by_flag": """
            WITH m AS (
              SELECT l_returnflag,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy,
                     CAST(SUM(x * y) AS BIGINT) AS sxy,
                     CAST(SUM(x * x) AS BIGINT) AS sx2,
                     CAST(SUM(y * y) AS BIGINT) AS sy2
              FROM (SELECT l_returnflag,
                           CAST(ROUND(l_quantity) AS BIGINT) AS x,
                           CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
                    FROM lineitem)
              GROUP BY l_returnflag),
            h AS (
              SELECT l_returnflag, n, sx, sy,
                     CAST(n AS HUGEINT) * sxy
                       - CAST(sx AS HUGEINT) * sy AS num,
                     CAST(n AS HUGEINT) * sx2
                       - CAST(sx AS HUGEINT) * sx AS denx,
                     CAST(n AS HUGEINT) * sy2
                       - CAST(sy AS HUGEINT) * sy AS deny
              FROM m),
            s AS (
              SELECT *, ROUND(CAST(num AS DOUBLE)
                              / CAST(denx AS DOUBLE), 9) AS slope
              FROM h)
            SELECT l_returnflag, n, slope,
                   ROUND((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                         / CAST(n AS DOUBLE), 9) AS intercept,
                   ROUND(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
                         / (CAST(denx AS DOUBLE)
                            * CAST(deny AS DOUBLE)), 9) AS r2
            FROM s
        """,
        # state at cutoff ts=1002: version min(doc_id%5, 2) is the
        # latest at or before the cutoff; the tombstone (at
        # 1001+doc_id%5 for doc_id%7=0) has landed only for docs with
        # doc_id%5 <= 1
        "cdc_state_as_of": """
            SELECT source AS repo, CAST(doc_id AS VARCHAR) AS path, lang,
                   text || ':v' || CAST(LEAST(doc_id % 5, 2) AS VARCHAR)
                   AS content
            FROM documents
            WHERE NOT (doc_id % 7 = 0 AND doc_id % 5 <= 1)
        """,
        # retraction-safe incremental distinct: live keys per value
        # over the final set (tail tombstones retracted)
        "cdc_incremental_distinct": """
            SELECT lang AS val, CAST(COUNT(*) AS BIGINT) AS n_keys
            FROM documents WHERE doc_id % 7 <> 0
            GROUP BY lang
        """,
        # the index answers membership over the LIVE final set — keys
        # tombstoned by the tail window (doc_id % 7 = 0) are retracted
        "cdc_secondary_lookup": """
            SELECT source AS repo, CAST(doc_id AS VARCHAR) AS path
            FROM documents WHERE doc_id % 7 <> 0 AND lang = 'fr'
        """,
        # same live-set CTE as cdc_incremental_view; mean/variance
        # derived from exact int64 (n, Σx, Σx²) with the engine's
        # parenthesization (m = s1/n; var = s2/n − m·m) at 9 dp
        "cdc_incremental_moments": """
            WITH live AS (
                SELECT source, CASE WHEN doc_id % 3 <> 0
                                    THEN text || ':u' ELSE text END AS c
                FROM documents WHERE doc_id % 7 <> 0),
            p AS (SELECT source AS repo, COUNT(*) AS n,
                         SUM(length(c)) AS s1,
                         SUM(length(c)*length(c)) AS s2
                  FROM live GROUP BY source)
            SELECT repo, CAST(n AS BIGINT) AS n_live,
                   ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 9)
                   AS mean_chars,
                   ROUND(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                         - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                           * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 9)
                   AS var_chars
            FROM p
        """,
        # exact int64 cents·µs sums; the ONLY float op is the final
        # division of the two exact sums (int→double conversion is
        # correctly rounded in both engines, so bit-exact above 2^53)
        "events_twa_value": """
            WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS tsu,
                              CAST(ROUND(value*100) AS BIGINT) AS c
                       FROM events),
            l AS (SELECT user_id, c,
                         LEAD(tsu) OVER (PARTITION BY user_id
                                         ORDER BY tsu, event_id) - tsu
                         AS dur
                  FROM x)
            SELECT user_id,
                   CAST(SUM(c*dur) AS DOUBLE) / CAST(SUM(dur) AS DOUBLE)
                   AS twa_cents
            FROM l WHERE dur IS NOT NULL
            GROUP BY user_id
            HAVING SUM(dur) > 0
        """,
        # DuckDB entropy() is base-2 Shannon over value instances —
        # same closed form as the engine's reduceat kernel at 6 dp
        "events_user_entropy": """
            SELECT user_id, ROUND(entropy(event_type), 6) AS ent
            FROM events GROUP BY user_id
        """,
        # operand-order-mirrored Welch t: every multiply / divide /
        # subtract happens in the same order on the same exact int64
        # (n, Σx, Σx²) sums as functions/stats.py::welch_t_components
        "events_welch_ttest": """
            WITH x AS (SELECT event_type AS lab,
                              CAST(ROUND(value*100) AS BIGINT) AS c
                       FROM events
                       WHERE event_type IN ('purchase','click')),
            p AS (SELECT lab, COUNT(*) AS n, SUM(c) AS s1,
                         SUM(c*c) AS s2
                  FROM x GROUP BY lab),
            m AS (SELECT lab, n,
                         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mm,
                         CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS e2
                  FROM p),
            v AS (SELECT lab, n, mm,
                         ((e2 - mm*mm) *
                          (CAST(n AS DOUBLE)/(CAST(n AS DOUBLE)-1)))
                         / CAST(n AS DOUBLE) AS vn
                  FROM m),
            ab AS (SELECT
                    (SELECT n  FROM v WHERE lab='purchase') AS n_a,
                    (SELECT n  FROM v WHERE lab='click')    AS n_b,
                    (SELECT mm FROM v WHERE lab='purchase') AS mean_a,
                    (SELECT mm FROM v WHERE lab='click')    AS mean_b,
                    (SELECT vn FROM v WHERE lab='purchase') AS vna,
                    (SELECT vn FROM v WHERE lab='click')    AS vnb)
            SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
                   ROUND(mean_a, 9) AS mean_a, ROUND(mean_b, 9) AS mean_b,
                   ROUND((mean_a - mean_b) / sqrt(vna + vnb), 9) AS t_stat,
                   ROUND(((vna+vnb)*(vna+vnb)) /
                         ((vna*vna)/(CAST(n_a AS DOUBLE)-1)
                          + (vnb*vnb)/(CAST(n_b AS DOUBLE)-1)), 9) AS df_w
            FROM ab
        """,
        "dq_audit": """
            SELECT 'li_quantity_not_null' AS check_name,
                   CAST(COUNT(*) AS BIGINT) AS n_checked,
                   CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT)
                       AS n_violations
            FROM lineitem
            UNION ALL
            SELECT 'li_price_nonnegative',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(COALESCE(SUM(CASE WHEN l_extendedprice < 0.0
                                          THEN 1 ELSE 0 END), 0) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'li_discount_policy',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(COALESCE(SUM(CASE WHEN l_discount < 0.0
                                            OR l_discount > 0.05
                                          THEN 1 ELSE 0 END), 0) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'li_returnflag_domain',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(COALESCE(SUM(CASE WHEN l_returnflag IS NOT NULL
                                            AND l_returnflag
                                                NOT IN ('A', 'N', 'R')
                                          THEN 1 ELSE 0 END), 0) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'ord_priority_strict',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(COALESCE(SUM(CASE WHEN o_orderpriority IS NOT NULL
                                            AND o_orderpriority NOT IN
                                        ('1-URGENT', '2-HIGH', '3-MEDIUM')
                                          THEN 1 ELSE 0 END), 0) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'ord_orderkey_unique',
                   CAST(COUNT(o_orderkey) AS BIGINT),
                   CAST(COUNT(o_orderkey)
                        - COUNT(DISTINCT o_orderkey) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'li_orderkey_fk',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(COALESCE(SUM(CASE WHEN o.k IS NULL
                                          THEN 1 ELSE 0 END), 0) AS BIGINT)
            FROM (SELECT l_orderkey FROM lineitem
                  WHERE l_orderkey IS NOT NULL) l
            LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) o
              ON l.l_orderkey = o.k
        """,
        "events_user_streaks": """
            WITH days AS (
                SELECT DISTINCT user_id,
                       epoch_us(ts) // 86400000000 AS d
                FROM events
            ), isl AS (
                SELECT user_id, d,
                       d - ROW_NUMBER() OVER (PARTITION BY user_id
                                              ORDER BY d) AS island
                FROM days
            ), runs AS (
                SELECT user_id, island, COUNT(*) AS cnt
                FROM isl GROUP BY user_id, island
            )
            SELECT user_id, CAST(MAX(cnt) AS BIGINT) AS streak_days
            FROM runs GROUP BY user_id
        """,
        "events_json_source": """
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(user_id) AS BIGINT) AS sum_user_id,
                   CAST(MAX(event_id) AS BIGINT) AS max_event_id
            FROM events GROUP BY event_type
        """,
        "lineitem_csv_source": """
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n_items,
                   CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                       AS sum_qty,
                   CAST(MAX(l_orderkey) AS BIGINT) AS max_orderkey
            FROM lineitem GROUP BY l_returnflag
        """,
        "tpch_forecast_revenue": """
            SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
                   CAST(COALESCE(SUM(
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round(l_discount * 100) AS BIGINT)), 0)
                        AS BIGINT) AS revenue_units,
                   ROUND(CAST(COALESCE(SUM(
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round(l_discount * 100) AS BIGINT)), 0)
                        AS DOUBLE) / 10000.0, 9) AS revenue
            FROM lineitem
            WHERE year(l_shipdate) = 1995
              AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
              AND l_quantity < 24
        """,
        "tpch_min_cost_supplier": """
            WITH rs AS (
                SELECT s_suppkey, s_name
                FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = 'EUROPE'),
            costs AS (
                SELECT l_partkey AS p_partkey,
                       l_suppkey AS s_suppkey,
                       CAST(MIN(CAST(round(l_extendedprice * 100)
                                     AS BIGINT)) AS BIGINT) AS cost_cents
                FROM lineitem
                JOIN rs ON l_suppkey = rs.s_suppkey
                GROUP BY 1, 2),
            best AS (
                SELECT p_partkey, MIN(cost_cents) AS min_cost
                FROM costs GROUP BY 1)
            SELECT c.p_partkey, c.s_suppkey, c.cost_cents,
                   p.p_name, r2.s_name
            FROM costs c
            JOIN best b ON c.p_partkey = b.p_partkey
                       AND c.cost_cents = b.min_cost
            JOIN part p ON p.p_partkey = c.p_partkey
            JOIN rs r2 ON r2.s_suppkey = c.s_suppkey
        """,
        "lineitem_skew_by_flag": """
            WITH m AS (
                SELECT l_returnflag,
                       CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(q) AS BIGINT) AS s1,
                       CAST(SUM(q * q) AS BIGINT) AS s2,
                       CAST(SUM((q * q) * q) AS BIGINT) AS s3,
                       CAST(SUM((q * q) * (q * q)) AS BIGINT) AS s4
                FROM (SELECT l_returnflag,
                             CAST(round(l_quantity) AS BIGINT) AS q
                      FROM lineitem)
                GROUP BY 1),
            f AS (
                SELECT l_returnflag, n,
                       CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
                       CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS e2,
                       CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS e3,
                       CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS e4
                FROM m),
            g AS (
                SELECT l_returnflag, n,
                       e2 - m1 * m1 AS m2,
                       e3 - (3.0 * m1) * e2
                          + (2.0 * (m1 * m1)) * m1 AS m3,
                       e4 - (4.0 * m1) * e3
                          + (6.0 * (m1 * m1)) * e2
                          - 3.0 * ((m1 * m1) * (m1 * m1)) AS m4
                FROM f)
            SELECT l_returnflag, n,
                   ROUND(m3 / (sqrt(m2) * m2), 9) AS skew,
                   ROUND(m4 / (m2 * m2) - 3.0, 9) AS kurt
            FROM g
        """,
        "orders_mom_growth": """
            WITH m AS (
                SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate)
                            AS BIGINT) AS ym,
                       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                            AS BIGINT) AS revenue_cents
                FROM orders GROUP BY 1)
            SELECT ym, revenue_cents,
                   ROUND((100.0 * CAST(revenue_cents
                                       - LAG(revenue_cents)
                                         OVER (ORDER BY ym) AS DOUBLE))
                         / CAST(LAG(revenue_cents) OVER (ORDER BY ym)
                                AS DOUBLE), 9) AS growth_pct
            FROM m
        """,
        "tpch_custorder_distribution": """
            SELECT CAST(c_count AS BIGINT) AS c_count,
                   CAST(COUNT(*) AS BIGINT) AS custdist
            FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
                  FROM customer c
                  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                  GROUP BY c.c_custkey)
            GROUP BY c_count
        """,
        "tpch_small_qty_revenue": """
            SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
                   CAST(COALESCE(SUM(CAST(round(l.l_extendedprice * 100)
                                          AS BIGINT)), 0) AS BIGINT)
                   AS sum_cents
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
                       AND p.p_brand = 'Brand#13'
            WHERE CAST(round(l.l_quantity) AS BIGINT) * 5
                  * (SELECT COUNT(*) FROM lineitem l2
                     WHERE l2.l_partkey = l.l_partkey)
                  < (SELECT SUM(CAST(round(l2.l_quantity) AS BIGINT))
                     FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        """,
        "tpch_top_supplier": """
            WITH rev AS (
                SELECT l_suppkey AS s_suppkey,
                       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                                * (100 - CAST(round(l_discount * 100)
                                              AS BIGINT))) AS BIGINT)
                       AS total_rev
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                  AND l_shipdate < TIMESTAMP '1997-04-01'
                GROUP BY 1)
            SELECT r.s_suppkey, r.total_rev, s.s_name
            FROM rev r JOIN supplier s ON s.s_suppkey = r.s_suppkey
            WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
        """,
        # Q20-shaped dominance (no partsupp: shipped volume stands in
        # for availability; 2·qty > total is the division-free compare)
        "tpch_dominant_suppliers": """
            WITH red AS (SELECT p_partkey FROM part
                         WHERE p_name LIKE '%red%'),
            sq AS (
                SELECT l_partkey, l_suppkey,
                       SUM(CAST(round(l_quantity) AS BIGINT)) AS qty
                FROM lineitem JOIN red ON l_partkey = p_partkey
                WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                  AND l_shipdate < TIMESTAMP '1998-01-01'
                GROUP BY l_partkey, l_suppkey
            ),
            tot AS (SELECT l_partkey, SUM(qty) AS tq FROM sq
                    GROUP BY l_partkey)
            SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS n_dominated
            FROM sq JOIN tot USING (l_partkey)
            JOIN supplier s ON sq.l_suppkey = s.s_suppkey
            WHERE 2 * sq.qty > tot.tq
            GROUP BY s.s_name
        """,
        "tpch_waiting_suppliers": """
            WITH pairs AS (
                SELECT l.l_orderkey AS ok, l.l_suppkey AS sk,
                       MAX(CASE WHEN l.l_shipdate >
                                     o.o_orderdate + INTERVAL 90 DAY
                                THEN 1 ELSE 0 END) AS late
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                WHERE o.o_orderstatus = 'F'
                GROUP BY 1, 2),
            sole AS (
                SELECT ok FROM pairs
                GROUP BY ok
                HAVING COUNT(*) >= 2 AND SUM(late) = 1)
            SELECT p.sk AS s_suppkey, s.s_name,
                   CAST(COUNT(*) AS BIGINT) AS numwait
            FROM pairs p
            JOIN sole USING (ok)
            JOIN supplier s ON s.s_suppkey = p.sk
            WHERE p.late = 1
            GROUP BY 1, 2
        """,
        "tpch_shipping_priority": """
            SELECT l.l_orderkey AS o_orderkey,
                   CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l.l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                   AS revenue_cents,
                   o.o_orderdate, o.o_orderpriority
            FROM customer c
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-06-01'
              AND l.l_shipdate > TIMESTAMP '1998-06-01'
            GROUP BY 1, 3, 4
            ORDER BY revenue_cents DESC, o_orderkey
            LIMIT 10
        """,
        "tpch_important_parts": """
            WITH pv AS (SELECT l_partkey AS p_partkey,
                               CAST(SUM(CAST(round(l_extendedprice * 100)
                                             AS BIGINT)) AS BIGINT)
                               AS value_cents
                        FROM lineitem GROUP BY 1)
            SELECT pv.p_partkey, pv.value_cents, p.p_name
            FROM pv JOIN part p ON p.p_partkey = pv.p_partkey
            WHERE pv.value_cents * (SELECT COUNT(*) FROM pv) * 10
                  > 13 * (SELECT SUM(value_cents) FROM pv)
        """,
        "cdc_key_range_scan": """
            SELECT source AS repo, CAST(doc_id AS VARCHAR) AS path, lang,
                   text || ':v' || CAST(doc_id % 5 AS VARCHAR) AS content
            FROM documents
            WHERE doc_id % 7 <> 0
              AND source >= 'src2' AND source <= 'src4'
        """,
        "tpch_nation_volume": """
            SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                   CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l.l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                   AS revenue_cents
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation sn ON sn.n_nationkey = s.s_nationkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation cn ON cn.n_nationkey = c.c_nationkey
            WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_8')
                   OR (sn.n_name = 'NATION_8' AND cn.n_name = 'NATION_3'))
              AND l.l_shipdate >= TIMESTAMP '1997-01-01'
              AND l.l_shipdate < TIMESTAMP '1999-01-01'
            GROUP BY 1, 2, 3
        """,
        "docs_chunk_dedup": """
            WITH w AS (
                SELECT doc_id,
                       unnest(string_split(text, ' ')) AS word,
                       generate_subscripts(string_split(text, ' '), 1)
                       AS wi
                FROM documents),
            c AS (
                SELECT doc_id, (wi - 1) // 10 AS pidx,
                       string_agg(word, ' ' ORDER BY wi) AS chunk
                FROM w GROUP BY 1, 2),
            win AS (
                SELECT chunk, MIN(doc_id * 4096 + pidx) AS comp
                FROM c GROUP BY chunk),
            k AS (
                SELECT comp // 4096 AS doc_id, comp % 4096 AS pidx, chunk
                FROM win),
            tot AS (
                SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks
                FROM c GROUP BY doc_id)
            SELECT k.doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                   string_agg(k.chunk, ' ' ORDER BY k.pidx) AS text_dedup,
                   MAX(tot.n_chunks) AS n_chunks
            FROM k JOIN tot ON tot.doc_id = k.doc_id
            GROUP BY k.doc_id
        """,
        "tpch_late_ship_priority": """
            SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_late
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate
                                               + INTERVAL 90 DAY)
            GROUP BY o_orderpriority
        """,
        "tpch_regional_revenue": """
            SELECT r.r_name, n.n_name,
                   CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l.l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                   AS revenue_cents
            FROM customer c
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
                           AND s.s_nationkey = c.c_nationkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY r.r_name, n.n_name
        """,
        # Q8-shaped market share: the share ships as its two int-cent
        # sums (nation numerator, regional total) — no float division
        # crosses the engine boundary (the Q22 scalar rule)
        "tpch_market_share": """
            SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT)
                       AS o_year,
                   CAST(SUM(CASE WHEN s.s_nationkey = 2 THEN
                           CAST(round(l.l_extendedprice * 100) AS BIGINT)
                           * (100 - CAST(round(l.l_discount * 100)
                                         AS BIGINT)) ELSE 0 END)
                        AS BIGINT) AS nation_rev_cents,
                   CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l.l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                       AS total_rev_cents
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation cn ON c.c_nationkey = cn.n_nationkey
            JOIN region r ON cn.n_regionkey = r.r_regionkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY o_year
        """,
        # Q9-shaped profit (no partsupp table in the inventory: the
        # cost side is the retailprice proxy, mirrored verbatim)
        "tpch_product_profit": """
            SELECT n.n_name,
                   CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT)
                       AS o_year,
                   CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l.l_discount * 100)
                                          AS BIGINT))
                            - CAST(round(p.p_retailprice * 100) AS BIGINT)
                              * CAST(round(l.l_quantity) AS BIGINT) * 100)
                        AS BIGINT) AS profit_cents
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE p.p_name LIKE '%red%'
            GROUP BY n.n_name, o_year
        """,
        "tpch_priority_linestatus_mix": """
            SELECT l.l_linestatus,
                   CAST(SUM(CASE WHEN o.o_orderpriority IN
                                 ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT)
                   AS high_line_count,
                   CAST(SUM(CASE WHEN o.o_orderpriority IN
                                 ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT)
                   AS low_line_count
            FROM orders o
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
              AND l.l_shipdate < TIMESTAMP '1999-01-01'
            GROUP BY l.l_linestatus
        """,
        "tpch_large_orders": """
            SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
                   CAST(round(o.o_totalprice * 100) AS BIGINT)
                   AS total_cents,
                   c.c_name, q.sum_qty
            FROM (SELECT l_orderkey,
                         CAST(SUM(CAST(round(l_quantity) AS BIGINT))
                              AS BIGINT) AS sum_qty
                  FROM lineitem GROUP BY l_orderkey
                  HAVING SUM(CAST(round(l_quantity) AS BIGINT)) > 200) q
            JOIN orders o ON o.o_orderkey = q.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
        """,
        "tpch_lapsed_rich_customers": """
            SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
                   CAST(COUNT(*) AS BIGINT) AS n_rich,
                   CAST(SUM(CAST(FLOOR(c.c_acctbal) AS BIGINT)) AS BIGINT)
                   AS bal_floor
            FROM customer c
            WHERE c.c_acctbal
                  * (SELECT CAST(COUNT(*) AS DOUBLE) FROM customer
                     WHERE c_acctbal > 0)
                  > (SELECT CAST(SUM(CAST(FLOOR(c_acctbal) AS BIGINT))
                                 AS DOUBLE)
                     FROM customer WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderdate >= TIMESTAMP '1999-01-01')
            GROUP BY c.c_nationkey
        """,
        "corpus_mixture": _mixture_oracle_sql(),
        "tpch_returned_top_customers": """
            SELECT o.o_custkey, c.c_name,
                   CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l.l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                   AS revenue_cents
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            WHERE l.l_returnflag = 'R'
              AND o.o_orderdate >= TIMESTAMP '1998-01-01'
              AND o.o_orderdate < TIMESTAMP '1999-01-01'
            GROUP BY o.o_custkey, c.c_name
            ORDER BY revenue_cents DESC, o.o_custkey
            LIMIT 20
        """,
        "tpch_promo_share": """
            SELECT CAST(year(l.l_shipdate) * 100 + month(l.l_shipdate)
                        AS BIGINT) AS ym,
                   ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                          THEN CAST(round(l.l_extendedprice
                                                          * 100) AS BIGINT)
                                               * (100 - CAST(round(
                                                     l.l_discount * 100)
                                                     AS BIGINT))
                                          ELSE 0 END) AS DOUBLE)
                         / CAST(SUM(CAST(round(l.l_extendedprice * 100)
                                         AS BIGINT)
                                    * (100 - CAST(round(l.l_discount * 100)
                                                  AS BIGINT)))
                                AS DOUBLE), 9)
                   AS promo_share
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY 1
        """,
        "docs_source_policy": """
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(array_length(string_split(text, ' ')))
                        AS BIGINT) AS sum_tokens,
                   CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
                   SUM(array_length(string_split(text, ' ')))
                       >= 24 * COUNT(*) AS keep
            FROM documents
            GROUP BY source
        """,
        "embedding_pca": """
            SELECT CAST(MAX(len(embedding)) AS BIGINT) AS dim,
                   CAST(COUNT(*) AS BIGINT) AS n_vectors,
                   TRUE AS rq_ge_axis
            FROM embeddings
        """,
        "tpch_disjunctive_revenue": """
            SELECT CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l.l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                   AS revenue_cents
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE (p.p_brand = 'Brand#5'
                   AND p.p_size BETWEEN 1 AND 10
                   AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 1 AND 20)
               OR (p.p_brand = 'Brand#19'
                   AND p.p_size BETWEEN 5 AND 25
                   AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 10
                                                               AND 40)
               OR (p.p_type = 'PROMO'
                   AND CAST(round(l.l_quantity) AS BIGINT) >= 30)
        """,
        "tpch_supplier_variety": """
            SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size,
                   CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT)
                   AS supplier_cnt
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_brand <> 'Brand#13'
            GROUP BY p.p_brand, p.p_size
        """,
        "events_hourly_gapfill": """
            WITH b AS (SELECT CAST(date_trunc('hour', min(ts)) AS TIMESTAMP)
                              AS lo,
                              CAST(date_trunc('hour', max(ts)) AS TIMESTAMP)
                              AS hi
                       FROM events),
                 hours AS (SELECT unnest(generate_series(
                               (SELECT lo FROM b), (SELECT hi FROM b),
                               INTERVAL 1 HOUR)) AS hour_ts),
                 types AS (SELECT DISTINCT event_type FROM events),
                 cnt AS (SELECT event_type,
                                CAST(date_trunc('hour', ts) AS TIMESTAMP)
                                AS hour_ts,
                                COUNT(*) AS n
                         FROM events GROUP BY 1, 2)
            SELECT t.event_type, h.hour_ts,
                   CAST(COALESCE(c.n, 0) AS BIGINT) AS n
            FROM types t
            CROSS JOIN hours h
            LEFT JOIN cnt c ON c.event_type = t.event_type
                           AND c.hour_ts = h.hour_ts
        """,
        "events_cohort_retention": """
            WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
                       FROM events),
                 f AS (SELECT user_id, MIN(d) AS d0 FROM a
                       GROUP BY user_id)
            SELECT strftime(f.d0, '%Y-%m-%d') AS cohort_day,
                   CAST(date_diff('day', f.d0, a.d) AS BIGINT)
                       AS day_offset,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM a JOIN f USING (user_id)
            GROUP BY 1, 2
        """,
        # strict 2-D dominance anti-join (minimize price, maximize size)
        "part_skyline": """
            SELECT p.p_partkey, p.p_retailprice, p.p_size
            FROM part p
            WHERE NOT EXISTS (
                SELECT 1 FROM part q
                WHERE q.p_retailprice <= p.p_retailprice
                  AND q.p_size >= p.p_size
                  AND (q.p_retailprice < p.p_retailprice
                       OR q.p_size > p.p_size))
        """,
        # priority = (cents·2^33)/(2h+1): one IEEE multiply + one IEEE
        # divide of exactly-representable integers — bit-identical to
        # the engine's numpy expression
        "orders_weighted_sample": """
            WITH p AS (
                SELECT o_orderkey,
                       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                       CAST('0x' ||
                            substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)
                            AS BIGINT) AS h
                FROM orders)
            SELECT o_orderkey, cents,
                   (CAST(cents AS DOUBLE) * 8589934592) / (2 * h + 1)
                       AS priority
            FROM p
            ORDER BY priority DESC, o_orderkey
            LIMIT 500
        """,
        "events_type_cooccurrence": """
            WITH ut AS (SELECT DISTINCT user_id, event_type FROM events
                        WHERE event_type IS NOT NULL)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM ut a JOIN ut b ON a.user_id = b.user_id
                              AND a.event_type < b.event_type
            GROUP BY 1, 2
        """,
        "events_ohlc": """
            WITH b AS (
                SELECT event_type,
                       CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT)
                           AS bar_us,
                       value, ts, event_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY event_type, date_trunc('hour', ts)
                           ORDER BY ts, event_id) AS ra,
                       ROW_NUMBER() OVER (
                           PARTITION BY event_type, date_trunc('hour', ts)
                           ORDER BY ts DESC, event_id DESC) AS rd
                FROM events)
            SELECT event_type, bar_us,
                   MAX(CASE WHEN ra = 1 THEN value END) AS "open",
                   MAX(value) AS high, MIN(value) AS low,
                   MAX(CASE WHEN rd = 1 THEN value END) AS "close",
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM b GROUP BY event_type, bar_us
        """,
        "events_rolling_wau": """
            WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
                       FROM events),
                 days AS (SELECT DISTINCT d FROM a)
            SELECT strftime(days.d, '%Y-%m-%d') AS day,
                   CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS wau
            FROM days JOIN a ON a.d BETWEEN days.d - 6 AND days.d
            GROUP BY 1
        """,
        # G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx), x ascending, 1-based;
        # HUGEINT keeps Σ i·x exact, then the same two DOUBLE casts +
        # one division as the engine's Python-int scan
        "orders_revenue_gini": """
            WITH r AS (SELECT o_custkey,
                              SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                                  AS x
                       FROM orders GROUP BY o_custkey),
                 s AS (SELECT x, ROW_NUMBER() OVER
                                 (ORDER BY x, o_custkey) AS i FROM r)
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS total_cents,
                   CAST(2 * SUM(CAST(i AS HUGEINT) * x)
                        - (COUNT(*) + 1) * CAST(SUM(x) AS HUGEINT)
                        AS DOUBLE)
                   / CAST(COUNT(*) * CAST(SUM(x) AS HUGEINT) AS DOUBLE)
                       AS gini
            FROM s
        """,
        "events_transitions": """
            WITH s AS (SELECT event_type,
                              LEAD(event_type) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
                       FROM events)
            SELECT event_type AS from_type, nxt AS to_type,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM s WHERE nxt IS NOT NULL
            GROUP BY 1, 2
        """,
        # the analytic BACKFILL state (v1): every doc live at its
        # original text — updates and tombstones only land in v2
        "cdc_time_travel": """
            SELECT source AS repo, CAST(doc_id AS VARCHAR) AS path,
                   text AS content
            FROM documents
        """,
        "lineitem_profile": """
            SELECT c AS "column", n, n_null, min_v, max_v FROM (
                SELECT 'l_quantity' AS c, CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT)
                           AS n_null,
                       CAST(MIN(l_quantity) AS DOUBLE) AS min_v,
                       CAST(MAX(l_quantity) AS DOUBLE) AS max_v
                FROM lineitem
                UNION ALL
                SELECT 'l_extendedprice', CAST(COUNT(*) AS BIGINT),
                       CAST(COUNT(*) - COUNT(l_extendedprice) AS BIGINT),
                       CAST(MIN(l_extendedprice) AS DOUBLE),
                       CAST(MAX(l_extendedprice) AS DOUBLE)
                FROM lineitem
                UNION ALL
                SELECT 'l_discount', CAST(COUNT(*) AS BIGINT),
                       CAST(COUNT(*) - COUNT(l_discount) AS BIGINT),
                       CAST(MIN(l_discount) AS DOUBLE),
                       CAST(MAX(l_discount) AS DOUBLE)
                FROM lineitem)
        """,
        "docs_balanced_sample": """
            SELECT doc_id, source FROM documents
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 50
        """,
        "events_throttle": """
            SELECT event_id FROM (
                SELECT event_id,
                       epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS d
                FROM events)
            WHERE d IS NULL OR d > 60000000
        """,
        "events_except_all_views": """
            SELECT user_id FROM events WHERE event_type = 'view'
            EXCEPT ALL
            SELECT user_id FROM events WHERE event_type = 'click'
        """,
        "events_attribution": """
            SELECT a.user_id,
                   a.event_id AS purchase_id,
                   b.event_id AS click_id,
                   CAST(epoch_us(a.ts) - epoch_us(b.ts) AS BIGINT)
                       AS gap_us
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts
            WHERE a.event_type = 'purchase' AND b.event_type = 'click'
        """,
        # the analytic final live set of the backfill+tail fixture:
        # live = doc_id%7<>0, content = text||':u' iff doc_id%3<>0
        "cdc_incremental_view": """
            WITH live AS (
                SELECT source, CASE WHEN doc_id % 3 <> 0
                                    THEN text || ':u' ELSE text END AS c
                FROM documents WHERE doc_id % 7 <> 0)
            SELECT source AS repo, CAST(COUNT(*) AS BIGINT) AS n_live,
                   CAST(SUM(length(c)) AS BIGINT) AS total_chars,
                   CAST(SUM(len(regexp_extract_all(c, '\\S+')))
                        AS BIGINT) AS n_tokens
            FROM live GROUP BY source
        """,
        # per-cell (O−E)²/E mirrored operand-for-operand; round(·, 9)
        # absorbs the cross-cell SUM order difference
        "events_chi2": """
            WITH c AS (SELECT event_type AS t,
                              CAST(user_id % 2 AS BIGINT) AS g,
                              CAST(COUNT(*) AS BIGINT) AS o
                       FROM events GROUP BY 1, 2),
                 m AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM c),
                 rt AS (SELECT t, CAST(SUM(o) AS BIGINT) AS rt
                        FROM c GROUP BY t),
                 ct AS (SELECT g, CAST(SUM(o) AS BIGINT) AS ct
                        FROM c GROUP BY g)
            SELECT m.n AS n,
                   CAST(((SELECT COUNT(*) FROM rt) - 1)
                        * ((SELECT COUNT(*) FROM ct) - 1) AS BIGINT)
                       AS dof,
                   round(SUM(
                       pow(coalesce(c.o, 0)
                           - (CAST(rt.rt AS DOUBLE) * ct.ct) / m.n, 2)
                       / ((CAST(rt.rt AS DOUBLE) * ct.ct) / m.n)), 9)
                       AS chi2
            -- full R×C cross product: unobserved cells count as O = 0
            FROM rt CROSS JOIN ct CROSS JOIN m
            LEFT JOIN c ON c.t = rt.t AND c.g = ct.g
            GROUP BY m.n
        """,
        "docs_pii_scan": f"""
            SELECT source, {_pii_cols},
                   CAST(SUM(CASE WHEN {_pii_flag} THEN 1 ELSE 0 END)
                        AS BIGINT) AS flagged_docs,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY source
        """,
        # TPC-H Q3 shape; revenue in exact integer cents×(100-disc)
        "orders_revenue_top": """
            SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
                   CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)
                            * (100 - CAST(round(l.l_discount*100)
                                          AS BIGINT))) AS BIGINT)
                   AS revenue_cents
            FROM customer c
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-07-01'
              AND l.l_shipdate > TIMESTAMP '1998-07-01'
            GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
            ORDER BY revenue_cents DESC, o.o_orderkey
            LIMIT 10
        """,
        "dedup_normalized": """
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(coalesce(text, '')),
                                           '[^a-z0-9]+', ' ', 'g')))
                   AS fingerprint
            FROM documents
            QUALIFY ROW_NUMBER() OVER (PARTITION BY fingerprint
                                       ORDER BY doc_id) = 1
        """,
        # windows = snapshot versions 1..3 (w inserts doc_id%3==w at
        # ts=w; window 1 / version 2 also updates doc_id%6==0 docs to
        # text||':u'). Admission = first (window, doc_id) ever to carry
        # a fingerprint — exactly ROW_NUMBER over the change relation.
        "cdc_curated_stream": """
            WITH changes AS (
                SELECT CAST(doc_id % 3 + 1 AS BIGINT) AS win, doc_id,
                       md5(coalesce(text, '')) AS fp
                FROM documents
                UNION ALL
                SELECT 2, doc_id, md5(coalesce(text, '') || ':u')
                FROM documents WHERE doc_id % 6 = 0
            )
            SELECT win, doc_id, fp FROM changes
            QUALIFY ROW_NUMBER() OVER (PARTITION BY fp
                                       ORDER BY win, doc_id) = 1
        """,
        # spread-ts curation (window w's events at ts = 10w + doc_id%10;
        # window 1 / version 2 also updates doc_id%6==0 at 10+doc_id%10)
        # time-scoped to ts ∈ [5, 14]: admission is the same ROW_NUMBER
        # relation, the scope is a plain WHERE over the admitted row's ts
        "cdc_curated_time_scoped": """
            WITH changes AS (
                SELECT CAST(doc_id % 3 + 1 AS BIGINT) AS win, doc_id,
                       CAST(10 * (doc_id % 3) + doc_id % 10 AS BIGINT) AS ts,
                       md5(coalesce(text, '')) AS fp
                FROM documents
                UNION ALL
                SELECT 2, doc_id, CAST(10 + doc_id % 10 AS BIGINT),
                       md5(coalesce(text, '') || ':u')
                FROM documents WHERE doc_id % 6 = 0
            ),
            adm AS (
                SELECT win, doc_id, ts, fp FROM changes
                QUALIFY ROW_NUMBER() OVER (PARTITION BY fp
                                           ORDER BY win, doc_id) = 1
            )
            SELECT win, doc_id, ts, fp FROM adm WHERE ts BETWEEN 5 AND 14
        """,
        # minhash curation: LSH drops are probabilistic — the checked-
        # boolean pattern (see dedup_incremental_minhash); only the
        # window-2 candidate count is deterministic enough to mirror
        "cdc_curated_minhash": """
            SELECT CAST((SELECT COUNT(*) FROM documents
                         WHERE doc_id % 2 = 1)
                      + (SELECT COUNT(*) FROM documents
                         WHERE doc_id % 4 = 0) AS BIGINT) AS n_w1,
                   TRUE AS copies_dropped, TRUE AS partition_ok
        """,
        # exact whitespace tokens (the retrieval.py contract); ties at
        # the k boundary break by ascending bigram on both sides
        "docs_bigram_top": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws
                          FROM documents),
            pairs AS (SELECT ws[g.i] || ' ' || ws[g.i+1] AS bigram
                      FROM toks,
                           LATERAL (SELECT unnest(range(1, len(ws)))
                                    AS i) g)
            SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
            FROM pairs GROUP BY bigram
            ORDER BY n DESC, bigram LIMIT 50
        """,
        # DuckDB list slicing is 1-based inclusive: ws[i:i+4] is the
        # 5-token window starting at i; range(1, len-3) stops the last
        # window exactly at the text's end
        "docs_contamination": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws
                          FROM documents),
            grams AS (SELECT doc_id,
                             array_to_string(ws[g.i:g.i+4], ' ') AS g
                      FROM toks,
                           LATERAL (SELECT unnest(range(1, len(ws)-3))
                                    AS i) g),
            tr AS (SELECT DISTINCT g FROM grams WHERE doc_id % 2 = 0),
            te AS (SELECT DISTINCT doc_id, g FROM grams
                   WHERE doc_id % 2 = 1)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
            FROM te JOIN tr USING (g) GROUP BY doc_id
        """,
        "docs_length_trim": """
            WITH b AS (SELECT source,
                              quantile_disc(n_chars, 0.1) AS lo,
                              quantile_disc(n_chars, 0.9) AS hi
                       FROM documents GROUP BY source)
            SELECT d.doc_id, d.source, d.n_chars
            FROM documents d JOIN b USING (source)
            WHERE d.n_chars BETWEEN b.lo AND b.hi
        """,
        # DuckDB entropy() is base-2 Shannon over value frequencies —
        # exactly log2(n) - Σ c·log2(c) / n; both sides round to 6
        # (sum-order float noise ~1e-15, the unigram_logprob precedent)
        "docs_char_entropy": """
            WITH ch AS (SELECT doc_id, substr(text, g.i, 1) AS c
                        FROM documents,
                             LATERAL (SELECT
                                      unnest(range(1, len(text)+1))
                                      AS i) g)
            SELECT doc_id, ROUND(entropy(c), 6) AS ent
            FROM ch GROUP BY doc_id
        """,
        "dedup_keep_best": f"""
            WITH RECURSIVE pairs AS ({{shingle_pairs}}),
            edges AS (SELECT id_a AS s, id_b AS d FROM pairs
                      UNION ALL SELECT id_b, id_a FROM pairs),
            reach(node, comp) AS (
                SELECT DISTINCT s, s FROM edges
                UNION
                SELECT e.d, r.comp FROM reach r JOIN edges e ON e.s = r.node
            ),
            comps AS (SELECT node AS doc_id, MIN(comp) AS component
                      FROM reach GROUP BY node)
            SELECT component, d.doc_id AS keep_id,
                   d.n_chars AS keep_chars
            FROM comps JOIN documents d USING (doc_id)
            QUALIFY ROW_NUMBER() OVER (PARTITION BY component
                                       ORDER BY d.n_chars DESC,
                                                d.doc_id) = 1
        """.replace("{shingle_pairs}",
                    SHINGLE_PAIR_SQL.format(thr=JACCARD_THRESHOLD)),
        "events_winsorized": """
            WITH x AS (SELECT event_type,
                              CAST(ROUND(value * 100) AS BIGINT) AS c
                       FROM events),
            b AS (SELECT event_type,
                         quantile_disc(c, 0.05) AS lo,
                         quantile_disc(c, 0.95) AS hi
                  FROM x GROUP BY event_type)
            SELECT x.event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(LEAST(GREATEST(x.c, b.lo), b.hi)) AS BIGINT)
                   AS winsorized
            FROM x JOIN b USING (event_type)
            GROUP BY x.event_type
        """,
        # HLL checked-boolean pattern: the engine computes invariants
        # guaranteed by construction; SQL asserts the literals plus the
        # deterministic window size
        "dedup_incremental_minhash": """
            SELECT CAST(COUNT(*) AS BIGINT) AS n_w2,
                   TRUE AS exact_dups_dropped,
                   TRUE AS partition_ok
            FROM documents WHERE doc_id % 2 = 1
        """,
        # med/MAD from the quantile_disc CTEs; 5*mad is int-exact
        "events_anomaly_mad": """
            WITH x AS (SELECT event_type,
                              CAST(ROUND(value * 100) AS BIGINT) AS c
                       FROM events),
            m AS (SELECT event_type, quantile_disc(c, 0.5) AS med
                  FROM x GROUP BY event_type),
            d AS (SELECT x.event_type, x.c, m.med,
                         quantile_disc(ABS(x.c - m.med), 0.5)
                         OVER (PARTITION BY x.event_type) AS mad
                  FROM x JOIN m USING (event_type))
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN ABS(c - med) > 5 * mad
                            THEN 1 ELSE 0 END) AS BIGINT) AS outliers
            FROM d GROUP BY event_type
        """,
        # NTILE(4) ties broken by custkey so both sides are total
        "orders_rfm": """
            WITH a AS (SELECT o_custkey,
                              MAX(epoch_us(o_orderdate) // 86400000000)
                              AS last_day,
                              CAST(COUNT(*) AS BIGINT) AS n_orders,
                              CAST(SUM(CAST(ROUND(o_totalprice*100)
                                            AS BIGINT)) AS BIGINT)
                              AS cents
                       FROM orders GROUP BY o_custkey)
            SELECT o_custkey,
                   CAST(NTILE(4) OVER (ORDER BY last_day DESC,
                                       o_custkey) AS BIGINT) AS r,
                   CAST(NTILE(4) OVER (ORDER BY n_orders DESC,
                                       o_custkey) AS BIGINT) AS f,
                   CAST(NTILE(4) OVER (ORDER BY cents DESC,
                                       o_custkey) AS BIGINT) AS m
            FROM a
        """,
        # window 1 = even ids (index build), window 2 = odd ids;
        # survivor = first odd id per fingerprint never seen in w1
        "dedup_incremental": """
            WITH w1 AS (SELECT DISTINCT md5(coalesce(text, '')) AS fp
                        FROM documents WHERE doc_id % 2 = 0),
            w2 AS (SELECT doc_id, md5(coalesce(text, '')) AS fp
                   FROM documents WHERE doc_id % 2 = 1),
            firsts AS (SELECT doc_id, fp FROM w2
                       QUALIFY ROW_NUMBER() OVER (PARTITION BY fp
                                                  ORDER BY doc_id) = 1)
            SELECT doc_id, fp FROM firsts
            WHERE fp NOT IN (SELECT fp FROM w1)
        """,
        # composition of docs_length_trim + docs_contamination + an
        # anti join; SUM over int64 n_chars is exact
        "corpus_decontam_prep": """
            WITH b AS (SELECT source,
                              quantile_disc(n_chars, 0.1) AS lo,
                              quantile_disc(n_chars, 0.9) AS hi
                       FROM documents GROUP BY source),
            trimmed AS (SELECT d.doc_id, d.source, d.n_chars
                        FROM documents d JOIN b USING (source)
                        WHERE d.n_chars BETWEEN b.lo AND b.hi),
            toks AS (SELECT doc_id, string_split(text, ' ') AS ws
                     FROM documents),
            grams AS (SELECT doc_id,
                             array_to_string(ws[g.i:g.i+4], ' ') AS g
                      FROM toks,
                           LATERAL (SELECT unnest(range(1, len(ws)-3))
                                    AS i) g),
            tr AS (SELECT DISTINCT g FROM grams WHERE doc_id % 2 = 0),
            contam AS (SELECT DISTINCT doc_id FROM grams
                       WHERE doc_id % 2 = 1
                         AND g IN (SELECT g FROM tr))
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars
            FROM trimmed
            WHERE doc_id NOT IN (SELECT doc_id FROM contam)
            GROUP BY source
        """,
        # prior cumulative (cum - rev) < 0.8*tot: identical float
        # operands both sides, so the boundary comparison is bit-equal
        "orders_pareto": """
            WITH r AS (SELECT o_custkey,
                              CAST(SUM(CAST(ROUND(o_totalprice*100)
                                            AS BIGINT)) AS BIGINT) AS rev
                       FROM orders GROUP BY o_custkey),
            t AS (SELECT CAST(SUM(rev) AS BIGINT) AS tot FROM r),
            c AS (SELECT o_custkey, rev,
                         SUM(rev) OVER (ORDER BY rev DESC, o_custkey)
                         AS cum
                  FROM r)
            SELECT o_custkey, rev FROM c, t
            WHERE cum - rev < 0.8 * tot
        """,
        # same cents-scaling idiom as lineitem_quantiles (prices are
        # exact cents, so round == rint on every value)
        "lineitem_mad_refine": """
            WITH x AS (SELECT l_linestatus,
                              CAST(round(l_extendedprice*100) AS BIGINT)
                              AS c
                       FROM lineitem),
            m AS (SELECT l_linestatus, quantile_disc(c, 0.5) AS med
                  FROM x GROUP BY l_linestatus)
            SELECT x.l_linestatus, CAST(m.med AS BIGINT) AS med_scaled,
                   CAST(quantile_disc(ABS(x.c - m.med), 0.5) AS BIGINT)
                   AS mad_scaled
            FROM x JOIN m USING (l_linestatus)
            GROUP BY x.l_linestatus, m.med
        """,
        "lineitem_mad": """
            WITH x AS (SELECT l_returnflag,
                              CAST(round(l_extendedprice*100) AS BIGINT)
                              AS c
                       FROM lineitem),
            m AS (SELECT l_returnflag, quantile_disc(c, 0.5) AS med
                  FROM x GROUP BY l_returnflag)
            SELECT x.l_returnflag, CAST(m.med AS BIGINT) AS med_scaled,
                   CAST(quantile_disc(ABS(x.c - m.med), 0.5) AS BIGINT)
                   AS mad_scaled
            FROM x JOIN m USING (l_returnflag)
            GROUP BY x.l_returnflag, m.med
        """,
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
        "cdc_change_feed": """
            SELECT 'd' AS op, source AS repo, CAST(doc_id AS VARCHAR) AS path,
                   CAST(NULL AS VARCHAR) AS content, CAST(2 AS BIGINT) AS ts
            FROM documents WHERE doc_id % 7 = 0
            UNION ALL
            SELECT 'u' AS op, source AS repo, CAST(doc_id AS VARCHAR) AS path,
                   text || ':u' AS content, CAST(1 AS BIGINT) AS ts
            FROM documents WHERE doc_id % 3 <> 0 AND doc_id % 7 <> 0
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
        "tpch_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                       AS sum_base_cents,
                   CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                       AS BIGINT)) AS BIGINT) AS sum_disc_x10k,
                   CAST(COUNT(*) AS BIGINT) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "join_lineitem_part_supplier": """
            SELECT p_brand, n_name, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                       AS BIGINT)) AS BIGINT) AS revenue_x10k
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY p_brand, n_name
        """,
        "events_hopping_window": f"""
            SELECT event_type,
                   CAST((FLOOR(epoch_us(ts) / {HOP_US}) - k) * {HOP_US} AS BIGINT)
                       AS window_start,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) hops
            GROUP BY 1, 2
        """,
        "events_asof_join": """
            WITH clicks AS (SELECT user_id, epoch_us(ts) AS tsu, event_id
                            FROM events WHERE event_type = 'click'),
                 views AS (SELECT user_id, epoch_us(ts) AS tsu,
                                  event_id AS view_event_id
                           FROM events WHERE event_type = 'view')
            SELECT c.user_id, c.tsu, c.event_id,
                   CAST(v.view_event_id AS DOUBLE) AS view_event_id
            FROM clicks c ASOF LEFT JOIN views v
              ON c.user_id = v.user_id AND c.tsu >= v.tsu
        """,
        "events_asof_tolerance": f"""
            WITH clicks AS (SELECT user_id, epoch_us(ts) AS tsu, event_id
                            FROM events WHERE event_type = 'click'),
                 views AS (SELECT user_id, epoch_us(ts) AS tsu,
                                  event_id AS view_event_id
                           FROM events WHERE event_type = 'view')
            SELECT c.user_id, c.tsu, c.event_id,
                   CAST(CASE WHEN v.tsu >= c.tsu - {ASOF_TOLERANCE_US}
                             THEN v.view_event_id END AS DOUBLE)
                       AS view_event_id
            FROM clicks c ASOF LEFT JOIN views v
              ON c.user_id = v.user_id AND c.tsu >= v.tsu
        """,
        "training_set_prep": f"""
            WITH sampled AS (
                SELECT doc_id, text FROM documents
                WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < CASE lang
                      WHEN 'en' THEN '{STRATA_HEX['en']}'
                      WHEN 'fr' THEN '{STRATA_HEX['fr']}'
                      WHEN 'es' THEN '{STRATA_HEX['es']}'
                      WHEN 'de' THEN '{STRATA_HEX['de']}'
                      ELSE '00000000' END),
            kept AS (SELECT MIN(doc_id) AS doc_id FROM sampled
                     GROUP BY md5(text)),
            docs AS (SELECT s.doc_id, s.text FROM sampled s
                     JOIN kept k ON s.doc_id = k.doc_id),
            counted AS (SELECT doc_id,
                               CAST(len(string_split(text, ' ')) AS BIGINT)
                                   AS n_tokens,
                               doc_id % {PACK_BUCKETS} AS bucket
                        FROM docs)
            SELECT doc_id, n_tokens, bucket,
                   CAST(start // {PACK_SEQ_LEN} AS BIGINT) AS seq_id,
                   CAST(start % {PACK_SEQ_LEN} AS BIGINT) AS "offset"
            FROM (SELECT doc_id, n_tokens, bucket,
                         COALESCE(SUM(n_tokens) OVER (
                             PARTITION BY bucket ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS start
                  FROM counted)
        """,
        "events_asof_forward": """
            WITH clicks AS (SELECT user_id, epoch_us(ts) AS tsu, event_id
                            FROM events WHERE event_type = 'click'),
                 views AS (SELECT user_id, epoch_us(ts) AS tsu,
                                  event_id AS view_event_id
                           FROM events WHERE event_type = 'view')
            SELECT c.user_id, c.tsu, c.event_id,
                   CAST(v.view_event_id AS DOUBLE) AS view_event_id
            FROM clicks c ASOF LEFT JOIN views v
              ON c.user_id = v.user_id AND c.tsu <= v.tsu
        """,
        "events_topk_per_group": """
            SELECT event_type, event_id, ROUND(value, 3) AS value FROM (
                SELECT event_type, event_id, value,
                       ROW_NUMBER() OVER (PARTITION BY event_type
                                          ORDER BY value DESC, event_id) AS rn
                FROM events) t
            WHERE rn <= 2
        """,
        "docs_quality_filter": f"""
            SELECT doc_id,
                   CAST(array_length(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
            WHERE array_length(string_split(text, ' ')) >= {QUALITY_MIN_TOKENS}
              AND length(text) >= {QUALITY_MIN_CHARS}
        """,
        "corpus_prep": f"""
            WITH survivors AS (
                SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
            ),
            removed AS (
                SELECT DISTINCT id_b AS doc_id
                FROM ({SHINGLE_PAIR_SQL.format(thr=JACCARD_THRESHOLD)}) p
            )
            SELECT d.doc_id,
                   CAST(array_length(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
            FROM documents d
            JOIN survivors s USING (doc_id)
            LEFT JOIN removed r USING (doc_id)
            WHERE r.doc_id IS NULL
              AND array_length(string_split(d.text, ' ')) >= {QUALITY_MIN_TOKENS}
              AND length(d.text) >= {QUALITY_MIN_CHARS}
        """,
        "dedup_minhash_lsh": SHINGLE_PAIR_SQL.format(thr=JACCARD_THRESHOLD),
        "dedup_ngram_jaccard": WORD_NGRAM_PAIR_SQL.format(
            n=NGRAM_N, thr=NGRAM_JACCARD_THRESHOLD),
        "dedup_simhash": (
            "SELECT id_a, id_b, TRUE AS agreement_ok FROM ("
            + SHINGLE_PAIR_SQL.format(thr=JACCARD_THRESHOLD) + ") t"
        ),
        "dedup_embedding_lsh": f"""
            SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
                   TRUE AS recall_ok, TRUE AS precision_ok
            FROM embeddings a, embeddings b
            WHERE b.vec_id > a.vec_id
              AND list_cosine_similarity(a.embedding, b.embedding) >= {NEAR_DUP_COSINE}
        """,
        "ann_lsh_topk": f"""
            SELECT vec_id AS query_id, CAST({ANN_K} AS BIGINT) AS n_results,
                   TRUE AS recall_ok
            FROM embeddings WHERE vec_id < {ANN_NUM_QUERIES}
        """,
        "ann_ivf_topk": f"""
            SELECT vec_id AS query_id, CAST({ANN_K} AS BIGINT) AS n_results,
                   TRUE AS recall_ok
            FROM embeddings WHERE vec_id < {ANN_NUM_QUERIES}
        """,
        "ann_ivf_persisted": f"""
            SELECT vec_id AS query_id, CAST({ANN_K} AS BIGINT) AS n_results,
                   TRUE AS recall_ok
            FROM embeddings WHERE vec_id < {ANN_NUM_QUERIES}
        """,
        "ann_ivf_incremental": f"""
            SELECT vec_id AS query_id, CAST({ANN_K} AS BIGINT) AS n_results,
                   TRUE AS exact_ok
            FROM embeddings WHERE vec_id < {ANN_NUM_QUERIES}
        """,
        "cdc_curated_ann": """
            SELECT CAST(COUNT(*) AS BIGINT) AS n_indexed,
                   TRUE AS exact_ok, TRUE AS idempotent_ok
            FROM documents
        """,
        "supplier_cosupply_triangles": """
            WITH os AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
                        FROM lineitem),
            e AS (SELECT DISTINCT a.s AS u, b.s AS v
                  FROM os a JOIN os b ON a.o = b.o AND a.s < b.s)
            SELECT CAST(COUNT(*) AS BIGINT) AS triangles
            FROM e e1
            JOIN e e2 ON e2.u = e1.v
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        """,
        "supplier_customer_pagerank": """
            WITH e0 AS (SELECT DISTINCT l_suppkey AS s, o_custkey AS c
                        FROM lineitem
                        JOIN orders ON o_orderkey = l_orderkey),
            edges AS (SELECT s * 2 AS src, c * 2 + 1 AS dst FROM e0
                      UNION ALL
                      SELECT c * 2 + 1, s * 2 FROM e0),
            nn AS (SELECT COUNT(DISTINCT src) AS n FROM edges),
            outdeg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
            r0 AS (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS r
                   FROM outdeg),
            r1 AS (SELECT e.dst AS node,
                          0.15 / (SELECT n FROM nn)
                          + 0.85 * SUM(r0.r / o.d) AS r
                   FROM edges e
                   JOIN r0 ON r0.node = e.src
                   JOIN outdeg o ON o.src = e.src
                   GROUP BY e.dst),
            r2 AS (SELECT e.dst AS node,
                          0.15 / (SELECT n FROM nn)
                          + 0.85 * SUM(r1.r / o.d) AS r
                   FROM edges e
                   JOIN r1 ON r1.node = e.src
                   JOIN outdeg o ON o.src = e.src
                   GROUP BY e.dst)
            SELECT node, ROUND(r, 9) AS rank FROM r2
        """,
        "events_interpolate": """
            WITH b AS (SELECT event_id, user_id, epoch_us(ts) AS tsu,
                              CASE WHEN event_type = 'purchase'
                                   THEN value END AS v
                       FROM events),
            w AS (SELECT event_id, user_id, tsu, v,
                    last_value(v IGNORE NULLS) OVER win_p AS pv,
                    last_value(CASE WHEN v IS NOT NULL THEN tsu END
                               IGNORE NULLS) OVER win_p AS pt,
                    first_value(v IGNORE NULLS) OVER win_n AS nv,
                    first_value(CASE WHEN v IS NOT NULL THEN tsu END
                                IGNORE NULLS) OVER win_n AS nt
                  FROM b
                  WINDOW win_p AS (PARTITION BY user_id
                                   ORDER BY tsu, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW),
                         win_n AS (PARTITION BY user_id
                                   ORDER BY tsu, event_id
                                   ROWS BETWEEN CURRENT ROW
                                            AND UNBOUNDED FOLLOWING))
            SELECT event_id, user_id,
                   CASE WHEN v IS NOT NULL THEN v
                        WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt > pt
                        THEN ROUND(pv + (nv - pv)
                                   * (CAST(tsu - pt AS DOUBLE)
                                      / CAST(nt - pt AS DOUBLE)), 9)
                   END AS interp
            FROM w
        """,
        "events_fill_forward": """
            SELECT event_id, user_id,
                   last_value(CASE WHEN event_type = 'purchase'
                                   THEN value END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS filled
            FROM events
        """,
        "events_distinct_users_hll": """
            SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
                   TRUE AS within_bound
            FROM events
        """,
        "docs_langid": """
            WITH w AS (SELECT doc_id,
                              regexp_extract_all(lower(text),
                                  '[a-záéíóúüñàèìòùäöß]+') AS words,
                              regexp_matches(substr(text, 1, 200),
                                  '[一-鿿]') AS cjk
                       FROM documents),
            sc AS (SELECT doc_id, cjk, len(words) AS nw,
                len(list_filter(words, x -> x IN ('der','die','und','das','ist',
                    'von','mit','den','nicht','ein'))) AS s_de,
                len(list_filter(words, x -> x IN ('the','and','of','to','a',
                    'in','is','it','that','for'))) AS s_en,
                len(list_filter(words, x -> x IN ('el','la','de','que','y',
                    'en','un','por','con','los'))) AS s_es,
                len(list_filter(words, x -> x IN ('le','la','de','et','les',
                    'des','est','un','une','dans'))) AS s_fr
                FROM w)
            SELECT doc_id, CASE
                WHEN nw = 0 THEN 'unknown'
                WHEN cjk THEN 'zh'
                WHEN GREATEST(s_de, s_en, s_es, s_fr) = 0 THEN 'unknown'
                WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                WHEN s_es >= s_fr THEN 'es'
                ELSE 'fr' END AS lang_pred
            FROM sc
        """,
        "multimodal_decode": """
            SELECT doc_id AS media_id,
                   CAST(1 + doc_id % 16 AS BIGINT) AS width,
                   CAST(1 + doc_id % 13 AS BIGINT) AS height,
                   CAST((1 + doc_id % 16) * (1 + doc_id % 13) AS BIGINT) AS n_pixels,
                   CAST(doc_id % 256 AS DOUBLE) AS mean_pixel
            FROM documents
        """,
        "multimodal_audio": """
            SELECT doc_id AS media_id,
                   CAST(8000 AS BIGINT) AS sample_rate,
                   CAST(100 + doc_id % 50 AS BIGINT) AS n_samples,
                   CAST((100 + doc_id % 50) * 125 AS BIGINT) AS duration_us,
                   CAST(doc_id % 1000 AS BIGINT) AS max_amp
            FROM documents
        """,
        "multimodal_video": """
            SELECT doc_id AS media_id,
                   CAST(4 + doc_id % 8 AS BIGINT) AS width,
                   CAST(3 + doc_id % 5 AS BIGINT) AS height,
                   CAST(2 + doc_id % 6 AS BIGINT) AS n_frames,
                   CAST((2 + doc_id % 6) * 33333 AS BIGINT) AS duration_us,
                   CAST(doc_id % 256 AS DOUBLE) AS mean_first_frame,
                   CAST((doc_id + 1 + doc_id % 6) % 256 AS DOUBLE) AS mean_last_frame
            FROM documents
        """,
        "multimodal_frames": """
            WITH clip AS (
                SELECT doc_id, 2 + doc_id % 6 AS n,
                       LEAST(3, 2 + doc_id % 6) AS k
                FROM documents),
            idx AS (
                SELECT DISTINCT doc_id,
                       CAST((j * (n - 1)) // (k - 1) AS INTEGER) AS frame_idx
                FROM clip CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) js
                WHERE j < k)
            SELECT doc_id AS media_id, frame_idx,
                   CAST((doc_id + frame_idx) % 256 AS DOUBLE) AS frame_mean
            FROM idx
        """,
        "multimodal_resize": """
            WITH g AS (SELECT doc_id, 2 + doc_id % 15 AS w FROM documents)
            SELECT doc_id AS media_id,
                   CAST(4 AS BIGINT) AS out_width,
                   CAST(3 AS BIGINT) AS out_height,
                   CAST(((doc_id + (0 * w) // 4) % 256
                       + (doc_id + (1 * w) // 4) % 256
                       + (doc_id + (2 * w) // 4) % 256
                       + (doc_id + (3 * w) // 4) % 256) / 4.0
                       AS DOUBLE) AS resized_mean,
                   CAST(47 AS BIGINT) AS payload_bytes
            FROM g
        """,
        "multimodal_audio_features": """
            SELECT doc_id AS media_id,
                   CAST(100 + doc_id % 50 AS BIGINT) AS n_samples,
                   CAST(doc_id % 1000 AS DOUBLE) AS rms,
                   CAST(doc_id % 1000 AS BIGINT) AS peak,
                   CAST(CASE WHEN doc_id % 1000 > 0
                             THEN 99 + doc_id % 50 ELSE 0 END
                        AS BIGINT) AS zero_crossings
            FROM documents
        """,
        "lineitem_quantiles": " UNION ALL ".join(
            f"""SELECT CAST({q} AS DOUBLE) AS q,
                       quantile_disc(CAST(round(l_extendedprice*100) AS BIGINT),
                                     {q}) AS value_scaled
                FROM lineitem"""
            for q in QUANTILE_QS),
        "lineitem_quantiles_cont": " UNION ALL ".join(
            f"""SELECT CAST({q} AS DOUBLE) AS q,
                       ROUND(quantile_cont(
                           CAST(round(l_extendedprice*100) AS BIGINT),
                           {q}), 9) AS value_cont
                FROM lineitem"""
            for q in QUANTILE_QS),
        "embedding_group_centroids": """
            SELECT lang, dim, ROUND(SUM(v) / COUNT(*), 6) AS value
            FROM (SELECT d.lang,
                         unnest(generate_series(1, len(e.embedding))) AS dim,
                         unnest(e.embedding) AS v
                  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id) t
            GROUP BY lang, dim
        """,
        "lineitem_quantiles_refine": " UNION ALL ".join(
            f"""SELECT l_linestatus, CAST({q} AS DOUBLE) AS q,
                       quantile_disc(CAST(round(l_extendedprice*100) AS BIGINT),
                                     {q}) AS value_scaled
                FROM lineitem GROUP BY l_linestatus"""
            for q in QUANTILE_QS),
        "lineitem_quantiles_by_flag": " UNION ALL ".join(
            f"""SELECT l_returnflag, CAST({q} AS DOUBLE) AS q,
                       quantile_disc(CAST(round(l_extendedprice*100) AS BIGINT),
                                     {q}) AS value_scaled
                FROM lineitem GROUP BY l_returnflag"""
            for q in QUANTILE_QS),
        "orders_sample_md5": f"""
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders
            WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1,
                         {len(SAMPLE_THRESHOLD_HEX)}) < '{SAMPLE_THRESHOLD_HEX}'
        """,
        "lineitem_price_brackets": f"""
            WITH iv(bracket, lo, hi) AS (VALUES {", ".join(
                f"('b{i:02d}', CAST({lo} AS DOUBLE), CAST({hi} AS DOUBLE))"
                for i, (lo, hi) in enumerate(PRICE_BRACKETS))})
            SELECT bracket, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
            FROM lineitem JOIN iv
              ON l_extendedprice >= lo AND l_extendedprice < hi
            GROUP BY bracket
        """,
        "events_user_hll_by_type": """
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
                   TRUE AS within_bound
            FROM events GROUP BY event_type
        """,
        "events_lag_delta": """
            SELECT event_id, user_id,
                   epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS delta_us
            FROM events
        """,
        "events_running_sum": """
            SELECT event_id, user_id,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_cents
            FROM events
        """,
        "events_global_rank": """
            SELECT event_id,
                   ROW_NUMBER() OVER (ORDER BY epoch_us(ts), event_id) AS rn
            FROM events
        """,
        "join_anti_customers": f"""
            SELECT c_custkey, c_acctbal, c_mktsegment
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > {ANTI_JOIN_PRICE})
        """,
        "join_semi_parts": """
            SELECT p_partkey, p_brand
            FROM part p
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_partkey = p.p_partkey)
        """,
        "docs_bm25": _bm25_oracle_sql(),
        "docs_bm25_persisted": _bm25_oracle_sql(),
        "docs_bm25_multi": " UNION ALL ".join(
            f"SELECT * FROM ({_bm25_oracle_sql(ts, qid=qid)})"
            for qid, ts in sorted(BM25_MULTI.items())),
        "events_unpivot_roundtrip": """
            SELECT user_id, event_type, COUNT(*) AS n
            FROM events GROUP BY user_id, event_type
        """,
        "embedding_kmeans": """
            SELECT CAST(8 AS BIGINT) AS k, COUNT(*) AS n,
                   TRUE AS improved
            FROM embeddings
        """,
        "events_pivot_types": """
            SELECT user_id,
                   COUNT(*) FILTER (event_type = 'click') AS n_click,
                   COUNT(*) FILTER (event_type = 'error') AS n_error,
                   COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
                   COUNT(*) FILTER (event_type = 'signup') AS n_signup,
                   COUNT(*) FILTER (event_type = 'view') AS n_view
            FROM events GROUP BY user_id
        """,
        "docs_pack_sequences": f"""
            SELECT doc_id, n_tokens, bucket,
                   CAST(start // {PACK_SEQ_LEN} AS BIGINT) AS seq_id,
                   CAST(start % {PACK_SEQ_LEN} AS BIGINT) AS "offset"
            FROM (SELECT doc_id, n_tokens, bucket,
                         COALESCE(SUM(n_tokens) OVER (
                             PARTITION BY bucket ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS start
                  FROM (SELECT doc_id,
                               CAST(len(string_split(text, ' ')) AS BIGINT)
                                   AS n_tokens,
                               doc_id % {PACK_BUCKETS} AS bucket
                        FROM documents))
        """,
        "docs_stratified_sample": f"""
            SELECT doc_id, lang FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < CASE lang
                  WHEN 'en' THEN '{STRATA_HEX['en']}'
                  WHEN 'fr' THEN '{STRATA_HEX['fr']}'
                  WHEN 'es' THEN '{STRATA_HEX['es']}'
                  WHEN 'de' THEN '{STRATA_HEX['de']}'
                  ELSE '00000000' END
        """,
        "events_moving_avg": """
            SELECT event_id, user_id,
                   ROUND(AVG(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
                   ), 6) AS avg_cents
            FROM events
        """,
        "join_full_outer": """
            SELECT COALESCE(c.c_custkey, o.o_custkey) AS c_custkey,
                   c.c_acctbal, o.n_big
            FROM (SELECT c_custkey, c_acctbal FROM customer
                  WHERE c_acctbal > 5000) c
            FULL OUTER JOIN
                 (SELECT o_custkey, COUNT(*) AS n_big FROM orders
                  WHERE o_totalprice > 300000 GROUP BY o_custkey) o
            ON c.c_custkey = o.o_custkey
        """,
        "dedup_components": f"""
            WITH RECURSIVE pairs AS ({SHINGLE_PAIR_SQL.format(thr=JACCARD_THRESHOLD)}),
            edges AS (SELECT id_a AS s, id_b AS d FROM pairs
                      UNION ALL SELECT id_b, id_a FROM pairs),
            reach(node, comp) AS (
                SELECT DISTINCT s, s FROM edges
                UNION
                SELECT e.d, r.comp FROM reach r JOIN edges e ON e.s = r.node
            )
            SELECT node AS doc_id, MIN(comp) AS component
            FROM reach GROUP BY node
        """,
        "events_rollup": """
            SELECT COALESCE(event_type, 'ALL') AS event_type,
                   COALESCE(day, -1) AS day,
                   COUNT(*) AS n,
                   CAST(SUM(cents) AS BIGINT) AS cents
            FROM (SELECT event_type,
                         epoch_us(ts) // 86400000000 AS day,
                         CAST(ROUND(value * 100) AS BIGINT) AS cents
                  FROM events)
            GROUP BY ROLLUP(event_type, day)
        """,
        "events_cube": """
            SELECT COALESCE(event_type, 'ALL') AS event_type,
                   COALESCE(day, -1) AS day,
                   COUNT(*) AS n,
                   CAST(SUM(cents) AS BIGINT) AS cents
            FROM (SELECT event_type,
                         epoch_us(ts) // 86400000000 AS day,
                         CAST(ROUND(value * 100) AS BIGINT) AS cents
                  FROM events)
            GROUP BY CUBE(event_type, day)
        """,
        # corr from exact integer moments: identical integers on both
        # sides, identical closed-form float arithmetic
        "lineitem_corr": """
            WITH m AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy,
                     CAST(SUM(x * y) AS BIGINT) AS sxy,
                     CAST(SUM(x * x) AS BIGINT) AS sx2,
                     CAST(SUM(y * y) AS BIGINT) AS sy2
              FROM (SELECT CAST(ROUND(l_quantity) AS BIGINT) AS x,
                           CAST(ROUND(l_discount * 100) AS BIGINT) AS y
                    FROM lineitem))
            SELECT n, sx, sy, sxy, sx2, sy2,
                   ROUND((n * sxy - sx * sy)
                         / (SQRT(CAST(n * sx2 - sx * sx AS DOUBLE))
                            * SQRT(CAST(n * sy2 - sy * sy AS DOUBLE))),
                         9) AS corr
            FROM m
        """,
        # integer threshold comparison (q*cnt >= p*total) on both sides
        "events_heavy_hitters": """
            SELECT CAST(FLOOR(value) AS BIGINT) AS value,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1
            HAVING 100 * COUNT(*) >= (SELECT COUNT(*) FROM events)
        """,
        "events_user_dense_rank": """
            SELECT user_id, cnt,
                   CAST(DENSE_RANK() OVER (ORDER BY cnt DESC) AS BIGINT)
                       AS dr
            FROM (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM events GROUP BY user_id)
        """,
        "events_intersect_users": """
            SELECT CAST(FLOOR(value) AS BIGINT) AS v FROM events
            WHERE event_type = 'click'
            INTERSECT
            SELECT CAST(FLOOR(value) AS BIGINT) AS v FROM events
            WHERE event_type = 'purchase'
        """,
        "events_except_users": """
            SELECT CAST(FLOOR(value) AS BIGINT) AS v FROM events
            WHERE event_type = 'click'
            EXCEPT
            SELECT CAST(FLOOR(value) AS BIGINT) AS v FROM events
            WHERE event_type = 'purchase'
        """,
        "orders_argmax_order": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM orders
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey ASC) = 1
        """,
        # identical integers, identical operand-for-operand float
        # arithmetic (every int is CAST AS DOUBLE before any float op)
        "lineitem_linreg": """
            WITH m AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy,
                     CAST(SUM(x * y) AS BIGINT) AS sxy,
                     CAST(SUM(x * x) AS BIGINT) AS sx2,
                     CAST(SUM(y * y) AS BIGINT) AS sy2
              FROM (SELECT CAST(ROUND(l_quantity) AS BIGINT) AS x,
                           CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
                    FROM lineitem)),
            h AS (
              -- HUGEINT keeps the cross-products exact (BIGINT wraps)
              SELECT n, sx, sy, sxy, sx2, sy2,
                     CAST(n AS HUGEINT) * sxy
                       - CAST(sx AS HUGEINT) * sy AS num,
                     CAST(n AS HUGEINT) * sx2
                       - CAST(sx AS HUGEINT) * sx AS denx,
                     CAST(n AS HUGEINT) * sy2
                       - CAST(sy AS HUGEINT) * sy AS deny
              FROM m),
            s AS (
              SELECT *, ROUND(CAST(num AS DOUBLE)
                              / CAST(denx AS DOUBLE), 9) AS slope
              FROM h)
            SELECT n, sx, sy, sxy, sx2, sy2, slope,
                   ROUND((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                         / CAST(n AS DOUBLE), 9) AS intercept,
                   ROUND(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
                         / (CAST(denx AS DOUBLE)
                            * CAST(deny AS DOUBLE)), 9) AS r2
            FROM s
        """,
        "events_ntile": """
            SELECT event_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY ts, event_id)
                        AS BIGINT) AS rn,
                   CAST(NTILE(8) OVER (ORDER BY ts, event_id)
                        AS BIGINT) AS tile
            FROM events
        """,
        "events_percent_rank": """
            SELECT event_id, user_id, value,
                   PERCENT_RANK() OVER (PARTITION BY user_id
                                        ORDER BY value) AS pr,
                   CUME_DIST() OVER (PARTITION BY user_id
                                     ORDER BY value) AS cd
            FROM events
        """,
        "lineitem_histogram": """
            SELECT CAST(FLOOR(l_extendedprice / 5000.0) AS BIGINT) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM lineitem GROUP BY 1
        """,
        "events_mode_per_type": """
            SELECT event_type, v, CAST(cnt AS BIGINT) AS cnt
            FROM (SELECT event_type, CAST(FLOOR(value) AS BIGINT) AS v,
                         COUNT(*) AS cnt
                  FROM events GROUP BY 1, 2)
            QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY cnt DESC, v ASC) = 1
        """,
        "docs_repetition_stats": """
            WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                       FROM documents),
            c AS (SELECT doc_id, tok, COUNT(*) AS cnt
                  FROM w GROUP BY doc_id, tok),
            t AS (SELECT doc_id, tok AS top_word, cnt AS top_cnt FROM c
                  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                                             ORDER BY cnt DESC, tok ASC) = 1),
            a AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_words,
                         CAST(COUNT(*) AS BIGINT) AS n_distinct
                  FROM c GROUP BY doc_id)
            SELECT a.doc_id, a.n_words, a.n_distinct, t.top_word,
                   CAST(t.top_cnt AS BIGINT) AS top_cnt,
                   1.0 - CAST(a.n_distinct AS DOUBLE)
                         / CAST(a.n_words AS DOUBLE) AS dup_frac,
                   CAST(t.top_cnt AS DOUBLE)
                       / CAST(a.n_words AS DOUBLE) AS top_frac
            FROM a JOIN t USING (doc_id)
        """,
        # approximate sketch: the rank-error bound is machine-checked
        # inside the query (engine's own exact ranks); SQL cross-checks
        # the exact non-null count and the per-quantile booleans
        "events_quantiles_approx": """
            SELECT CAST(q AS DOUBLE) AS q,
                   (SELECT CAST(COUNT(value) AS BIGINT) FROM events) AS n,
                   TRUE AS within_bound
            FROM (VALUES (0.25), (0.50), (0.75), (0.90)) AS t(q)
        """,
        "events_rank_ties": """
            SELECT event_id,
                   RANK() OVER (ORDER BY CAST(FLOOR(value) AS BIGINT)) AS rnk
            FROM events
        """,
        "orders_monthly_revenue": """
            SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate)
                        AS BIGINT) AS ym,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS revenue_cents,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM orders GROUP BY ym
        """,
        "events_distinct_users_exact": """
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nd
            FROM events GROUP BY event_type
        """,
        "events_user_paths": """
            SELECT user_id,
                   STRING_AGG(event_type, '>'
                              ORDER BY epoch_us(ts), event_id) AS path
            FROM events GROUP BY user_id
        """,
        # the float formula mirrors group_zscore_outliers operand for
        # operand: mean = s1/n, var = s2/n - mean*mean, z = (v-mean)/sqrt(var)
        "lineitem_zscore": """
            WITH v AS (SELECT l_orderkey, l_linenumber, l_returnflag,
                              CAST(FLOOR(l_extendedprice) AS BIGINT) AS v
                       FROM lineitem),
            s AS (SELECT l_returnflag,
                         CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(v) AS BIGINT) AS s1,
                         CAST(SUM(v * v) AS BIGINT) AS s2
                  FROM v GROUP BY l_returnflag),
            z AS (SELECT l_orderkey, l_linenumber, v.l_returnflag,
                         (CAST(v AS DOUBLE)
                          - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                         / SQRT(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                                - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                                  * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                         AS zr
                  FROM v JOIN s USING (l_returnflag))
            SELECT l_orderkey, l_linenumber, l_returnflag,
                   ROUND(zr, 9) AS z
            FROM z WHERE ABS(zr) > 1.5
        """,
        "events_funnel": """
            WITH s1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t FROM events
                        WHERE event_type = 'signup' GROUP BY user_id),
            s2 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t
                   FROM events e JOIN s1 ON e.user_id = s1.user_id
                   WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t
                   GROUP BY e.user_id),
            s3 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t
                   FROM events e JOIN s2 ON e.user_id = s2.user_id
                   WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t
                   GROUP BY e.user_id)
            SELECT CAST(1 AS BIGINT) AS step,
                   CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS users
            UNION ALL SELECT 2, (SELECT COUNT(*) FROM s2)
            UNION ALL SELECT 3, (SELECT COUNT(*) FROM s3)
        """,
        # rank by RAW score (ties by term), round only in the output —
        # mirrors tfidf_top_terms exactly
        "docs_tfidf_top": """
            WITH toks AS (SELECT doc_id,
                                 unnest(string_split(text, ' ')) AS term
                          FROM documents),
            tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
                   FROM toks GROUP BY doc_id, term),
            dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                    FROM tf GROUP BY term),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
            scored AS (SELECT tf.doc_id, tf.term,
                              CAST(tf AS DOUBLE)
                              * LN(CAST(nn.n AS DOUBLE)
                                   / CAST(df AS DOUBLE)) AS s
                       FROM tf JOIN dfq USING (term) CROSS JOIN nn)
            SELECT doc_id, term, ROUND(s, 6) AS score FROM scored
            QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY s DESC, term) <= 3
        """,
        # length prefilter in the join condition is exact
        # (levenshtein >= |len difference|), so the CTE only shrinks
        # the pair set the verifier scans — the answer is the full
        # <= 10 pair set
        "dedup_edit_distance": """
            WITH cand AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     a.text AS ta, b.text AS tb
              FROM documents a JOIN documents b
                ON a.doc_id < b.doc_id
               AND b.n_chars BETWEEN a.n_chars - 10 AND a.n_chars + 10)
            SELECT id_a, id_b,
                   CAST(levenshtein(ta, tb) AS BIGINT) AS dist
            FROM cand WHERE levenshtein(ta, tb) <= 10
        """,
        # SUM over doubles: both sides sum ~dozens of per-term values
        # and round to 6 — addition-order noise is ~1e-12 relative,
        # far inside the rounding (same precedent as docs_bm25)
        "docs_unigram_logprob": """
            WITH toks AS (SELECT doc_id,
                                 unnest(string_split(text, ' ')) AS term
                          FROM documents),
            tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
                   FROM toks GROUP BY doc_id, term),
            cnts AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt
                     FROM tf GROUP BY term),
            tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM cnts),
            j AS (SELECT tf.doc_id, CAST(tf.tf AS DOUBLE) AS tfv,
                         LN(CAST(cnt AS DOUBLE) / CAST(t AS DOUBLE)) AS lp
                  FROM tf JOIN cnts USING (term) CROSS JOIN tot)
            SELECT doc_id,
                   ROUND(SUM(tfv * lp) / SUM(tfv), 6) AS logprob
            FROM j GROUP BY doc_id
        """,
        "join_parts_bloom_semi": """
            SELECT p_partkey, p_brand
            FROM part p
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_partkey = p.p_partkey
                            AND l.l_quantity >= 45)
        """,
        "events_grouping_sets": """
            SELECT COALESCE(event_type, 'ALL') AS event_type,
                   COALESCE(day, -1) AS day,
                   COUNT(*) AS n,
                   CAST(SUM(cents) AS BIGINT) AS cents
            FROM (SELECT event_type,
                         epoch_us(ts) // 86400000000 AS day,
                         CAST(ROUND(value * 100) AS BIGINT) AS cents
                  FROM events)
            GROUP BY GROUPING SETS ((event_type), (day))
        """,
        "lineitem_corr_by_flag": """
            WITH m AS (
              SELECT l_returnflag,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy,
                     CAST(SUM(x * y) AS BIGINT) AS sxy,
                     CAST(SUM(x * x) AS BIGINT) AS sx2,
                     CAST(SUM(y * y) AS BIGINT) AS sy2
              FROM (SELECT l_returnflag,
                           CAST(ROUND(l_quantity) AS BIGINT) AS x,
                           CAST(ROUND(l_discount * 100) AS BIGINT) AS y
                    FROM lineitem)
              GROUP BY l_returnflag)
            SELECT l_returnflag, n,
                   ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (SQRT(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * SQRT(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
                                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                         9) AS corr
            FROM m
        """,
    }
