"""Streaming curation (pipelines/curate.py): the CDC micro-batch loop
driving the persisted fingerprint index — admission semantics, the
write-before-append crash-recovery contract, and summary accounting."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from kafka_connect_mongo_ray.pipelines.curate import (
    curate_version,
    run_curated_stream,
    upserts_to_candidates,
)
from kafka_connect_mongo_ray.schema import CHANGE_EVENT_SCHEMA


def _events(rows):
    """rows = [(ts, op, path, content)] → CHANGE_EVENT table."""
    n = len(rows)
    ids = np.array([int(r[2]) for r in rows], dtype=np.int64)
    return pa.table(
        {
            "ts": pa.array([r[0] for r in rows], pa.int64()),
            "inc": pa.array(np.zeros(n, dtype=np.int32)),
            "op": pa.array([r[1] for r in rows], pa.string()),
            "repo": pa.array(["r"] * n, pa.string()),
            "path": pa.array([r[2] for r in rows], pa.string()),
            "commit": pa.array([""] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "content": pa.array([r[3] for r in rows], pa.large_string()),
            "partition_id": pa.array((ids % 4).astype(np.int32)),
        },
        schema=CHANGE_EVENT_SCHEMA,
    )


def _factory(rows):
    def make():
        import ray.data as rd

        return rd.from_arrow(_events(rows))

    return make


@pytest.fixture()
def dirs(tmp_path):
    from kafka_connect_mongo_ray.config import EngineConfig

    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"), num_buckets=4)
    return cfg, str(tmp_path / "idx"), str(tmp_path / "cur")


def _read_curated(curated_dir):
    import os

    import pyarrow.parquet as pq

    out = {}
    for w in sorted(os.listdir(curated_dir)):
        v = int(w.split("=")[1])
        files = [f for f in os.listdir(f"{curated_dir}/{w}")
                 if f.endswith(".parquet")]
        if files:
            t = pa.concat_tables([pq.read_table(f"{curated_dir}/{w}/{f}")
                                  for f in files])
            out[v] = set(zip(t["doc_id"].to_pylist(), t["fp"].to_pylist()))
        else:
            out[v] = set()
    return out


def test_curated_stream_admission_semantics(dirs):
    cfg, idx, cur = dirs
    # w1: docs 1,2 (2 and 3 share content "dup" across windows);
    # w2: doc 3 duplicates doc 2's content, doc 4 is new, doc 2 updated;
    # w3: tombstone doc 1, re-insert of already-seen content from w2
    summaries = run_curated_stream(
        [
            _factory([(0, "i", "1", "alpha"), (0, "i", "2", "dup")]),
            _factory([(1, "i", "3", "dup"), (1, "i", "4", "beta"),
                      (1, "u", "2", "dup2")]),
            _factory([(2, "d", "1", None), (2, "i", "5", "dup2")]),
        ],
        cfg, index_dir=idx, curated_dir=cur)
    assert [s["version"] for s in summaries] == [1, 2, 3]
    got = _read_curated(cur)
    ids = {v: {d for d, _ in s} for v, s in got.items()}
    # w1 admits both; w2 drops doc 3 (content seen in w1), admits 4 and
    # the UPDATED doc 2 (new content); w3's re-insert of "dup2" drops,
    # the tombstone is not curated
    assert ids == {1: {1, 2}, 2: {4, 2}, 3: set()}
    assert summaries[2]["curation"]["tombstones"] == 1
    assert summaries[1]["curation"]["admitted"] == 2
    # changes feed counts: w3 = 1 tombstone + 1 dropped insert
    assert summaries[2]["curation"]["changes"] == 2


def test_curate_version_rerun_is_idempotent(dirs):
    """The crash-recovery contract: re-curating an already-curated
    version (index already holds its fps) must leave the window
    directory IDENTICAL, because the screen is replayed against the
    index state that now includes the window's own fps — admission of
    a row already appended is harmless only because the curated dir is
    rewritten from the SAME survivor set... assert the stronger fact:
    the recomputed output equals the original."""
    cfg, idx, cur = dirs
    from kafka_connect_mongo_ray.pipelines.cdc import run_replay

    run_replay(_factory([(0, "i", "1", "alpha"), (0, "i", "2", "beta")])(),
               cfg)
    s1 = curate_version(cfg, 1, index_dir=idx, curated_dir=cur,
                        index_buckets=4)
    first = _read_curated(cur)
    # crash-after-append re-run: same version, index already populated.
    # The marker routes this to the re-append path — the directory must
    # NOT be truncated by a re-screen against its own fingerprints.
    s2 = curate_version(cfg, 1, index_dir=idx, curated_dir=cur,
                        index_buckets=4)
    assert _read_curated(cur) == first
    assert s1["admitted"] == 2
    assert s2["admitted"] == 2 and s2["recovered"] is True


def test_crash_between_write_and_append_recovers(dirs):
    """Simulate the crash window: screen + curated write WITHOUT the
    index append (the ordering the module guarantees), then run the
    full curate_version — the survivor set must be identical and the
    next window must still dedup against it."""
    import os
    import shutil

    cfg, idx, cur = dirs
    from kafka_connect_mongo_ray.pipelines.cdc import run_replay
    from kafka_connect_mongo_ray.state.diff import changes_between
    from kafka_connect_mongo_ray.state.dedup_index import screen_window

    run_replay(_factory([(0, "i", "1", "alpha"), (0, "i", "2", "beta")])(),
               cfg)
    diff = changes_between(cfg.snapshot_dir, 0, 1)
    cand = diff.map_batches(upserts_to_candidates, batch_format="pyarrow")
    survivors = screen_window(cand, idx, id_col="doc_id", text_col="text",
                              num_buckets=4)
    os.makedirs(f"{cur}/window=1", exist_ok=True)
    (survivors.map_batches(
        lambda t: t.select(["doc_id", "repo", "path", "fp"]),
        batch_format="pyarrow").write_parquet(f"{cur}/window=1"))
    partial = _read_curated(cur)
    assert not os.path.isdir(idx) or not os.listdir(idx)  # append skipped
    # recovery: the documented re-run of curation for the same version
    curate_version(cfg, 1, index_dir=idx, curated_dir=cur, index_buckets=4)
    assert _read_curated(cur) == partial
    # and the index now screens the next window correctly
    run_replay(_factory([(1, "i", "3", "alpha"), (1, "i", "4", "new")])(),
               cfg)
    curate_version(cfg, 2, index_dir=idx, curated_dir=cur, index_buckets=4)
    ids2 = {d for d, _ in _read_curated(cur)[2]}
    assert ids2 == {4}  # doc 3 duplicates window-1 content


def test_null_content_upsert_fingerprints_as_empty(dirs):
    """op='i' with null content is NOT a tombstone (those are op='d');
    it must flow through curation fingerprinted as md5('') — the same
    coalesce the SQL mirror applies."""
    cfg, idx, cur = dirs
    import hashlib

    summaries = run_curated_stream(
        [_factory([(0, "i", "7", None), (0, "i", "8", "x")])],
        cfg, index_dir=idx, curated_dir=cur)
    got = _read_curated(cur)[1]
    empty_md5 = hashlib.md5(b"").hexdigest()
    assert (7, empty_md5) in got and len(got) == 2
    assert summaries[0]["curation"]["tombstones"] == 0


def _ts_windows(dirs):
    """Three windows with spread ts: w1 at ts 3/7, w2 at 12/18 (18 is a
    cross-window dup and is dropped), w3 at 25."""
    cfg, idx, cur = dirs
    run_curated_stream(
        [
            _factory([(3, "i", "1", "a"), (7, "i", "2", "b")]),
            _factory([(12, "i", "3", "c"), (18, "i", "4", "b")]),
            _factory([(25, "i", "5", "e")]),
        ],
        cfg, index_dir=idx, curated_dir=cur)
    return cur


def test_curated_marker_carries_ts_zone_map(dirs):
    """The `_CURATED` marker records the window's exact admitted-row ts
    bounds — the free-at-write-time zone map (window = time partition)."""
    import json

    cur = _ts_windows(dirs)
    stats = {v: json.load(open(f"{cur}/window={v}/_CURATED"))
             for v in (1, 2, 3)}
    assert stats[1] == {"rows": 2, "ts_min": 3, "ts_max": 7}
    # window 2's dup (ts=18) was dropped, so the bound is 12..12
    assert stats[2] == {"rows": 1, "ts_min": 12, "ts_max": 12}
    assert stats[3] == {"rows": 1, "ts_min": 25, "ts_max": 25}


def test_read_curated_prunes_without_opening_files(dirs):
    """A window outside the ts scope is pruned on marker arithmetic
    alone — poisoning its parquet files proves they are never opened —
    and the in-scope read applies the exact row-level filter."""
    import os

    from kafka_connect_mongo_ray.pipelines.curate import read_curated

    cur = _ts_windows(dirs)
    for f in os.listdir(f"{cur}/window=3"):
        if f.endswith(".parquet"):
            with open(f"{cur}/window=3/{f}", "wb") as fh:
                fh.write(b"not parquet")
    rows = read_curated(cur, ts_min=5, ts_max=15,
                        include_window=True).take_all()
    assert {(r["win"], r["doc_id"], r["ts"]) for r in rows} == {
        (1, 2, 7), (2, 3, 12)}


def test_read_curated_all_pruned_keeps_schema(dirs):
    from kafka_connect_mongo_ray.pipelines.curate import read_curated

    cur = _ts_windows(dirs)
    ds = read_curated(cur, ts_min=100, ts_max=200)
    assert ds.count() == 0
    assert ds.schema().names == ["doc_id", "repo", "path", "ts", "fp"]


def test_read_curated_legacy_marker_scans(dirs):
    """An empty (legacy) marker has no zone map: the window must be
    SCANNED, not pruned — the missing-stats ⇒ scan contract — and the
    row-level ts filter still applies."""
    from kafka_connect_mongo_ray.pipelines.curate import read_curated

    cur = _ts_windows(dirs)
    with open(f"{cur}/window=1/_CURATED", "w"):
        pass  # truncate to the legacy empty marker
    rows = read_curated(cur, ts_min=5, ts_max=15).take_all()
    assert {r["doc_id"] for r in rows} == {2, 3}
    # and scoping PAST window 1's true range keeps correctness (the
    # legacy window is scanned and row-filtered to nothing)
    rows = read_curated(cur, ts_min=20, ts_max=30).take_all()
    assert {r["doc_id"] for r in rows} == {5}


def test_read_curated_skips_uncommitted_window(dirs):
    """A window directory without a marker never committed (crash
    before the marker write) — it is not authoritative and must be
    invisible to readers."""
    import os

    import pyarrow.parquet as pq

    from kafka_connect_mongo_ray.pipelines.curate import read_curated

    cur = _ts_windows(dirs)
    os.makedirs(f"{cur}/window=9", exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": pa.array([99], pa.int64()),
                  "repo": pa.array(["r"]), "path": pa.array(["99"]),
                  "ts": pa.array([7], pa.int64()),
                  "fp": pa.array(["deadbeef"])}),
        f"{cur}/window=9/part.parquet")
    rows = read_curated(cur, ts_min=0, ts_max=30).take_all()
    assert 99 not in {r["doc_id"] for r in rows}


def test_minhash_curation_drops_cross_window_near_dups(dirs):
    """screen='minhash': an exact re-insert ALWAYS drops (identical
    text ⇒ identical bands), a high-overlap paraphrase drops with the
    LSH guarantee at full-band overlap, and a fresh doc admits. The
    marker still carries the ts zone map."""
    import json

    cfg, idx, cur = dirs
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base + " lambda"  # 10/11 shingle overlap
    summaries = run_curated_stream(
        [
            _factory([(1, "i", "1", base)]),
            _factory([(5, "i", "2", base),        # exact: must drop
                      (6, "i", "3", near),        # near-dup
                      (7, "i", "4", "wholly different words entirely "
                                    "unlike anything before")]),
        ],
        cfg, index_dir=idx, curated_dir=cur, screen="minhash")
    got = _read_curated(cur)
    assert {d for d, _ in got[1]} == {1}
    w2_ids = {d for d, _ in got[2]}
    assert 2 not in w2_ids          # exact copy: guaranteed drop
    assert 4 in w2_ids              # fresh content admits
    assert summaries[1]["curation"]["admitted"] == len(w2_ids)
    stats = json.load(open(f"{cur}/window=1/_CURATED"))
    assert (stats["ts_min"], stats["ts_max"]) == (1, 1)
    # band sidecar persisted for recovery
    import os

    assert any(f.endswith(".parquet")
               for f in os.listdir(f"{cur}/window=1/_bands"))


def test_minhash_curation_recovery_reappends_bands(dirs):
    """Crash between marker and band append: the re-run must re-append
    the sidecar's band rows so the NEXT window still screens — without
    re-screening the window against its own bands."""
    import shutil

    cfg, idx, cur = dirs
    from kafka_connect_mongo_ray.pipelines.cdc import run_replay

    run_replay(_factory([(1, "i", "1", "some reasonably long text with "
                                       "many distinct words here")])(), cfg)
    s1 = curate_version(cfg, 1, index_dir=idx, curated_dir=cur,
                        index_buckets=4, screen="minhash")
    assert s1["admitted"] == 1
    # simulate the crash: the window committed (marker + sidecar) but
    # the index append was lost entirely
    shutil.rmtree(idx, ignore_errors=True)
    s2 = curate_version(cfg, 1, index_dir=idx, curated_dir=cur,
                        index_buckets=4, screen="minhash")
    assert s2["recovered"] is True and s2["admitted"] == 1
    # the restored index must drop an exact re-insert in window 2
    run_replay(_factory([(2, "i", "2", "some reasonably long text with "
                                       "many distinct words here")])(), cfg)
    s3 = curate_version(cfg, 2, index_dir=idx, curated_dir=cur,
                        index_buckets=4, screen="minhash")
    assert s3["admitted"] == 0


def test_ann_mode_builds_appends_and_recovers(dirs, tmp_path):
    """ann_dir mode: window 1 BUILDS the IVF index, window 2 APPENDS a
    tagged generation; a crash that loses the whole index after the
    markers is rebuilt from the _vecs sidecars by replaying the
    curations; a replay over an intact index is a manifest no-op."""
    import json
    import os
    import shutil

    cfg, idx, cur = dirs
    ann = str(tmp_path / "ann")
    w1 = [(0, "i", "1", "alpha"), (0, "i", "2", "beta")]
    w2 = [(1, "i", "3", "gamma")]
    run_curated_stream([_factory(w1), _factory(w2)], cfg, index_dir=idx,
                       curated_dir=cur, index_buckets=4, ann_dir=ann,
                       ann_cells=2)
    man = json.load(open(os.path.join(ann, "manifest.json")))
    assert man["rows"] == 3 and man["generations"] == 1
    assert man["tags"] == ["window=1", "window=2"]
    # the _vecs sidecar sits under each window, invisible to readers
    assert os.path.isdir(os.path.join(cur, "window=1", "_vecs"))

    # replay both windows (recovery path): manifest must not change
    for v in (1, 2):
        curate_version(cfg, v, index_dir=idx, curated_dir=cur,
                       index_buckets=4, ann_dir=ann, ann_cells=2)
    assert json.load(open(os.path.join(ann, "manifest.json"))) == man

    # total-loss crash of the index: replaying the curations rebuilds
    # it from the sidecars (build on first replayed window, append on
    # the second)
    shutil.rmtree(ann)
    for v in (1, 2):
        curate_version(cfg, v, index_dir=idx, curated_dir=cur,
                       index_buckets=4, ann_dir=ann, ann_cells=2)
    man2 = json.load(open(os.path.join(ann, "manifest.json")))
    assert man2["rows"] == 3 and man2["tags"] == ["window=1", "window=2"]

    # the rebuilt index answers: nprobe=cells self-query returns each
    # doc as its own best hit (stub embeddings are text-deterministic)
    from kafka_connect_mongo_ray.functions.text import hash_embedding_batch
    from kafka_connect_mongo_ray.state.ann_index import ivf_index_topk
    from kafka_connect_mongo_ray.utils import embedding_matrix

    vt = hash_embedding_batch(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["alpha", "beta", "gamma"], pa.string())}))
    q = embedding_matrix(vt["embedding"])
    out = ivf_index_topk(ann, q, np.array([1, 2, 3]), k=1, nprobe=2)
    assert dict(zip(out["query_id"], out["neighbor_id"])) == {1: 1, 2: 2,
                                                              3: 3}


def test_dq_expectations_ride_summary_and_marker(dirs):
    import json
    import os

    from kafka_connect_mongo_ray.functions import expectations as ex

    cfg, idx, cur = dirs
    exps = [ex.not_null("text_not_null", "admitted", "text"),
            ex.unique("doc_id_unique", "admitted", "doc_id"),
            ex.in_range("ts_window", "admitted", "ts", lo=0, hi=5)]
    # w1: all clean; w2: one null-content upsert (curated text is
    # null) plus a ts beyond the in_range bound → real violations
    summaries = run_curated_stream(
        [_factory([(1, "i", "1", "aa"), (2, "i", "2", "bb")]),
         _factory([(11, "i", "3", None), (12, "i", "4", "cc")])],
        cfg, index_dir=idx, curated_dir=cur, index_buckets=4,
        dq_expectations=exps)
    dq1 = {c["name"]: c for c in summaries[0]["curation"]["dq"]}
    assert dq1["text_not_null"]["n_violations"] == 0
    assert dq1["doc_id_unique"] == {"name": "doc_id_unique",
                                    "n_checked": 2, "n_violations": 0}
    assert dq1["ts_window"]["n_violations"] == 0
    dq2 = {c["name"]: c for c in summaries[1]["curation"]["dq"]}
    assert dq2["text_not_null"]["n_violations"] == 1
    assert dq2["ts_window"]["n_violations"] == 2  # ts 11 and 12 > 5

    # the marker persists the audit, and recovery reports it without
    # re-scanning
    with open(os.path.join(cur, "window=2", "_CURATED")) as f:
        assert {c["name"]: c["n_violations"] for c in json.load(f)["dq"]} \
            == {"text_not_null": 1, "doc_id_unique": 0, "ts_window": 2}
    rec = curate_version(cfg, 2, index_dir=idx, curated_dir=cur,
                         index_buckets=4, dq_expectations=exps)
    assert rec["recovered"] is True
    assert {c["name"]: c["n_violations"] for c in rec["dq"]} == {
        "text_not_null": 1, "doc_id_unique": 0, "ts_window": 2}


def test_encoder_stub_matches_hash_embedding_batch():
    """The default Encoder stage is bit-identical to
    hash_embedding_batch — the injectable seam changes plumbing, not
    geometry."""
    from kafka_connect_mongo_ray.functions.text import (
        Encoder,
        hash_embedding_batch,
    )

    batch = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "text": pa.array(["alpha", None, "gamma"])})
    assert Encoder()(batch).equals(hash_embedding_batch(batch))


def test_custom_encoder_swap_drives_ann_ingest(dirs, tmp_path):
    """A non-stub Encoder subclass (char-ngram hashing — setup in
    _load, vectorized encode) drops into the ann_dir path: the window's
    _vecs sidecar carries ITS vectors and the IVF manifest commits the
    admissions, proving the actor-pool seam is real, not prose."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from kafka_connect_mongo_ray.functions.text import Encoder

    class CharNgramEncoder(Encoder):
        def _load(self):
            # "model": a fixed random projection, built once per actor
            return np.random.default_rng(0).standard_normal(
                (256 * 256, self.dim)).astype(np.float32)

        def encode(self, texts):
            out = np.zeros((len(texts), self.dim), np.float32)
            for i, t in enumerate(texts):
                b = (t or "\x00").encode("utf-8", "replace")
                grams = np.frombuffer(b, np.uint8)
                idx = (grams[:-1].astype(np.int32) * 256
                       + grams[1:]) if len(grams) > 1 else np.array(
                           [int(grams[0])], np.int32)
                v = self.model[idx].sum(axis=0)
                out[i] = v / max(float(np.linalg.norm(v)), 1e-12)
            return out

    cfg, idx, cur = dirs
    ann = str(tmp_path / "ivf")
    run_curated_stream(
        [_factory([(0, "i", "1", "aaa"), (0, "i", "2", "bbb")])],
        cfg, index_dir=idx, curated_dir=cur, index_buckets=4,
        ann_dir=ann, ann_cells=2, encoder=CharNgramEncoder,
        encoder_actors=1)
    vecs = pq.read_table(os.path.join(cur, "window=1", "_vecs"))
    got = {d: np.asarray(v, np.float32)
           for d, v in zip(vecs["doc_id"].to_pylist(),
                           vecs["embedding"].to_pylist())}
    ref = CharNgramEncoder()
    want = ref.encode(["aaa", "bbb"])
    np.testing.assert_allclose(got[1], want[0], atol=1e-6)
    np.testing.assert_allclose(got[2], want[1], atol=1e-6)
    import json

    m = json.load(open(os.path.join(ann, "manifest.json")))
    assert m["rows"] == 2 and m["tags"] == ["window=1"]


def test_randomized_curation_first_wins_oracle(dirs):
    """Randomized multi-window campaign against a pure-Python
    first-wins oracle: random inserts/updates/deletes over a small
    key domain with a small CONTENT pool (forcing heavy cross-window
    duplication), checked per window. Invariants: a content
    fingerprint is admitted at most once across the whole stream
    (first window to carry it wins, min doc_id within a window);
    tombstones never curate; per-window admitted counts match."""
    import hashlib

    import numpy as np

    cfg, idx, cur = dirs
    rng = np.random.default_rng(41)
    contents = [f"text{i}" for i in range(8)]  # small pool => many dups
    live: dict[int, str] = {}
    factories = []
    window_events = []
    for w in range(5):
        rows = []
        used = set()
        for _ in range(int(rng.integers(2, 7))):
            d = int(rng.integers(1, 10))
            if d in used:
                continue
            used.add(d)
            if rng.random() < 0.2 and d in live:
                rows.append((w, "d", str(d), None))
                live.pop(d)
            else:
                c = contents[int(rng.integers(0, len(contents)))]
                rows.append((w, "u" if d in live else "i", str(d), c))
                live[d] = c
        window_events.append(rows)
        factories.append(_factory(rows))

    summaries = run_curated_stream(factories, cfg, index_dir=idx,
                                   curated_dir=cur, index_buckets=4)

    # oracle: replay the same windows; a window's candidates are its
    # NET key changes (LWW within the window), deduped in-window by
    # fingerprint (min doc_id wins), screened against all previously
    # admitted fingerprints
    admitted_fps: set = set()
    state: dict[str, str] = {}
    want_per_window = []
    for rows in window_events:
        net: dict[str, str | None] = {}
        for _, op, path, content in rows:
            net[path] = None if op == "d" else content
        cands = {}
        for path, content in net.items():
            changed = (content is not None
                       and state.get(path) != content)
            if changed:
                fp = hashlib.md5(content.encode()).hexdigest()
                d = int(path)
                if fp not in cands or d < cands[fp]:
                    cands[fp] = d
            if content is None:
                state.pop(path, None)
            else:
                state[path] = content
        adm = {(d, fp) for fp, d in cands.items()
               if fp not in admitted_fps}
        admitted_fps |= {fp for _, fp in adm}
        want_per_window.append(adm)

    got = _read_curated(cur)
    for i, s in enumerate(summaries):
        v = s["version"]
        assert got.get(v, set()) == want_per_window[i], f"window {v}"
        assert s["curation"]["admitted"] == len(want_per_window[i])
    # global uniqueness: no fingerprint admitted twice
    all_fps = [fp for ws in got.values() for _, fp in ws]
    assert len(all_fps) == len(set(all_fps))
