"""state/secondary_index.py — persisted attribute→key index invariants:
signed-posting membership equals a live-set recompute after updates
(attribute moves), deletes (retraction), window re-application
(idempotence), and compaction (atomic generation swap + stale-window
refusal)."""

import os

import pyarrow as pa
import pytest
import ray

from kafka_connect_mongo_ray.config import EngineConfig
from kafka_connect_mongo_ray.pipelines.cdc import run_replay
from kafka_connect_mongo_ray.state.secondary_index import SecondaryIndex
from tests.test_oracle_and_gen import make_events


def _replay(cfg, rows):
    ds = ray.data.from_arrow(make_events(rows)).repartition(2)
    run_replay(ds, cfg)


def _store(tmp_path):
    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"), num_buckets=4)
    base = dict(commit="", partition_id=0, inc=0)
    _replay(cfg, [
        dict(ts=1, op="i", repo="r0", path="a", lang="py", content="x", **base),
        dict(ts=1, op="i", repo="r0", path="b", lang="go", content="y", **base),
        dict(ts=1, op="i", repo="r1", path="c", lang="py", content="z", **base),
    ])
    _replay(cfg, [
        # attribute change: the key must MOVE from py to rs
        dict(ts=2, op="u", repo="r0", path="a", lang="rs", content="x2", **base),
        # delete: the key must be retracted from go
        dict(ts=2, op="d", repo="r0", path="b", lang="go", content=None, **base),
        dict(ts=2, op="i", repo="r1", path="d", lang="go", content="w", **base),
    ])
    return cfg


def _keys(t: pa.Table):
    return list(zip(t["repo"].to_pylist(), t["path"].to_pylist()))


def test_lookup_tracks_updates_moves_and_deletes(tmp_path):
    cfg = _store(tmp_path)
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang", num_buckets=4)
    idx.apply_window(cfg.snapshot_dir, 0, 1)
    idx.apply_window(cfg.snapshot_dir, 1, 2)
    assert _keys(idx.lookup("py")) == [("r1", "c")]
    assert _keys(idx.lookup("rs")) == [("r0", "a")]
    assert _keys(idx.lookup("go")) == [("r1", "d")]
    assert _keys(idx.lookup("absent")) == []
    c = idx.counts().to_pandas().set_index("val")["n_keys"].to_dict()
    assert c == {"py": 1, "rs": 1, "go": 1}


def test_window_reapply_is_idempotent(tmp_path):
    cfg = _store(tmp_path)
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang", num_buckets=4)
    idx.apply_window(cfg.snapshot_dir, 0, 1)
    idx.apply_window(cfg.snapshot_dir, 1, 2)
    # a crashed at-least-once driver re-applies the same window: the
    # deterministic per-window file name overwrites, never doubles
    idx.apply_window(cfg.snapshot_dir, 1, 2)
    assert _keys(idx.lookup("go")) == [("r1", "d")]
    assert _keys(idx.lookup("py")) == [("r1", "c")]


def test_compaction_preserves_membership_and_refuses_stale_windows(tmp_path):
    cfg = _store(tmp_path)
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang", num_buckets=4)
    idx.apply_window(cfg.snapshot_dir, 0, 1)
    idx.apply_window(cfg.snapshot_dir, 1, 2)
    before = {v: _keys(idx.lookup(v)) for v in ("py", "rs", "go")}
    st = idx.compact()
    assert st["generation"] == 1 and st["applied_through"] == 2
    after = {v: _keys(idx.lookup(v)) for v in ("py", "rs", "go")}
    assert after == before
    # folded postings are net +1 only — dead keys are physically gone
    assert st["postings"] == 3
    # re-applying an already-folded window must be a refused no-op
    out = idx.apply_window(cfg.snapshot_dir, 1, 2)
    assert out.get("skipped")
    assert _keys(idx.lookup("go")) == [("r1", "d")]
    # old generation is removed; the manifest points at the new one
    assert not os.path.isdir(os.path.join(str(tmp_path / "idx"), "gen000"))


def test_conflicting_configuration_is_refused(tmp_path):
    _ = _store(tmp_path)
    SecondaryIndex(str(tmp_path / "idx"), column="lang", num_buckets=4)
    with pytest.raises(ValueError, match="refusing"):
        SecondaryIndex(str(tmp_path / "idx"), column="lang", num_buckets=8)
    with pytest.raises(ValueError, match="refusing"):
        SecondaryIndex(str(tmp_path / "idx"), column="repo", num_buckets=4)


def test_cli_apply_lookup_fetch_roundtrip(tmp_path, capsys):
    """index --apply folds the store's windows; --value --fetch
    composes the single-bucket lookup with the store's bucket-pruned
    point reads — every fetched row must carry the looked-up value."""
    import json

    from kafka_connect_mongo_ray.__main__ import index_cmd

    cfg = _store(tmp_path)

    class A:
        snapshot = cfg.snapshot_dir
        index = str(tmp_path / "idx")
        column = "lang"
        buckets = 4
        apply = True
        compact = False
        value = "go"
        fetch = True
        counts = True
        auto_compact = None

    assert index_cmd(A) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["lookup"]["rows"] == 1
    assert out["fetch"]["rows"] == 1
    assert out["fetch"]["sample"][0]["lang"] == "go"
    assert {c["val"]: c["n_keys"] for c in out["counts"]} == {
        "py": 1, "rs": 1, "go": 1}


def test_micro_batch_loop_keeps_index_fresh(tmp_path):
    """run_micro_batches(index=...) folds each committed window into
    the secondary index right after its commit — the streaming driver
    owns the maintenance, and the index tracks attribute moves and
    deletes across windows without a separate pass."""
    from kafka_connect_mongo_ray.pipelines.stream import run_micro_batches

    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"), num_buckets=4)
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang",
                         num_buckets=4)
    base = dict(commit="", partition_id=0, inc=0)
    w1 = [dict(ts=1, op="i", repo="r0", path="a", lang="py",
               content="x", **base),
          dict(ts=1, op="i", repo="r0", path="b", lang="go",
               content="y", **base)]
    w2 = [dict(ts=2, op="u", repo="r0", path="a", lang="rs",
               content="x2", **base),
          dict(ts=2, op="d", repo="r0", path="b", lang="go",
               content=None, **base)]
    summaries = run_micro_batches(
        [lambda: ray.data.from_arrow(make_events(w1)).repartition(2),
         lambda: ray.data.from_arrow(make_events(w2)).repartition(2)],
        cfg, index=idx)
    assert [s["version"] for s in summaries] == [1, 2]
    assert all("index" in s for s in summaries)
    assert _keys(idx.lookup("rs")) == [("r0", "a")]
    assert _keys(idx.lookup("py")) == []
    assert _keys(idx.lookup("go")) == []


def test_auto_compaction_triggers_on_file_budget(tmp_path):
    """auto_compact_after=N folds the index once any bucket exceeds N
    window files — lookup read amplification stays bounded without a
    separate maintenance pass, and membership is unchanged."""
    cfg = _store(tmp_path)
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang",
                         num_buckets=4, auto_compact_after=1)
    s1 = idx.apply_window(cfg.snapshot_dir, 0, 1)
    assert "compacted" not in s1  # one file per touched bucket so far
    s2 = idx.apply_window(cfg.snapshot_dir, 1, 2)
    assert s2["compacted"]["generation"] == 1
    assert s2["compacted"]["applied_through"] == 2
    assert _keys(idx.lookup("rs")) == [("r0", "a")]
    assert _keys(idx.lookup("go")) == [("r1", "d")]
    assert _keys(idx.lookup("py")) == [("r1", "c")]


def test_compaction_recovers_from_crash_between_replace_and_manifest(
        tmp_path):
    """A compaction that crashed AFTER its generation rename but BEFORE
    the manifest commit leaves an orphan genNNN dir the manifest never
    references; the NEXT compaction must clear it and succeed instead
    of raising ENOTEMPTY forever."""
    import os
    import shutil

    cfg = _store(tmp_path)
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang",
                         num_buckets=4)
    idx.apply_window(cfg.snapshot_dir, 0, 1)
    idx.apply_window(cfg.snapshot_dir, 1, 2)
    # simulate the crash window: a complete-but-unpublished gen001
    orphan = os.path.join(str(tmp_path / "idx"), "gen001")
    shutil.copytree(os.path.join(str(tmp_path / "idx"), "gen000"), orphan)
    st = idx.compact()
    assert st["generation"] == 1
    assert _keys(idx.lookup("rs")) == [("r0", "a")]
    assert _keys(idx.lookup("go")) == [("r1", "d")]


def test_gc_expired_base_manifest_is_refused(tmp_path):
    """After gc expires a window's base manifest, re-folding that
    window would see the first kept version's FULL state as 'appeared'
    and overwrite the window's previously-correct incremental postings
    (keys deleted later net > 0 and resurface). apply_window must
    refuse loudly instead of corrupting silently."""
    from kafka_connect_mongo_ray.state.snapshot import SnapshotStore

    cfg = _store(tmp_path)  # versions 1 and 2
    base = dict(commit="", partition_id=0, inc=0)
    _replay(cfg, [dict(ts=3, op="i", repo="r2", path="e", lang="py",
                       content="v", **base)])  # version 3
    SnapshotStore(cfg.snapshot_dir, create=False).gc(keep_last=1)

    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang",
                         num_buckets=4)
    with pytest.raises(ValueError, match="garbage-collected"):
        idx.apply_window(cfg.snapshot_dir, 1, 2)


def test_fresh_index_catch_up_bootstraps_from_oldest_kept(tmp_path):
    """catch_up on a FRESH index against a gc'd store folds a
    (0, oldest-kept) bootstrap window — exactly the live set at that
    version — then continues incrementally; membership equals the
    store's live state."""
    from kafka_connect_mongo_ray.state.snapshot import SnapshotStore

    cfg = _store(tmp_path)  # versions 1 and 2
    base = dict(commit="", partition_id=0, inc=0)
    _replay(cfg, [dict(ts=3, op="i", repo="r2", path="e", lang="py",
                       content="v", **base)])  # version 3
    SnapshotStore(cfg.snapshot_dir, create=False).gc(keep_last=2)

    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang",
                         num_buckets=4)
    outs = idx.catch_up(cfg.snapshot_dir)
    # bootstrap (0, 2) + incremental (2, 3)
    assert [o["window"] for o in outs] == [[0, 2], [2, 3]]
    assert _keys(idx.lookup("py")) == [("r1", "c"), ("r2", "e")]
    assert _keys(idx.lookup("rs")) == [("r0", "a")]
    assert _keys(idx.lookup("go")) == [("r1", "d")]
    assert int(idx.manifest["applied_through"]) == 3
    # a second catch-up is a no-op — applied_through advanced on APPLY
    assert idx.catch_up(cfg.snapshot_dir) == []


def test_applied_through_advances_on_apply(tmp_path):
    """applied_through tracks every contiguous apply (not only
    compaction), so catch_up re-runs cost O(new windows) and an
    already-folded window is skipped, never re-folded."""
    cfg = _store(tmp_path)
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang",
                         num_buckets=4)
    idx.apply_window(cfg.snapshot_dir, 0, 1)
    assert int(idx.manifest["applied_through"]) == 1
    idx.apply_window(cfg.snapshot_dir, 1, 2)
    assert int(idx.manifest["applied_through"]) == 2
    out = idx.apply_window(cfg.snapshot_dir, 1, 2)
    assert out.get("skipped")
    assert _keys(idx.lookup("rs")) == [("r0", "a")]


def test_null_attribute_values_are_unindexed(tmp_path):
    """Rows whose indexed attribute is NULL produce no postings (a
    string lookup could never match them), so generation contents are
    identical before and after compaction — the pandas dropna fold can
    no longer silently diverge from the signed history."""
    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"), num_buckets=4)
    base = dict(commit="", partition_id=0, inc=0)
    _replay(cfg, [
        dict(ts=1, op="i", repo="r0", path="a", lang="py", content="x",
             **base),
        dict(ts=1, op="i", repo="r0", path="n", lang=None, content="y",
             **base),
    ])
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang",
                         num_buckets=4)
    idx.apply_window(cfg.snapshot_dir, 0, 1)
    before = idx.counts().to_pandas().set_index("val")["n_keys"].to_dict()
    assert before == {"py": 1}
    st = idx.compact()
    after = idx.counts().to_pandas().set_index("val")["n_keys"].to_dict()
    assert after == before
    assert st["postings"] == 1


def test_micro_batch_loop_bootstraps_fresh_index_over_prior_windows(
        tmp_path):
    """A FRESH index handed to run_micro_batches against a store that
    already has committed history catches up on that history in the
    same pass (catch_up), instead of silently folding only the new
    window."""
    from kafka_connect_mongo_ray.pipelines.stream import run_micro_batches

    cfg = _store(tmp_path)  # versions 1 and 2 already committed
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang",
                         num_buckets=4)
    base = dict(commit="", partition_id=0, inc=0)
    w3 = [dict(ts=3, op="i", repo="r2", path="e", lang="py",
               content="v", **base)]
    from tests.test_oracle_and_gen import make_events

    s = run_micro_batches(
        [lambda: ray.data.from_arrow(make_events(w3)).repartition(2)],
        cfg, index=idx)[0]
    assert s["index"]["window"] == [2, 3]
    assert [f["window"] for f in s["index_catch_up"]] == [[0, 1], [1, 2]]
    # full history present: membership equals the live set
    assert _keys(idx.lookup("py")) == [("r1", "c"), ("r2", "e")]
    assert _keys(idx.lookup("rs")) == [("r0", "a")]
    assert _keys(idx.lookup("go")) == [("r1", "d")]


def test_lookup_ds_matches_driver_lookup(tmp_path):
    """The distributed lookup (hot-value scale path) returns exactly
    the driver-side lookup's live keys — across updates, moves,
    deletes, and a compaction."""
    cfg = _store(tmp_path)
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang",
                         num_buckets=4)
    idx.catch_up(cfg.snapshot_dir)

    def ds_keys(v):
        t = idx.lookup_ds(v).to_pandas()
        # an all-empty distributed result may carry no schema (Ray
        # empty-block semantics, documented on lookup_ds)
        return [] if t.empty else sorted(zip(t["repo"], t["path"]))

    for v in ("py", "rs", "go", "absent"):
        assert ds_keys(v) == sorted(_keys(idx.lookup(v)))
    idx.compact()
    for v in ("py", "rs", "go", "absent"):
        assert ds_keys(v) == sorted(_keys(idx.lookup(v)))


def test_randomized_window_gc_compact_interleavings(tmp_path):
    """Randomized campaign over the index maintenance state machine:
    a seeded stream of {replay, catch_up, compact, gc} operations, with
    the index's membership checked against a pure-Python oracle (the
    live value→key map replayed from the same event log) after every
    catch-up. Pins the round-5 contracts under interleaving: catch_up
    is incremental and idempotent, compaction preserves membership,
    and gc can never corrupt — it either doesn't matter (windows
    already absorbed) or the refusal fires."""
    import numpy as np

    from kafka_connect_mongo_ray.state.snapshot import SnapshotStore

    rng = np.random.default_rng(17)
    langs = ["py", "go", "rs", None]
    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"), num_buckets=4)
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang",
                         num_buckets=4)
    base = dict(commit="", partition_id=0, inc=0)

    oracle: dict[tuple[str, str], str | None] = {}  # key -> lang (live)
    ts = 0

    def check():
        want: dict[str, set] = {}
        for (r, p), lg in oracle.items():
            if lg is not None:
                want.setdefault(lg, set()).add((r, p))
        for lg in ("py", "go", "rs"):
            assert set(_keys(idx.lookup(lg))) == want.get(lg, set()), lg

    for step in range(12):
        op = rng.choice(["replay", "replay", "catch_up", "compact", "gc"])
        if op == "replay":
            ts += 1
            # one event per key per window (LWW within a window would
            # need the engine's tie-break mirrored in the oracle), and
            # the oracle must track only KEPT rows — skip a key already
            # used this window BEFORE consuming its oracle transition
            seen: set = set()
            rows = []
            for _ in range(int(rng.integers(1, 6))):
                r = f"r{int(rng.integers(0, 3))}"
                p = chr(ord("a") + int(rng.integers(0, 6)))
                drop_roll = rng.random()
                lg_roll = int(rng.integers(0, len(langs)))
                if (r, p) in seen:
                    continue
                seen.add((r, p))
                if drop_roll < 0.25 and (r, p) in oracle \
                        and oracle[(r, p)] is not None:
                    rows.append(dict(ts=ts, op="d", repo=r, path=p,
                                     lang=oracle[(r, p)], content=None,
                                     **base))
                    oracle[(r, p)] = None
                else:
                    lg = langs[lg_roll]
                    rows.append(dict(ts=ts, op="i", repo=r, path=p,
                                     lang=lg, content=f"c{ts}", **base))
                    oracle[(r, p)] = lg
            _replay(cfg, rows)
        elif op == "catch_up":
            try:
                idx.catch_up(cfg.snapshot_dir)
            except ValueError as e:
                # gc outran the index: refusing loudly IS the contract
                assert "garbage-collected" in str(e)
            else:
                check()
        elif op == "compact":
            idx.compact()
        else:  # gc
            store = SnapshotStore(cfg.snapshot_dir, create=False)
            if store.current_version() >= 2:
                store.gc(keep_last=2)
    # final reconciliation: catch_up may hit the gc refusal when gc
    # outran the index — that is the CONTRACT (refuse loudly, never
    # corrupt); otherwise membership must equal the oracle
    try:
        idx.catch_up(cfg.snapshot_dir)
    except ValueError as e:
        assert "garbage-collected" in str(e)
    else:
        check()


def test_cli_apply_reports_gc_refusal_as_json_error(tmp_path, capsys):
    """index --apply on a NON-fresh index whose next base manifest was
    gc'd prints one JSON error line and exits 1 — never a traceback,
    never corrupted postings."""
    import json

    from kafka_connect_mongo_ray.__main__ import index_cmd
    from kafka_connect_mongo_ray.state.snapshot import SnapshotStore

    cfg = _store(tmp_path)  # versions 1, 2
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang",
                         num_buckets=4)
    idx.apply_window(cfg.snapshot_dir, 0, 1)  # applied_through = 1
    base = dict(commit="", partition_id=0, inc=0)
    _replay(cfg, [dict(ts=3, op="i", repo="r2", path="e", lang="py",
                       content="v", **base)])  # version 3
    _replay(cfg, [dict(ts=4, op="i", repo="r2", path="f", lang="go",
                       content="w", **base)])  # version 4
    SnapshotStore(cfg.snapshot_dir, create=False).gc(keep_last=1)

    class A:
        snapshot = cfg.snapshot_dir
        index = str(tmp_path / "idx")
        column = "lang"
        buckets = 4
        apply = True
        compact = False
        value = None
        fetch = False
        counts = False
        auto_compact = None

    assert index_cmd(A) == 1
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "garbage-collected" in out["error"]
    # the index's folded prefix is untouched
    assert _keys(idx.lookup("py")) == [("r0", "a"), ("r1", "c")]
