"""state/ivm.py — incremental view maintenance invariant: the
delta-maintained per-repo aggregate equals a full recompute over the
live rows of the latest snapshot, at every window boundary, including
the edges the op string blurs (re-delete, tombstone → live re-insert,
update that changes length)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from kafka_connect_mongo_ray.config import EngineConfig
from kafka_connect_mongo_ray.pipelines.cdc import (
    final_state_dataset,
    run_replay,
)
from kafka_connect_mongo_ray.state.ivm import maintain_group_aggregate
from tests.test_oracle_and_gen import make_events


def _ds(tbl, blocks=3):
    return ray.data.from_arrow(tbl).repartition(blocks)


def _recompute(cfg, version):
    live = final_state_dataset(cfg, version=version).to_pandas()
    live = live[live.content.notna()]
    g = (live.assign(m=live.content.str.len().astype(np.int64))
         .groupby("repo").agg(n_live=("path", "count"), total_chars=("m", "sum"))
         .reset_index())
    return {(r.repo): (int(r.n_live), int(r.total_chars))
            for r in g.itertuples()}


def _state_dict(ds):
    df = ds.to_pandas()
    return {r.repo: (int(r.n_live), int(r.total_chars))
            for r in df.itertuples()}


def test_ivm_matches_recompute_across_edge_windows(tmp_path):
    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"), num_buckets=4)
    base = dict(commit="", lang="py", partition_id=0, inc=0)
    # v1: inserts in two repos
    run_replay(_ds(make_events([
        dict(ts=1, op="i", repo="r0", path="a", content="xxxx", **base),
        dict(ts=1, op="i", repo="r0", path="b", content="yy", **base),
        dict(ts=1, op="i", repo="r1", path="c", content="z", **base),
    ])), cfg)
    # v2: update changing length, delete, insert
    run_replay(_ds(make_events([
        dict(ts=2, op="u", repo="r0", path="a", content="xxxxxxxx", **base),
        dict(ts=2, op="d", repo="r0", path="b", content=None, **base),
        dict(ts=2, op="i", repo="r1", path="d", content="ww", **base),
    ])), cfg)
    # v3: re-delete an already-dead key (no-op), resurrect b, kill all
    # of r1 (group must drop from the state entirely)
    run_replay(_ds(make_events([
        dict(ts=3, op="d", repo="r0", path="b", content=None, **base),
        dict(ts=4, op="i", repo="r0", path="b", content="back", **base),
        dict(ts=3, op="d", repo="r1", path="c", content=None, **base),
        dict(ts=3, op="d", repo="r1", path="d", content=None, **base),
    ])), cfg)
    for upto in (1, 2, 3):
        got = _state_dict(maintain_group_aggregate(
            cfg.snapshot_dir, list(range(upto + 1)), num_partitions=2))
        assert got == _recompute(cfg, upto), f"diverged at v{upto}"
    # the final state: r1 fully tombstoned -> absent
    final = _state_dict(maintain_group_aggregate(
        cfg.snapshot_dir, [0, 1, 2, 3], num_partitions=2))
    assert "r1" not in final
    assert final["r0"] == (2, len("xxxxxxxx") + len("back"))


def test_ivm_matches_recompute_on_random_sequences(tmp_path):
    rng = np.random.default_rng(5)
    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"), num_buckets=4)
    base = dict(commit="", lang="py", partition_id=0, inc=0)
    alive = {}
    ts = 0
    for w in range(1, 4):
        rows = []
        for _ in range(60):
            ts += 1
            repo = f"r{int(rng.integers(0, 3))}"
            path = f"p{int(rng.integers(0, 25))}"
            key = (repo, path)
            roll = rng.random()
            if key in alive and roll < 0.3:
                rows.append(dict(ts=ts, op="d", repo=repo, path=path,
                                 content=None, **base))
                alive.pop(key)
            else:
                content = "c" * int(rng.integers(1, 12))
                op = "u" if key in alive else "i"
                rows.append(dict(ts=ts, op=op, repo=repo, path=path,
                                 content=content, **base))
                alive[key] = content
        run_replay(_ds(make_events(rows)), cfg)
        got = _state_dict(maintain_group_aggregate(
            cfg.snapshot_dir, list(range(w + 1)), num_partitions=2))
        want = {}
        for (repo, _), content in alive.items():
            n, m = want.get(repo, (0, 0))
            want[repo] = (n + 1, m + len(content))
        assert got == want, f"diverged at window {w}"


def test_change_feed_default_schema_unchanged(tmp_path):
    """include_old defaults off: the wire schema existing consumers
    parse (curate.py, cdc_change_feed) must be byte-compatible."""
    from kafka_connect_mongo_ray.state.diff import (
        DIFF_SCHEMA,
        changes_between,
    )

    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"), num_buckets=2)
    base = dict(commit="", lang="py", partition_id=0, inc=0)
    run_replay(_ds(make_events([
        dict(ts=1, op="i", repo="r0", path="a", content="x", **base)])), cfg)
    feed = changes_between(cfg.snapshot_dir, 0, 1)
    t = pa.concat_tables(list(
        feed.iter_batches(batch_size=None, batch_format="pyarrow")))
    assert t.schema.equals(DIFF_SCHEMA)
    assert t.num_rows == 1 and "content_old" not in t.column_names


def test_persisted_ivm_state_fold_idempotent_and_crash_safe(tmp_path):
    import os

    from kafka_connect_mongo_ray.state.ivm import IvmState

    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"), num_buckets=4)
    base = dict(commit="", lang="py", partition_id=0, inc=0)
    run_replay(_ds(make_events([
        dict(ts=1, op="i", repo="r0", path="a", content="xxxx", **base),
        dict(ts=1, op="i", repo="r1", path="b", content="yy", **base),
    ])), cfg)
    run_replay(_ds(make_events([
        dict(ts=2, op="u", repo="r0", path="a", content="x", **base),
        dict(ts=2, op="d", repo="r1", path="b", content=None, **base),
    ])), cfg)

    st = IvmState(str(tmp_path / "ivm"))
    # a crashed earlier attempt left a tmp orphan: must be ignored
    os.makedirs(st.root + "/.tmp-crashed", exist_ok=True)
    assert st.current_version() == 0
    r1 = st.fold_window(cfg.snapshot_dir, 1, num_partitions=2)
    assert r1["applied"] and st.current_version() == 1
    got1 = {r["repo"]: (r["n_live"], r["total_chars"])
            for r in st.read().to_pylist()}
    assert got1 == {"r0": (1, 4), "r1": (1, 2)}
    r2 = st.fold_window(cfg.snapshot_dir, 2, num_partitions=2)
    assert r2["applied"]
    got2 = {r["repo"]: (r["n_live"], r["total_chars"])
            for r in st.read().to_pylist()}
    assert got2 == {"r0": (1, 1)}  # r1 fully retracted, update shrank a
    # re-fold of an applied window is a detected no-op
    again = st.fold_window(cfg.snapshot_dir, 2, num_partitions=2)
    assert not again["applied"] and again["reason"] == "already-folded"
    # matches the from-scratch fold
    scratch = _state_dict(maintain_group_aggregate(
        cfg.snapshot_dir, [0, 1, 2], num_partitions=2))
    assert {k: v for k, v in got2.items()} == scratch
    # gc drops old versions and the crash orphan
    dropped = st.gc(keep_last=1)
    assert dropped == [1]
    assert not [d for d in os.listdir(st.root) if d.startswith(".tmp-")]
    assert st.current_version() == 2


def test_persisted_ivm_rejects_out_of_order_windows(tmp_path):
    import pytest as _pytest

    from kafka_connect_mongo_ray.state.ivm import IvmState

    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"), num_buckets=2)
    base = dict(commit="", lang="py", partition_id=0, inc=0)
    run_replay(_ds(make_events([
        dict(ts=1, op="i", repo="r0", path="a", content="x", **base)])), cfg)
    st = IvmState(str(tmp_path / "ivm"))
    st.fold_window(cfg.snapshot_dir, 1, num_partitions=2)
    with _pytest.raises(ValueError, match="precedes"):
        st.fold_window(cfg.snapshot_dir, 0, num_partitions=2)


def test_ivm_cli_catches_up_and_matches_replay(tmp_path, capsys):
    import json

    from kafka_connect_mongo_ray.__main__ import main

    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"), num_buckets=2)
    base = dict(commit="", lang="py", partition_id=0, inc=0)
    s = run_replay(_ds(make_events([
        dict(ts=1, op="i", repo="r0", path="a", content="xx", **base),
        dict(ts=2, op="d", repo="r0", path="a", content=None, **base),
        dict(ts=1, op="i", repo="r1", path="b", content="yyy", **base),
    ])), cfg)
    rc = main(["ivm", "--snapshot", cfg.snapshot_dir,
               "--state", str(tmp_path / "ivm")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["state_version"] == 1
    assert out["n_live"] == s["live_rows"] == 1
    # second run: nothing to fold
    rc = main(["ivm", "--snapshot", cfg.snapshot_dir,
               "--state", str(tmp_path / "ivm")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["folds"] == []


def test_fold_commit_race_loser_is_idempotent_noop(tmp_path, monkeypatch):
    """Two at-least-once drivers fold the same window: the loser's
    os.replace hits the winner's committed dir and must degrade to the
    already-folded no-op, not a traceback."""
    import os
    import shutil

    from kafka_connect_mongo_ray.state.ivm import IvmState

    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"), num_buckets=2)
    base = dict(commit="", lang="py", partition_id=0, inc=0)
    run_replay(_ds(make_events([
        dict(ts=1, op="i", repo="r0", path="a", content="x", **base)])), cfg)
    st = IvmState(str(tmp_path / "ivm"))
    real_replace = os.replace

    def racing_replace(src, dst):
        if dst.endswith("/v1") and not os.path.exists(dst):
            # the competing driver commits first
            shutil.copytree(src, dst)
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", racing_replace)
    r = st.fold_window(cfg.snapshot_dir, 1, num_partitions=2)
    assert not r["applied"] and r["reason"] == "lost-commit-race"
    monkeypatch.undo()
    assert st.current_version() == 1
    got = {x["repo"]: x["n_live"] for x in st.read().to_pylist()}
    assert got == {"r0": 1}


def test_pluggable_token_metric_matches_reference(tmp_path):
    from kafka_connect_mongo_ray.state.ivm import (
        METRIC_CHARS,
        METRIC_TOKENS,
        IvmState,
    )

    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"), num_buckets=2)
    base = dict(commit="", lang="py", partition_id=0, inc=0)
    run_replay(_ds(make_events([
        dict(ts=1, op="i", repo="r0", path="a",
             content="one two  three", **base),     # 3 tokens, 14 chars
        dict(ts=1, op="i", repo="r0", path="b", content="  ", **base),
    ])), cfg)
    run_replay(_ds(make_events([
        dict(ts=2, op="u", repo="r0", path="a", content="just one", **base),
    ])), cfg)
    st = IvmState(str(tmp_path / "ivm"),
                  metrics={"total_chars": METRIC_CHARS,
                           "n_tokens": METRIC_TOKENS})
    st.fold_window(cfg.snapshot_dir, 1, num_partitions=2)
    st.fold_window(cfg.snapshot_dir, 2, num_partitions=2)
    row = st.read().to_pylist()[0]
    # live: a="just one" (8 chars, 2 tokens), b="  " (2 chars, 0 tokens)
    assert row == {"repo": "r0", "n_live": 2, "total_chars": 10,
                   "n_tokens": 2}


def test_persisted_ivm_refuses_mismatched_metric_sets(tmp_path):
    import pytest as _pytest

    from kafka_connect_mongo_ray.state.ivm import (
        METRIC_CHARS,
        METRIC_TOKENS,
        IvmState,
    )

    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"), num_buckets=2)
    base = dict(commit="", lang="py", partition_id=0, inc=0)
    run_replay(_ds(make_events([
        dict(ts=1, op="i", repo="r0", path="a", content="x y", **base)])),
        cfg)
    run_replay(_ds(make_events([
        dict(ts=2, op="i", repo="r0", path="b", content="z", **base)])),
        cfg)
    st = IvmState(str(tmp_path / "ivm"))  # default: chars only
    st.fold_window(cfg.snapshot_dir, 1, num_partitions=2)
    wide = IvmState(str(tmp_path / "ivm"),
                    metrics={"total_chars": METRIC_CHARS,
                             "n_tokens": METRIC_TOKENS})
    with _pytest.raises(ValueError, match="do not match configured"):
        wide.fold_window(cfg.snapshot_dir, 2, num_partitions=2)


def test_ivm_moments_match_full_recompute_with_retractions(tmp_path):
    """(n, Σx, Σx²)-maintained mean/variance equals a full recompute
    over the live rows after updates, deletes, and a resurrection —
    second moments stay exact under subtraction-only retraction."""
    from kafka_connect_mongo_ray.state.ivm import (
        MOMENT_METRICS,
        derive_moments,
    )

    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"), num_buckets=4)
    base = dict(commit="", lang="py", partition_id=0, inc=0)
    run_replay(_ds(make_events([
        dict(ts=1, op="i", repo="r0", path="a", content="xxxx", **base),
        dict(ts=1, op="i", repo="r0", path="b", content="yy", **base),
        dict(ts=1, op="i", repo="r1", path="c", content="zzz", **base),
    ])), cfg)
    run_replay(_ds(make_events([
        dict(ts=2, op="u", repo="r0", path="a", content="xxxxxxxx", **base),
        dict(ts=2, op="d", repo="r0", path="b", content=None, **base),
        dict(ts=3, op="i", repo="r0", path="b", content="back!", **base),
        dict(ts=2, op="i", repo="r1", path="d", content="w", **base),
    ])), cfg)
    state = maintain_group_aggregate(
        cfg.snapshot_dir, [0, 1, 2], num_partitions=2,
        metrics=MOMENT_METRICS)
    got = (state.map_batches(derive_moments, batch_format="pyarrow")
           .to_pandas().sort_values("repo").reset_index(drop=True))
    live = final_state_dataset(cfg, version=2).to_pandas()
    live = live[live.content.notna()]
    lens = live.content.str.len().astype(np.int64)
    ref = (pd.DataFrame({"repo": live.repo, "s1": lens, "s2": lens * lens})
           .groupby("repo").agg(n=("s1", "count"), s1=("s1", "sum"),
                                s2=("s2", "sum")).reset_index())
    for _, r in ref.iterrows():
        row = got[got.repo == r.repo].iloc[0]
        n = float(r.n)
        m = float(r.s1) / n
        assert row["n_live"] == r.n
        assert abs(row["mean_chars"] - round(m, 9)) < 1e-12
        assert abs(row["var_chars"]
                   - round(float(r.s2) / n - m * m, 9)) < 1e-9
