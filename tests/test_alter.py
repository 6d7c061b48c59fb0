"""state/snapshot.py::run_alter_add_column — ALTER TABLE ADD COLUMN
with distributed backfill: every historical row gains the column
(tombstones derive NULL), state is otherwise byte-identical, the union
schema advances, refusals are loud, and the store keeps working
afterwards (healthcheck, point reads, further replays)."""

import json

import pyarrow as pa
import pytest
import ray

from kafka_connect_mongo_ray.config import EngineConfig
from kafka_connect_mongo_ray.pipelines.cdc import (
    final_state_dataset,
    point_lookup,
    run_replay,
)
from kafka_connect_mongo_ray.state.snapshot import (
    SnapshotStore,
    run_alter_add_column,
)
from tests.test_oracle_and_gen import make_events


def _store(tmp_path):
    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"), num_buckets=4)
    base = dict(commit="", partition_id=0, inc=0, lang="py")
    run_replay(ray.data.from_arrow(make_events([
        dict(ts=1, op="i", repo="r0", path="a",
             content="hello world", **base),
        dict(ts=1, op="i", repo="r0", path="b", content="one", **base),
        dict(ts=1, op="i", repo="r1", path="c",
             content="a b c d", **base),
        dict(ts=2, op="d", repo="r0", path="b", content=None, **base),
    ])).repartition(2), cfg)
    return cfg


def test_alter_backfills_every_row_and_preserves_state(tmp_path):
    cfg = _store(tmp_path)
    before = (final_state_dataset(cfg).to_pandas()
              .sort_values("path").reset_index(drop=True))
    out = run_alter_add_column(cfg.snapshot_dir, "n_tokens",
                               derive="tokens")
    assert out["new_version"] == 2 and out["buckets_rewritten"] >= 1
    out2 = run_alter_add_column(cfg.snapshot_dir, "tier", const="bronze")
    assert out2["new_version"] == 3
    after = (final_state_dataset(cfg).to_pandas()
             .sort_values("path").reset_index(drop=True))
    # pre-existing columns byte-identical, new columns correct
    for c in before.columns:
        assert after[c].tolist() == before[c].tolist()
    assert after.set_index("path")["n_tokens"].to_dict() == {
        "a": 2, "c": 4}
    assert set(after["tier"]) == {"bronze"}
    # tombstone rows (state, not live) derive NULL for content metrics
    store = SnapshotStore(cfg.snapshot_dir, create=False)
    import pyarrow.parquet as pq

    st = pa.concat_tables(
        [pq.read_table(f) for f in store.bucket_files(3)],
        promote_options="permissive").to_pandas()
    dead = st[st.content.isna()]
    assert len(dead) == 1 and dead["n_tokens"].isna().all()
    assert dead["tier"].tolist() == ["bronze"]
    # point reads keep working against the altered store (GET answers
    # with the stable core schema by design — evolved columns are the
    # scan/export surface)
    t = point_lookup(cfg, [("r0", "a")])
    assert t.num_rows == 1 and t["content"][0].as_py() == "hello world"


def test_alter_refusals_and_cli(tmp_path, capsys):
    cfg = _store(tmp_path)
    with pytest.raises(ValueError, match="exactly one"):
        run_alter_add_column(cfg.snapshot_dir, "x",
                             const="a", derive="chars")
    with pytest.raises(ValueError, match="already exists"):
        run_alter_add_column(cfg.snapshot_dir, "content", const="x")
    with pytest.raises(ValueError, match="unknown derivation"):
        run_alter_add_column(cfg.snapshot_dir, "x", derive="md5")

    from kafka_connect_mongo_ray.__main__ import main

    rc = main(["alter", "--snapshot", cfg.snapshot_dir,
               "--column", "n_chars", "--derive", "chars"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["column"] == "n_chars"
    rc = main(["alter", "--snapshot", cfg.snapshot_dir,
               "--column", "n_chars", "--derive", "chars"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and "already exists" in out["error"]


def test_alter_then_replay_keeps_schema_and_resumes(tmp_path):
    """The altered union schema must survive the NEXT organic commit:
    a later replay's rows (which lack the new column) conform to the
    union with nulls, and resume tokens carried through the alter mean
    no event replays."""
    cfg = _store(tmp_path)
    run_alter_add_column(cfg.snapshot_dir, "tier", const="gold")
    base = dict(commit="", partition_id=0, inc=1, lang="py")
    run_replay(ray.data.from_arrow(make_events([
        dict(ts=5, op="i", repo="r1", path="z", content="new row", **base),
    ])).repartition(1), cfg)
    df = (final_state_dataset(cfg).to_pandas()
          .sort_values("path").reset_index(drop=True))
    by = df.set_index("path")["tier"].to_dict()
    assert by["a"] == "gold" and by["c"] == "gold"
    assert by["z"] is None  # organic rows predate no backfill
    assert len(df) == 3  # a, c, z live; b stays tombstoned


def test_altered_column_is_secondary_indexable(tmp_path):
    """Cross-feature composition: an alter-backfilled column feeds the
    secondary index by BOOTSTRAPPING from the full state (window
    0→current diffs everything in). A targeted lookup on the derived
    value returns exactly the matching live keys. Note: a plain
    post-alter window diff sees NO changes (the alter preserves every
    (ts, inc, op_rank)), so the bootstrap window is the correct way to
    index a backfilled column."""
    from kafka_connect_mongo_ray.state.secondary_index import SecondaryIndex

    cfg = _store(tmp_path)
    run_alter_add_column(cfg.snapshot_dir, "n_tokens", derive="tokens")
    store = SnapshotStore(cfg.snapshot_dir, create=False)
    cur = store.current_version()
    idx = SecondaryIndex(str(tmp_path / "idx"), column="n_tokens",
                         num_buckets=4)
    idx.apply_window(cfg.snapshot_dir, 0, cur)
    # live rows: a="hello world" (2 tokens), c="a b c d" (4 tokens)
    two = idx.lookup("2")
    four = idx.lookup("4")
    assert list(zip(two["repo"].to_pylist(),
                    two["path"].to_pylist())) == [("r0", "a")]
    assert list(zip(four["repo"].to_pylist(),
                    four["path"].to_pylist())) == [("r1", "c")]
    # the tombstone (null content -> null n_tokens) must NOT index
    c = idx.counts().to_pandas()
    assert int(c["n_keys"].sum()) == 2


def test_alter_drop_column_and_drop_readd(tmp_path, capsys):
    """DROP COLUMN is the add inverse: the column leaves every row and
    the union schema; core columns and absent columns are refused; and
    the sanctioned drop+re-add path changes a backfilled value."""
    import numpy as np

    from kafka_connect_mongo_ray.state.snapshot import (
        run_alter_drop_column,
    )

    cfg = _store(tmp_path)
    run_alter_add_column(cfg.snapshot_dir, "tier", const="bronze")
    with pytest.raises(ValueError, match="core row contract"):
        run_alter_drop_column(cfg.snapshot_dir, "content")
    with pytest.raises(ValueError, match="does not exist"):
        run_alter_drop_column(cfg.snapshot_dir, "ghost")
    out = run_alter_drop_column(cfg.snapshot_dir, "tier")
    assert out["buckets_rewritten"] >= 1
    df = final_state_dataset(cfg).to_pandas()
    assert "tier" not in df.columns
    # drop + re-add with a NEW value — the sanctioned change path
    run_alter_add_column(cfg.snapshot_dir, "tier", const="gold")
    df = final_state_dataset(cfg).to_pandas()
    assert set(df["tier"]) == {"gold"}
    # state otherwise intact through three full rewrites
    assert sorted(df["path"]) == ["a", "c"]
    assert df.set_index("path")["content"].to_dict() == {
        "a": "hello world", "c": "a b c d"}

    from kafka_connect_mongo_ray.__main__ import main

    rc = main(["alter", "--snapshot", cfg.snapshot_dir,
               "--column", "tier", "--drop"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["column"] == "tier"
    rc = main(["alter", "--snapshot", cfg.snapshot_dir,
               "--column", "tier", "--drop", "--const", "x"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
