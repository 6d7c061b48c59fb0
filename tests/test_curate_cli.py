"""The `curate` CLI subcommand: synthetic multi-window streaming
curation end-to-end — windows commit with monotone tokens, admissions
land under window={version}, cross-window duplicate content is dropped
exactly once, and a re-run of the same command resumes (0 events in)
without disturbing the index."""

import json
import os

import pyarrow.parquet as pq


def _run(tmp_path, capsys, windows=2, events=4000, seed=7):
    from kafka_connect_mongo_ray.__main__ import main

    rc = main(["curate",
               "--snapshot", str(tmp_path / "s"),
               "--checkpoints", str(tmp_path / "c"),
               "--index", str(tmp_path / "idx"),
               "--curated", str(tmp_path / "cur"),
               "--windows", str(windows), "--events", str(events),
               "--partitions", "2", "--buckets", "4",
               "--index-buckets", "4", "--seed", str(seed)])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    return rc, out


def test_curate_cli_end_to_end(ray_session, tmp_path, capsys):
    rc, out = _run(tmp_path, capsys)
    assert rc == 0
    ws = out["windows"]
    assert [w["version"] for w in ws] == [1, 2]
    for w in ws:
        assert w["events_in"] > 0
        assert 0 < w["curation"]["admitted"] <= w["curation"]["changes"]
    # admissions on disk, one dir per window, fingerprints unique
    # across the whole curated corpus (content-idempotence)
    fps = []
    for w in (1, 2):
        wdir = tmp_path / "cur" / f"window={w}"
        files = [f for f in os.listdir(wdir) if f.endswith(".parquet")]
        assert files
        for f in files:
            fps.extend(pq.read_table(wdir / f, columns=["fp"]
                                     )["fp"].to_pylist())
    assert len(fps) == len(set(fps))
    assert len(fps) == sum(w["curation"]["admitted"] for w in ws)

    # resume: same command again consumes nothing new but re-commits
    rc2, out2 = _run(tmp_path, capsys)
    assert rc2 == 0
    assert all(w["events_in"] == 0 for w in out2["windows"])
