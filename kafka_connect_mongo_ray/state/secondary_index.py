"""Persisted attribute→key SECONDARY INDEX over the snapshot store,
maintained incrementally from the change feed — the "find every live
key whose ``lang`` is 'fr' without scanning the table" read path.

Reference analog: none (the reference ships rows to a sink that owns
its own indexes); a lake-side engine must provide the index itself.
Design, at any scale:

- the index is an IVM of the (value → key) mapping: each committed
  window contributes SIGNED postings derived from the change feed's
  pre/post images (``state/diff.py`` with ``attr_cols``) — ``+1`` for
  the post-image's value when the key is live after, ``-1`` for the
  pre-image's value when it was live before; a key whose attribute is
  unchanged between two live images contributes nothing. Membership
  at read time = net sign > 0 per (value, key).
- layout is value-hash-BUCKETED Parquet under a GENERATION dir
  (``gen000/bucket=N/w{version}.parquet``): one file per touched
  bucket per window, with a DETERMINISTIC name, so re-applying a
  window after a crash overwrites instead of double-counting —
  idempotence by construction, no write-ahead state. The bucket rule
  is ``utils.hash_buckets`` (the same persisted-layout hash the
  snapshot store commits to).
- a LOOKUP reads exactly one bucket directory (value-hash pruning),
  folds signs per key, and returns live keys. Per-lookup cost is one
  bucket's postings; ``num_buckets`` is the knob that keeps that
  worker-sized — the same contract as every other bucketed store here.
- COMPACTION folds each bucket's signed history into net ``+1``
  postings inside a NEW generation and swaps ``manifest.json``
  atomically (tmp + ``os.replace`` — the repo's commit primitive),
  then best-effort-removes the old generation: a crash anywhere
  leaves the manifest pointing at a complete generation. The manifest
  records ``applied_through`` so a late re-apply of an
  already-compacted window is refused as a no-op (its postings are
  already folded in).

Single-writer by contract (the CDC driver owns maintenance), readers
are lock-free — manifest reads are atomic snapshots.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["SecondaryIndex"]

POSTING_SCHEMA = pa.schema([
    pa.field("val", pa.string()),
    pa.field("repo", pa.string()),
    pa.field("path", pa.string()),
    pa.field("sign", pa.int8()),
])


def _bucket_of_vals(vals: pa.Array | pa.ChunkedArray,
                    num_buckets: int) -> np.ndarray:
    from kafka_connect_mongo_ray.utils import hash_buckets

    return hash_buckets(pa.table({"val": vals}), ["val"], num_buckets)


class SecondaryIndex:
    """See module docstring. ``column`` must be one of the store's
    attribute columns (e.g. ``lang``); values index as strings."""

    def __init__(self, index_dir: str, *, column: str = "lang",
                 num_buckets: int = 16, create: bool = True,
                 auto_compact_after: int | None = None):
        self.auto_compact_after = auto_compact_after
        self.root = index_dir
        self.manifest_path = os.path.join(index_dir, "manifest.json")
        if os.path.exists(self.manifest_path):
            m = json.load(open(self.manifest_path))
            if m["column"] != column or m["num_buckets"] != num_buckets:
                raise ValueError(
                    f"index at {index_dir} is over column={m['column']} "
                    f"num_buckets={m['num_buckets']}; refusing a "
                    f"conflicting configuration (column={column}, "
                    f"num_buckets={num_buckets})")
            self.manifest = m
        elif create:
            os.makedirs(os.path.join(index_dir, "gen000"), exist_ok=True)
            self.manifest = {"column": column, "num_buckets": num_buckets,
                             "generation": 0, "applied_through": 0}
            self._commit_manifest()
        else:
            raise FileNotFoundError(f"no index at {index_dir}")
        self.column = column
        self.num_buckets = num_buckets

    # -- commit primitives -------------------------------------------------

    def _commit_manifest(self) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f)
        os.replace(tmp, self.manifest_path)

    def _gen_dir(self) -> str:
        return os.path.join(self.root, f"gen{self.manifest['generation']:03d}")

    # -- maintenance -------------------------------------------------------

    def apply_window(self, snapshot_dir: str, v_old: int, v_new: int) -> dict:
        """Fold one change-feed window's postings into the index.
        Distributed end to end: the feed's signed postings shuffle by
        value-hash bucket and each bucket task writes ITS window file
        directly (write-tmp-then-rename). Returns per-window stats."""
        from kafka_connect_mongo_ray.state.diff import changes_between

        if v_new <= int(self.manifest.get("applied_through", 0)):
            return {"window": [v_old, v_new], "postings": 0,
                    "skipped": "already folded"}
        if v_old > 0:
            from kafka_connect_mongo_ray.state.snapshot import SnapshotStore

            if SnapshotStore(snapshot_dir, create=False).manifest(v_old) \
                    is None:
                # gc expired v_old's manifest: the diff would see the
                # FULL state of the first kept version as 'appeared'
                # and overwrite this window's previously-correct
                # incremental postings (deterministic file names) with
                # full-state +1s — keys deleted later would net > 0 and
                # resurface as live. Refuse loudly instead.
                raise ValueError(
                    f"cannot fold window ({v_old}, {v_new}): version "
                    f"{v_old}'s manifest was garbage-collected; rebuild "
                    f"the index (fresh catch_up bootstraps from the "
                    f"oldest kept version) or raise gc keep_last")
        col = self.column
        feed = changes_between(snapshot_dir, v_old, v_new,
                               include_old=True, attr_cols=[col])

        def signed(batch: pa.Table) -> pa.Table:
            new_live = pc.is_valid(batch["content"]).to_numpy(
                zero_copy_only=False)
            old_live = pc.is_valid(batch["content_old"]).to_numpy(
                zero_copy_only=False)
            v_post = np.asarray(batch[col]).astype(object)
            v_pre = np.asarray(batch[f"{col}_old"]).astype(object)
            repo = np.asarray(batch["repo"]).astype(object)
            path = np.asarray(batch["path"]).astype(object)
            # live→live with the attribute unchanged: no index churn
            churn = ~(new_live & old_live & (v_post == v_pre))
            add = new_live & churn
            drop = old_live & churn
            vals = np.concatenate([v_post[add], v_pre[drop]])
            repos = np.concatenate([repo[add], repo[drop]])
            paths = np.concatenate([path[add], path[drop]])
            signs = np.concatenate(
                [np.ones(int(add.sum()), dtype=np.int8),
                 -np.ones(int(drop.sum()), dtype=np.int8)])
            # NULL attributes are UNINDEXED (lookup takes a string; a
            # NULL posting could never be queried) — and emitting them
            # would diverge across compaction, whose pandas groupby
            # drops NaN groups by default. Filter at the source.
            keep = np.array([v is not None for v in vals], dtype=bool)
            if not keep.all():
                vals, repos, paths, signs = (
                    vals[keep], repos[keep], paths[keep], signs[keep])
            t = pa.table({
                "val": pa.array(vals, pa.string()),
                "repo": pa.array(repos, pa.string()),
                "path": pa.array(paths, pa.string()),
                "sign": pa.array(signs, pa.int8()),
            })
            return t.append_column("bucket", pa.array(
                _bucket_of_vals(t["val"], self.num_buckets)))

        gen = self._gen_dir()
        fname = f"w{v_new:012d}.parquet"

        def write_bucket(g: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq

            b = int(g["bucket"][0].as_py())
            bdir = os.path.join(gen, f"bucket={b}")
            os.makedirs(bdir, exist_ok=True)
            t = g.drop_columns(["bucket"])
            tmp = os.path.join(bdir, fname + ".inprogress")
            pq.write_table(t, tmp)
            os.replace(tmp, os.path.join(bdir, fname))
            return pa.table({"bucket": pa.array([b], pa.int64()),
                             "postings": pa.array([t.num_rows], pa.int64())})

        stats = (feed.map_batches(signed, batch_format="pyarrow")
                 .groupby("bucket").map_groups(write_bucket,
                                               batch_format="pyarrow")
                 .to_pandas())  # bucket-domain-sized
        out = {"window": [v_old, v_new],
               "buckets_touched": int(len(stats)),
               "postings": int(stats["postings"].sum()) if len(stats) else 0}
        # applied_through advances on APPLY (not only on compaction)
        # whenever this window extends the contiguous folded prefix —
        # so catch_up is O(new windows) instead of re-folding 1..v, and
        # an already-folded window can never be clobbered by a later
        # full-state diff. A crash before this commit just re-applies
        # the window (deterministic file names overwrite).
        ap = int(self.manifest.get("applied_through", 0))
        if v_old <= ap:
            self.manifest["applied_through"] = max(ap, int(v_new))
            self._commit_manifest()
        if self.auto_compact_after:
            # fold once the read amplification budget is spent: any
            # bucket holding more than N window files triggers a
            # compaction (lookup cost is files-per-bucket × filter)
            most = 0
            for d in os.listdir(gen):
                bdir = os.path.join(gen, d)
                if os.path.isdir(bdir):
                    most = max(most, sum(
                        1 for f in os.listdir(bdir)
                        if f.endswith(".parquet")))
            if most > self.auto_compact_after:
                out["compacted"] = self.compact()
        return out

    def catch_up(self, snapshot_dir: str,
                 v_current: int | None = None) -> list[dict]:
        """Fold every committed window the index has not absorbed yet.
        Starts from ``applied_through`` (tracked on every apply), so a
        repeated catch-up costs O(new windows), not O(v²). A FRESH
        index against a store whose early manifests were gc'd
        bootstraps from the oldest KEPT version — a (0, oldest) window
        diff is exactly the live set at that version, the correct
        initial postings. A non-fresh index whose next base manifest
        was gc'd raises (see :meth:`apply_window`)."""
        from kafka_connect_mongo_ray.state.snapshot import SnapshotStore

        store = SnapshotStore(snapshot_dir, create=False)
        cur = store.current_version() if v_current is None \
            else int(v_current)
        ap = int(self.manifest.get("applied_through", 0))
        if cur <= ap:
            return []
        outs: list[dict] = []
        start = ap + 1
        if ap == 0:
            oldest = next((v for v in range(1, cur + 1)
                           if store.manifest(v) is not None), None)
            if oldest is None:
                return []
            if oldest > 1:
                outs.append(self.apply_window(snapshot_dir, 0, oldest))
                start = oldest + 1
        outs.extend(self.apply_window(snapshot_dir, w - 1, w)
                    for w in range(start, cur + 1))
        return outs

    # -- reads ---------------------------------------------------------------

    def lookup(self, value: str) -> pa.Table:
        """Live (repo, path) keys whose attribute equals ``value`` —
        reads ONE bucket directory (value-hash pruning), folds signs
        per key. Driver-side by design: the result and the bucket are
        lookup-bounded, not table-bounded."""
        import pyarrow.parquet as pq

        b = int(_bucket_of_vals(pa.array([value], pa.string()),
                                self.num_buckets)[0])
        bdir = os.path.join(self._gen_dir(), f"bucket={b}")
        if not os.path.isdir(bdir):
            return POSTING_SCHEMA.empty_table().select(["repo", "path"])
        import pandas as pd

        parts = [pq.read_table(os.path.join(bdir, f))
                 for f in sorted(os.listdir(bdir)) if f.endswith(".parquet")]
        t = pa.concat_tables(parts)
        t = t.filter(pc.equal(t["val"], pa.scalar(value, pa.string())))
        if t.num_rows == 0:
            return POSTING_SCHEMA.empty_table().select(["repo", "path"])
        df = t.to_pandas()
        net = (df.groupby(["repo", "path"], as_index=False)["sign"].sum())
        live = net[net["sign"] > 0].drop(columns=["sign"])
        live = live.sort_values(["repo", "path"]).reset_index(drop=True)
        return pa.table({"repo": pa.array(live["repo"].to_numpy(object),
                                          pa.string()),
                         "path": pa.array(live["path"].to_numpy(object),
                                          pa.string())})

    def lookup_ds(self, value: str):
        """Distributed :meth:`lookup`: the same one-bucket-directory
        read expressed as a Dataset — ``read_parquet`` over the bucket's
        files, a value filter, and a key-bucketed signed fold, with only
        live keys leaving each task. For a HOT value whose postings
        outgrow one driver heap (the documented ``lookup()`` bound),
        this is the scale path: work distributes across the bucket's
        window files and the result streams. Returns a Dataset of
        ``(repo, path)``; per Ray's empty-block semantics an all-empty
        result may carry NO schema — check emptiness before
        dataset-level column ops (NEXT.md round-4 finding)."""
        import ray.data as rd
        from kafka_connect_mongo_ray.utils import key_bucketed

        b = int(_bucket_of_vals(pa.array([value], pa.string()),
                                self.num_buckets)[0])
        bdir = os.path.join(self._gen_dir(), f"bucket={b}")
        files = ([os.path.join(bdir, f) for f in sorted(os.listdir(bdir))
                  if f.endswith(".parquet")]
                 if os.path.isdir(bdir) else [])
        empty = POSTING_SCHEMA.empty_table().select(["repo", "path"])
        if not files:
            return rd.from_arrow(empty)

        def keep_value(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["val"],
                                     pa.scalar(value, pa.string())))

        def fold(g: pa.Table) -> pa.Table:
            import pandas as pd

            df = g.select(["repo", "path", "sign"]).to_pandas()
            net = df.groupby(["repo", "path"], as_index=False)["sign"].sum()
            live = net[net["sign"] > 0]
            return pa.table({
                "repo": pa.array(live["repo"].to_numpy(object),
                                 pa.string()),
                "path": pa.array(live["path"].to_numpy(object),
                                 pa.string())})

        ds = (rd.read_parquet(files)
              .map_batches(keep_value, batch_format="pyarrow"))
        # signed history of one (repo, path) must fold in one task —
        # bucket by the key pair (the repo's window-family pattern)
        return key_bucketed(ds, ["repo", "path"],
                            self.num_buckets).map_groups(
            fold, batch_format="pyarrow")

    def counts(self) -> pa.Table:
        """Per-value live-key counts over the whole index — a full
        (bucket-parallel) fold, group-domain-sized output. The fold
        groups by a hash of the FULL (val, repo, path) triple, not the
        value: net-sign is a per-triple property, so the triple split
        is always correct and a hot value (half the corpus sharing one
        ``lang``) never becomes one unbounded task group — each bucket
        emits per-value PARTIAL counts and a value-domain Sum
        finishes."""
        import ray.data as rd
        from ray.data.aggregate import Sum

        gen = self._gen_dir()
        files = [os.path.join(gen, d, f) for d in sorted(os.listdir(gen))
                 for f in sorted(os.listdir(os.path.join(gen, d)))
                 if f.endswith(".parquet")]
        if not files:
            return pa.table({"val": pa.array([], pa.string()),
                             "n_keys": pa.array([], pa.int64())})
        ds = rd.read_parquet(files)

        def fold(g: pa.Table) -> pa.Table:
            df = g.to_pandas()
            net = df.groupby(["val", "repo", "path"])["sign"].sum()
            alive = net[net > 0].reset_index()
            c = alive.groupby("val").size().reset_index(name="n_keys")
            return pa.table({"val": pa.array(c["val"].to_numpy(object),
                                             pa.string()),
                             "n_keys": pa.array(c["n_keys"].to_numpy(),
                                                pa.int64())})

        from kafka_connect_mongo_ray.utils import key_bucketed

        folded = key_bucketed(ds, ["val", "repo", "path"],
                              self.num_buckets).map_groups(
            fold, batch_format="pyarrow")
        d = (folded.groupby("val")
             .aggregate(Sum("n_keys", alias_name="n_keys")).to_pandas())
        return pa.table({
            "val": pa.array(d["val"].to_numpy(object), pa.string()),
            "n_keys": pa.array(d["n_keys"].to_numpy(), pa.int64())})

    # -- compaction ----------------------------------------------------------

    def compact(self) -> dict:
        """Fold every bucket's signed history into net ``+1`` postings
        in a NEW generation, swap the manifest atomically, then
        best-effort-remove the old generation. ``applied_through``
        advances to the highest window folded, so a crashed driver
        re-applying an old window is refused as a no-op."""
        import ray.data as rd

        old_gen = self._gen_dir()
        new_g = int(self.manifest["generation"]) + 1
        new_gen = os.path.join(self.root, f"gen{new_g:03d}")
        tmp_gen = new_gen + ".inprogress"
        shutil.rmtree(tmp_gen, ignore_errors=True)
        # a prior compaction that crashed AFTER its os.replace but
        # BEFORE the manifest commit leaves a complete-but-unpublished
        # new_gen; the manifest still points at old_gen (authoritative),
        # so clear the orphan or the replace below raises ENOTEMPTY
        # forever
        shutil.rmtree(new_gen, ignore_errors=True)
        os.makedirs(tmp_gen, exist_ok=True)
        max_w = int(self.manifest.get("applied_through", 0))
        work = []
        for d in sorted(os.listdir(old_gen)):
            bdir = os.path.join(old_gen, d)
            files = [f for f in sorted(os.listdir(bdir))
                     if f.endswith(".parquet")]
            for f in files:
                if f.startswith("w"):
                    max_w = max(max_w, int(f[1:].split(".")[0]))
            if files:
                work.append({"dir": d, "files": ",".join(
                    os.path.join(bdir, f) for f in files)})
        rows = 0
        if work:
            # one task per bucket — the fold never runs driver-side,
            # so per-task memory is one bucket's postings (num_buckets
            # is the knob), same contract as apply_window
            def fold_bucket(batch: pa.Table) -> pa.Table:
                import pyarrow.parquet as pq

                outs = []
                for row in batch.to_pylist():
                    t = pa.concat_tables([pq.read_table(f) for f in
                                          row["files"].split(",")])
                    df = t.to_pandas()
                    net = df.groupby(["val", "repo", "path"])["sign"].sum()
                    alive = net[net > 0].reset_index()
                    if not len(alive):
                        outs.append({"dir": row["dir"], "rows": 0})
                        continue
                    out = pa.table({
                        "val": pa.array(alive["val"].to_numpy(object),
                                        pa.string()),
                        "repo": pa.array(alive["repo"].to_numpy(object),
                                         pa.string()),
                        "path": pa.array(alive["path"].to_numpy(object),
                                         pa.string()),
                        "sign": pa.array(np.ones(len(alive),
                                                 dtype=np.int8), pa.int8()),
                    })
                    obdir = os.path.join(tmp_gen, row["dir"])
                    os.makedirs(obdir, exist_ok=True)
                    pq.write_table(out, os.path.join(obdir, "base.parquet"))
                    outs.append({"dir": row["dir"], "rows": out.num_rows})
                return pa.Table.from_pylist(outs)

            res = (rd.from_items(work)
                   .map_batches(fold_bucket, batch_size=1,
                                batch_format="pyarrow").take_all())
            rows = int(sum(r["rows"] for r in res))
        os.replace(tmp_gen, new_gen)
        self.manifest["generation"] = new_g
        self.manifest["applied_through"] = max_w
        self._commit_manifest()
        shutil.rmtree(old_gen, ignore_errors=True)
        return {"generation": new_g, "applied_through": max_w,
                "postings": rows}
