"""WAL/log tailer source: change events from an append-only Parquet log.

The production-shaped analog of the oplog tailable cursor
(``database/OplogReader.kt:51-88``): upstream producers append event
files to a log directory; the tailer reads ONLY files not yet
committed — a file-level resume offset (the source-side analog of the
``$natural``-order cursor position), layered UNDER the engine's
per-partition ``(ts, inc)`` tokens, which still filter any duplicate
rows inside a replayed file (defense in depth; at-least-once at every
layer, idempotent apply on top).

File order is lexicographic file name — producers must name files
monotonically (``{seq:012d}-*.parquet``), the standard WAL contract.

Ordering contract (same as the reference's oplog): ``(ts, inc)`` is a
UNIQUE, MONOTONE log position per partition, and each segment file is
a log prefix boundary — per partition, every event in segment N
precedes every event in segment N+1. Violating either lets the
resume-token filter (``ts' > ts``-style, ``OplogReader.kt:136``) skip
events that were never applied.
"""

from __future__ import annotations

import os

from kafka_connect_mongo_ray.utils import atomic_write_json, read_json


class WalTailer:
    """Tracks which log files are committed; serves bounded tail batches.

    State file (``wal_state.json`` in the checkpoint dir) holds the
    sorted list of committed file names — written atomically AFTER the
    engine's snapshot commit, so a crash between the two replays the
    window (idempotent)."""

    def __init__(self, log_dir: str, checkpoint_dir: str):
        self.log_dir = log_dir
        self.state_path = os.path.join(checkpoint_dir, "wal_state.json")

    def committed_files(self) -> set[str]:
        st = read_json(self.state_path, default=None)
        return set(st["files"]) if st else set()

    def pending_files(self, *, max_files: int | None = None) -> list[str]:
        done = self.committed_files()
        names = sorted(
            f for f in os.listdir(self.log_dir)
            if f.endswith(".parquet") and f not in done
        )
        return names[:max_files] if max_files else names

    def dataset(self, files: list[str]):
        import ray.data as rd

        return rd.read_parquet([os.path.join(self.log_dir, f) for f in files])

    def commit_files(self, files: list[str]) -> None:
        all_files = sorted(self.committed_files() | set(files))
        atomic_write_json(self.state_path, {"files": all_files})


def tail_wal(log_dir: str, cfg, *, max_files_per_window: int | None = None,
             max_windows: int | None = None) -> list[dict]:
    """Drain the log in bounded windows: each window is one committed
    replay over the pending files, then the file offset advances.
    Returns per-window summaries; call again later to pick up files
    appended since (the micro-batch tail loop of pipelines/stream.py).
    """
    from kafka_connect_mongo_ray.pipelines.cdc import run_replay

    tailer = WalTailer(log_dir, cfg.checkpoint_dir)
    summaries = []
    windows = 0
    while True:
        if max_windows is not None and windows >= max_windows:
            break
        pending = tailer.pending_files(max_files=max_files_per_window)
        if not pending:
            break
        summary = run_replay(tailer.dataset(pending), cfg)
        tailer.commit_files(pending)  # only after the snapshot commit
        summary["wal_files"] = pending
        summaries.append(summary)
        windows += 1
    return summaries
