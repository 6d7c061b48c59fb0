"""Incremental view maintenance (IVM): keep a per-group aggregate of
the live table current by folding each change-feed window's DELTAS
into a persisted dimension-sized state — never rescanning the table.

Reference analog: the sink side applies row upserts
(`sink/MongoSinkTask.kt` semantics); a warehouse sink additionally
maintains the aggregates downstream dashboards read. This module is
that operator, built on the COW snapshot diff (`state/diff.py`):

- retraction logic is NULL-driven, not op-driven: a key's live-ness
  before/after is ``content_old is not null`` / ``content is not
  null``, which handles every edge the op string can blur (tombstone →
  tombstone re-delete contributes (0, 0); tombstone → live 'u' is a
  net insert; live → tombstone a net retract);
- per-window work: the feed's changed buckets only (COW skips the
  rest byte-free), batch-local partials collapse rows to
  groups-present-per-block (dn, dm) pairs, ONE group-domain-sized
  groupby-sum per window, then a tiny state merge;
- the maintained invariant (asserted in tests and the gate oracle):
  state == full GROUP BY recompute over the live rows of the latest
  version, at every window boundary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kafka_connect_mongo_ray.state.diff import changes_between

__all__ = ["window_aggregate_deltas", "maintain_group_aggregate",
           "IvmState", "METRIC_CHARS", "METRIC_TOKENS"]


def METRIC_CHARS(content: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Character count of the content column (NULL → 0)."""
    return pc.fill_null(pc.utf8_length(content), 0)


def METRIC_TOKENS(content: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace-token count (runs of \\S+, NULL → 0) — the
    training-data token budget; SQL mirror:
    ``len(regexp_extract_all(content, '\\S+'))``."""
    return pc.fill_null(pc.count_substring_regex(content, r"\S+"), 0)


# default metric set: (name → fn(content Arrow array) -> int64-castable
# Arrow array). Only SUM-decomposable metrics can be maintained
# incrementally (a retraction subtracts the pre-image's value); MIN/MAX
# would need a per-group rescan on retraction and are out of scope by
# design.
DEFAULT_METRICS = {"total_chars": METRIC_CHARS}


def _state_schema(metrics) -> pa.Schema:
    return pa.schema([pa.field("repo", pa.string()),
                      pa.field("n_live", pa.int64())]
                     + [pa.field(m, pa.int64()) for m in metrics])


STATE_SCHEMA = _state_schema(DEFAULT_METRICS)


def window_aggregate_deltas(snapshot_dir: str, v_old: int, v_new: int,
                            num_partitions: int = 8,
                            metrics: dict | None = None):
    """Per-group (dn_live, d_metric…) deltas for one version window:
    read the feed with pre-images, reduce batch-locally to
    groups-present partials, one tiny groupby-sum. Returns a Dataset
    (repo, n_live, <metric>…) of SIGNED deltas."""
    from ray.data.aggregate import Sum

    metrics = DEFAULT_METRICS if metrics is None else metrics
    feed = changes_between(snapshot_dir, v_old, v_new, include_old=True)

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        new_live = pc.is_valid(batch["content"]).to_numpy(zero_copy_only=False)
        old_live = pc.is_valid(batch["content_old"]).to_numpy(
            zero_copy_only=False)
        cols = {
            "repo": np.asarray(batch["repo"]).astype(object),
            "dn": new_live.astype(np.int64) - old_live.astype(np.int64),
        }
        for name, fn in metrics.items():
            m_new = np.asarray(pc.cast(fn(batch["content"]), pa.int64()))
            m_old = np.asarray(pc.cast(fn(batch["content_old"]), pa.int64()))
            cols[name] = (np.where(new_live, m_new, 0)
                          - np.where(old_live, m_old, 0))
        g = pd.DataFrame(cols).groupby("repo", as_index=False).sum()
        out = {"repo": pa.array(g["repo"].to_numpy(), pa.string()),
               "n_live": pa.array(g["dn"].to_numpy(), pa.int64())}
        for name in metrics:
            out[name] = pa.array(g[name].to_numpy(), pa.int64())
        return pa.table(out)

    return (feed.map_batches(partial, batch_format="pyarrow")
            .groupby("repo", num_partitions=num_partitions)
            .aggregate(Sum("n_live", alias_name="n_live"),
                       *[Sum(m, alias_name=m) for m in metrics]))


def maintain_group_aggregate(snapshot_dir: str, versions: list[int], *,
                             num_partitions: int = 8,
                             drop_empty: bool = True,
                             metrics: dict | None = None):
    """Fold the change feeds of consecutive ``versions`` (e.g.
    ``[0, 1, 2]`` → windows 0→1, 1→2) into the per-repo live
    aggregate. Version 0 is the empty table, so starting from 0 builds
    the state from nothing exactly as a streaming consumer would.

    Every delta table is group-domain-sized, so the cross-window merge
    is a union of tiny tables + one final groupby-sum; groups whose
    live count reaches zero are dropped (``drop_empty``) to mirror a
    GROUP BY over the live rows. Returns a Dataset
    (repo, n_live, total_chars)."""
    from ray.data.aggregate import Sum

    metrics = DEFAULT_METRICS if metrics is None else metrics
    deltas = [window_aggregate_deltas(snapshot_dir, a, b,
                                      num_partitions=num_partitions,
                                      metrics=metrics)
              for a, b in zip(versions, versions[1:])]
    if not deltas:
        import ray.data as rd

        return rd.from_arrow(_state_schema(metrics).empty_table())
    merged = deltas[0].union(*deltas[1:]) if len(deltas) > 1 else deltas[0]
    state = (merged.groupby("repo", num_partitions=num_partitions)
             .aggregate(Sum("n_live", alias_name="n_live"),
                        *[Sum(m, alias_name=m) for m in metrics]))
    if drop_empty:
        state = state.map_batches(
            lambda t: t.filter(pc.greater(t["n_live"], 0)),
            batch_format="pyarrow")

    def conform(t: pa.Table) -> pa.Table:
        cols = {"repo": pc.cast(t["repo"], pa.string()),
                "n_live": pc.cast(t["n_live"], pa.int64())}
        for m in metrics:
            cols[m] = pc.cast(t[m], pa.int64())
        return pa.table(cols)

    return state.map_batches(conform, batch_format="pyarrow")


class IvmState:
    """Persisted, crash-safe IVM state: one directory per applied
    snapshot version, committed atomically (write to ``.tmp-`` then
    ``os.replace`` — the repo's commit primitive), so the current
    state is simply the highest COMPLETE version dir and a re-fold of
    an already-applied window is a detected no-op (idempotent under
    at-least-once drivers). A crashed attempt leaves only a
    ``.tmp-*`` orphan that recovery ignores and the next attempt
    clears.

    The state table is group-domain-sized by contract (repos), so one
    parquet file per version; a key-domain-sized state would bucket
    the directory exactly like ``state/dedup_index.py``."""

    def __init__(self, state_dir: str, metrics: dict | None = None):
        import os

        self.root = state_dir
        self.metrics = DEFAULT_METRICS if metrics is None else metrics
        os.makedirs(state_dir, exist_ok=True)

    def _vdirs(self):
        import os

        out = {}
        for d in os.listdir(self.root):
            if d.startswith("v") and not d.startswith(".") \
                    and os.path.isdir(os.path.join(self.root, d)):
                try:
                    out[int(d[1:])] = os.path.join(self.root, d)
                except ValueError:
                    continue
        return out

    def current_version(self) -> int:
        vs = self._vdirs()
        return max(vs) if vs else 0

    def read(self, version: int | None = None) -> pa.Table:
        import os

        import pyarrow.parquet as pq

        v = self.current_version() if version is None else version
        if v == 0:
            return _state_schema(self.metrics).empty_table()
        return pq.read_table(os.path.join(self._vdirs()[v], "state.parquet"))

    def fold_window(self, snapshot_dir: str, v_new: int, *,
                    num_partitions: int = 8) -> dict:
        """Fold the (current_version → v_new) change feed into the
        state and commit it as version ``v_new``. Returns a summary
        dict; if ``v_new`` is already applied this is a no-op (the
        idempotence contract). Windows must be applied in order."""
        import os
        import shutil
        import tempfile

        import pyarrow.parquet as pq

        v_old = self.current_version()
        if v_new in self._vdirs():
            return {"version": v_new, "applied": False,
                    "reason": "already-folded"}
        if v_new <= v_old:
            raise ValueError(f"window v{v_new} precedes current state "
                             f"v{v_old}")
        delta = window_aggregate_deltas(snapshot_dir, v_old, v_new,
                                        num_partitions=num_partitions,
                                        metrics=self.metrics)
        # merge with the (tiny) current state driver-side: both tables
        # are group-domain-sized by contract
        import pandas as pd

        cur = self.read(v_old).to_pandas()
        want_cols = ["repo", "n_live", *self.metrics]
        if list(cur.columns) != want_cols:
            # a silent concat would NaN-fill the difference and sum it
            # as 0 — wrong totals presented as the full aggregate
            raise ValueError(
                f"persisted IVM state columns {list(cur.columns)} do not "
                f"match configured metrics {want_cols}; open the state "
                f"with the metric set it was built with")
        dl = delta.to_pandas()
        merged = (pd.concat([cur, dl], ignore_index=True)
                  .groupby("repo", as_index=False).sum())
        merged = merged[merged.n_live > 0].sort_values("repo")
        cols = {"repo": pa.array(merged["repo"].to_numpy(dtype=object),
                                 pa.string())}
        for c in ["n_live", *self.metrics]:
            cols[c] = pa.array(merged[c].to_numpy(np.int64), pa.int64())
        out = pa.table(cols)
        tmp = tempfile.mkdtemp(dir=self.root, prefix=".tmp-")
        try:
            pq.write_table(out, os.path.join(tmp, "state.parquet"))
            try:
                os.replace(tmp, os.path.join(self.root, f"v{v_new}"))
            except OSError:
                # a concurrent at-least-once driver committed v_new
                # between our check and the rename (os.replace cannot
                # overwrite a non-empty dir) — both folds computed the
                # same deterministic state, so losing the race IS the
                # idempotent no-op
                if v_new in self._vdirs():
                    return {"version": v_new, "applied": False,
                            "reason": "lost-commit-race"}
                raise
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return {"version": v_new, "applied": True, "groups": out.num_rows}

    def gc(self, keep_last: int = 1) -> list[int]:
        """Drop all but the newest ``keep_last`` state versions and any
        crashed ``.tmp-*`` orphans."""
        import os
        import shutil

        vs = self._vdirs()
        drop = sorted(vs)[:-keep_last] if keep_last else sorted(vs)
        for v in drop:
            shutil.rmtree(vs[v], ignore_errors=True)
        for d in os.listdir(self.root):
            if d.startswith(".tmp-"):
                shutil.rmtree(os.path.join(self.root, d),
                              ignore_errors=True)
        return drop


def METRIC_CHARS_SQ(content: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Squared character count (NULL → 0) — the second-moment partial
    that makes MEAN and VARIANCE incrementally maintainable: both are
    derived at READ time from the SUM-decomposable (n, Σx, Σx²) state,
    so retractions stay subtraction-only (unlike MIN/MAX, which are
    documented out of scope). Caller owns the int64 bound:
    ``max_chars² · group_rows`` must stay inside int64 (10⁴-char docs
    hold to ~10¹⁰ rows per group)."""
    c = pc.cast(pc.fill_null(pc.utf8_length(content), 0), pa.int64())
    return pc.multiply(c, c)


MOMENT_METRICS = {"sum_chars": METRIC_CHARS, "sumsq_chars": METRIC_CHARS_SQ}


def derive_moments(state: pa.Table, *, n_col: str = "n_live",
                   sum_col: str = "sum_chars",
                   sumsq_col: str = "sumsq_chars",
                   mean_col: str = "mean_chars",
                   var_col: str = "var_chars",
                   round_to: int = 9) -> pa.Table:
    """Read-side view over a maintained (n, Σx, Σx²) state: population
    mean and variance per group, computed as ``m = s1/n`` and
    ``s2/n − m·m`` on exact int64 sums (the single-division /
    operand-order discipline — the SQL mirror parenthesizes
    identically). Batch-local and group-domain-sized; the maintained
    sums are exact, so the derived stats match a full recompute
    bit-for-bit."""
    n = np.asarray(state[n_col], dtype=np.int64).astype(np.float64)
    s1 = np.asarray(state[sum_col], dtype=np.int64).astype(np.float64)
    s2 = np.asarray(state[sumsq_col], dtype=np.int64).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        m = s1 / n
        v = s2 / n - m * m
    return pa.table({
        "repo": state["repo"],
        n_col: state[n_col],
        mean_col: pc.round(pa.array(m, pa.float64()), round_to,
                           round_mode="half_towards_infinity"),
        var_col: pc.round(pa.array(v, pa.float64()), round_to,
                          round_mode="half_towards_infinity"),
    })
