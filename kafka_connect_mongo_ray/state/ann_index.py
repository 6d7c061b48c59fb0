"""Persisted IVF index for similarity search — the disk-backed scale
path of ``functions/similarity.py::ivf_topk``, shaped like the
persisted dedup index (``state/dedup_index.py``): the corpus is
coarse-quantized ONCE into cell-partitioned Parquet directories, and
every later query batch opens ONLY its ``nprobe`` probed cells'
directories — the index never moves through the object store, no
matter how large the corpus grows, and queries touch
~``nprobe/num_cells`` of it.

(Reference analog: none — the reference ships records without vector
search; this is part of the training-data-pipeline surface the
engine adds on top of SURVEY.md §2.)

Shapes, at any scale:
- BUILD is one assign pass (nearest-centroid per row, centroids fitted
  driver-side on a bounded deterministic sample and broadcast via
  ``ray.put``) streaming straight into hive-partitioned
  ``cells/ivf_cell=N/`` Parquet. ``num_cells`` is the knob that keeps
  one cell's directory worker-sized (the snapshot-bucket contract).
- the manifest (centroids + metadata) is written LAST as the commit
  marker: a crashed build leaves no manifest and readers refuse it;
  re-running the build overwrites cleanly.
- QUERY reads only the probed cells' directories (directory-level
  pruning, the zone-map rule applied to vector space) and scores each
  batch with one numpy matmul against the queries probing that cell;
  the global reduce sees ≤ queries × nprobe × k candidate rows.
- ``nprobe = num_cells`` degrades to EXACT brute force (pinned by
  test); recall at lower nprobe follows the usual IVF curve.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa

from kafka_connect_mongo_ray.utils import embedding_matrix, limit_worker_threads

__all__ = ["build_ivf_index", "append_ivf_index", "compact_ivf_index",
           "ivf_index_topk"]

_MANIFEST = "manifest.json"
_CENTROIDS = "centroids.npy"


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def build_ivf_index(ds, index_dir: str, *, num_cells: int = 16,
                    sample_size: int = 2000, seed: int = 42,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    total_rows: int | None = None,
                    tag: str | None = None) -> dict:
    """Build (or rebuild) the persisted IVF index from an embedding
    Dataset. Overwrites ``index_dir``; the manifest lands last, so a
    crash mid-build leaves a directory readers refuse (no manifest)
    and a re-run starts clean. Returns the manifest dict.

    ``tag`` names the ingest this build came from (e.g. a curation
    window); it is recorded in the manifest so tagged appends can be
    replayed idempotently (see :func:`append_ivf_index`)."""
    import ray

    from kafka_connect_mongo_ray.functions.similarity import (
        IvfAssigner,
        _deterministic_sample,
        kmeans_centroids,
    )

    sample_tbl = _deterministic_sample(ds, id_col=id_col,
                                       sample_size=sample_size,
                                       total_rows=total_rows)
    sample = embedding_matrix(sample_tbl[vec_col])
    centroids = kmeans_centroids(sample, num_cells, seed=seed)
    cref = ray.put(centroids)

    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)

    def with_cell_copy(batch: pa.Table) -> pa.Table:
        # hive partitioning drops the partition column from the data
        # files; `cell` stays INSIDE the file so query batches know
        # which queries probe them without trusting path inference
        return batch.append_column("cell", batch["ivf_cell"])

    assigned = ds.map_batches(
        IvfAssigner,
        fn_constructor_kwargs={"centroids_ref": cref, "vec_col": vec_col},
        batch_format="pyarrow", concurrency=(1, 8),
    ).map_batches(with_cell_copy, batch_format="pyarrow")
    assigned.write_parquet(os.path.join(index_dir, "cells"),
                           partition_cols=["ivf_cell"])

    np.save(os.path.join(index_dir, _CENTROIDS), centroids)
    rows = total_rows if total_rows is not None else ds.count()
    manifest = {"num_cells": int(num_cells), "dim": int(centroids.shape[1]),
                "rows": int(rows), "id_col": id_col, "vec_col": vec_col,
                "seed": int(seed), "format": 1}
    if tag is not None:
        manifest["tags"] = [tag]
    tmp = os.path.join(index_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(index_dir, _MANIFEST))
    return manifest


def append_ivf_index(ds, index_dir: str, *, vec_col: str | None = None,
                     total_rows: int | None = None,
                     tag: str | None = None) -> dict:
    """Incrementally ADD vectors to a committed IVF index without a
    rebuild — the streaming-ingest complement of :func:`build_ivf_index`
    (same contract as the persisted dedup index's window appends).

    New vectors are assigned to the EXISTING centroids (no re-fit: cell
    routing stays stable so earlier data never moves) and land in a
    fresh generation directory ``cells_g{N}/ivf_cell=.../``; the
    manifest update is the COMMIT MARKER (rows += n, generations = N,
    atomic rename). A crash mid-append leaves an uncommitted
    generation directory that readers ignore (not in the manifest) and
    the next append overwrites. Queries read the base ``cells`` plus
    every committed generation — still only the probed cells'
    directories of each.

    Centroid drift is the documented trade-off: heavy appends that
    shift the distribution should trigger a periodic rebuild (the
    compaction analog); recall on appended data follows the original
    centroids' coverage.

    ``tag`` makes the append IDEMPOTENT per source: a tag already in
    the manifest's committed ``tags`` list returns without writing
    (streaming-curation recovery can replay a window's append safely);
    an untagged append always writes a new generation."""
    import ray

    from kafka_connect_mongo_ray.functions.similarity import IvfAssigner

    mpath = os.path.join(index_dir, _MANIFEST)
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"no committed IVF index at {index_dir} (manifest missing) — "
            f"build before appending")
    with open(mpath) as f:
        manifest = json.load(f)
    if tag is not None and tag in manifest.get("tags", []):
        return manifest  # this source already committed — idempotent
    centroids = np.load(os.path.join(index_dir, _CENTROIDS))
    cref = ray.put(centroids)
    vec_col = vec_col or manifest["vec_col"]

    gen = int(manifest.get("generations", 0)) + 1
    gen_dir = os.path.join(index_dir, f"cells_g{gen}")
    shutil.rmtree(gen_dir, ignore_errors=True)  # uncommitted leftovers

    def with_cell_copy(batch: pa.Table) -> pa.Table:
        return batch.append_column("cell", batch["ivf_cell"])

    assigned = ds.map_batches(
        IvfAssigner,
        fn_constructor_kwargs={"centroids_ref": cref, "vec_col": vec_col},
        batch_format="pyarrow", concurrency=(1, 8),
    ).map_batches(with_cell_copy, batch_format="pyarrow")
    assigned.write_parquet(gen_dir, partition_cols=["ivf_cell"])

    n_new = total_rows if total_rows is not None else ds.count()
    manifest["rows"] = int(manifest["rows"]) + int(n_new)
    manifest["generations"] = gen
    if tag is not None:
        manifest["tags"] = manifest.get("tags", []) + [tag]
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mpath)
    return manifest


def _cell_roots(index_dir: str, manifest: dict) -> list[str]:
    """Base build dir + every COMMITTED append generation. The base
    name is manifest-recorded so compaction can swap it atomically."""
    return [os.path.join(index_dir, manifest.get("base", "cells"))] + [
        os.path.join(index_dir, f"cells_g{g}")
        for g in range(1, int(manifest.get("generations", 0)) + 1)]


def compact_ivf_index(index_dir: str) -> dict:
    """Fold every committed append generation back into ONE base cell
    set — the index's compaction analog (read amplification grows with
    generations: a probed cell opens one directory per generation).
    Cell assignment is untouched (centroids unchanged — compaction
    merges files, a REBUILD re-fits), so the merged index answers
    queries identically.

    Commit contract: the merged cells land in a fresh versioned base
    directory (``cells_v{N}``); the manifest update — base pointer,
    ``generations`` reset — is the single atomic commit point, and
    old directories are removed afterwards best-effort (a crash
    leaves unreferenced leftovers readers never open and the next
    compaction clears). No-op when there are no generations."""
    import ray.data as rd

    mpath = os.path.join(index_dir, _MANIFEST)
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"no committed IVF index at {index_dir} (manifest missing)")
    with open(mpath) as f:
        manifest = json.load(f)
    if int(manifest.get("generations", 0)) == 0:
        return {**manifest, "compacted": False}

    old_roots = _cell_roots(index_dir, manifest)
    files = [os.path.join(d, f)
             for root in old_roots if os.path.isdir(root)
             for c in sorted(os.listdir(root))
             if os.path.isdir(d := os.path.join(root, c))
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    base_version = int(manifest.get("base_version", 1)) + 1
    new_base = os.path.join(index_dir, f"cells_v{base_version}")
    shutil.rmtree(new_base, ignore_errors=True)  # crashed prior attempt

    # `cell` is stored inside the files (hive drops the partition col);
    # re-derive the partition column from it. Explicit columns= keeps
    # Ray's hive path inference from surfacing `ivf_cell=` as a
    # redundant STRING column (the repo's standing read_parquet rule).
    (rd.read_parquet(files, columns=[manifest["id_col"],
                                     manifest["vec_col"], "cell"])
     .map_batches(lambda t: t.append_column("ivf_cell", t["cell"]),
                  batch_format="pyarrow")
     .write_parquet(new_base, partition_cols=["ivf_cell"]))

    manifest["base"] = f"cells_v{base_version}"
    manifest["base_version"] = base_version
    manifest["generations"] = 0
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mpath)  # the commit point
    for root in old_roots:
        shutil.rmtree(root, ignore_errors=True)
    return {**manifest, "compacted": True}


class _CellScorer:
    """Actor-pool scorer: queries + the cell→query routing table are
    broadcast once and fetched in ``__init__``; each batch (rows of
    one or a few cells) is scored with one matmul per distinct cell
    and emits its batch-local top-k candidate rows."""

    def __init__(self, refs, *, k: int, id_col: str, vec_col: str):
        import ray

        self.q, self.query_ids, self.cell_to_queries = ray.get(refs)
        self.k, self.id_col, self.vec_col = k, id_col, vec_col

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        limit_worker_threads()
        cells = np.asarray(batch["cell"], dtype=np.int64)
        vecs = _normalize(embedding_matrix(batch[self.vec_col]))
        ids = np.asarray(batch[self.id_col])
        frames = []
        for cell in np.unique(cells):
            qidx = self.cell_to_queries.get(int(cell))
            if not qidx:
                continue
            m = cells == cell
            sims = self.q[qidx] @ vecs[m].T
            sub_ids = ids[m]
            kk = min(self.k, sims.shape[1])
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = []
            for row_i, qi in enumerate(qidx):
                for j in top[row_i]:
                    rows.append((int(self.query_ids[qi]), int(sub_ids[j]),
                                 float(sims[row_i, j])))
            frames.append(pd.DataFrame(
                rows, columns=["query_id", "neighbor_id", "cosine"]))
        if not frames:
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "neighbor_id": pd.Series([], dtype=np.int64),
                                 "cosine": pd.Series([], dtype=np.float64)})
        return pd.concat(frames, ignore_index=True)


def ivf_index_topk(index_dir: str, query_matrix: np.ndarray,
                   query_ids: np.ndarray, *, k: int,
                   nprobe: int = 2) -> pd.DataFrame:
    """Approximate top-k against the PERSISTED index: load the tiny
    centroid matrix, route each query to its ``nprobe`` nearest cells,
    and read ONLY those cells' directories. Returns
    (query_id, rank, neighbor_id) with the brute-force tie-break
    (descending cosine, then ascending neighbor id)."""
    import ray
    import ray.data as rd

    mpath = os.path.join(index_dir, _MANIFEST)
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"no committed IVF index at {index_dir} (manifest missing — "
            f"crashed or absent build)")
    with open(mpath) as f:
        manifest = json.load(f)
    centroids = np.load(os.path.join(index_dir, _CENTROIDS))

    q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    nprobe = min(nprobe, manifest["num_cells"])
    q_cells = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]
    cell_to_queries: dict[int, list[int]] = {}
    for qi, cells in enumerate(q_cells):
        for c in cells:
            cell_to_queries.setdefault(int(c), []).append(qi)

    # directory-level pruning: ONLY probed cells' files are listed/read
    # (across the base build and every committed append generation)
    dirs = [d for root in _cell_roots(index_dir, manifest)
            for c in sorted(cell_to_queries)
            if os.path.isdir(d := os.path.join(root, f"ivf_cell={c}"))]
    if not dirs:
        return pd.DataFrame(columns=["query_id", "rank", "neighbor_id"])
    files = [os.path.join(d, f) for d in dirs
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    refs = ray.put((q, np.asarray(query_ids), cell_to_queries))
    cand = (rd.read_parquet(files,
                            columns=[manifest["id_col"],
                                     manifest["vec_col"], "cell"])
            .map_batches(_CellScorer,
                         fn_constructor_kwargs={
                             "refs": refs, "k": k,
                             "id_col": manifest["id_col"],
                             "vec_col": manifest["vec_col"]},
                         batch_format="pyarrow", concurrency=(1, 8))
            .to_pandas())
    cand = cand.sort_values(["query_id", "cosine", "neighbor_id"],
                            ascending=[True, False, True], kind="mergesort")
    out = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out[["query_id", "rank", "neighbor_id"]]
