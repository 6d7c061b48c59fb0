"""Point-lookup enrichment join (S3, SURVEY.md §2.4).

The reference's only join: for ``op="u"`` oplog entries, fetch the
CURRENT full document by ``o2._id`` from the source collection and
substitute it as the row image; if the document no longer exists the
event is dropped (``OplogReader.kt:99-125``, drop at ``:102``).

Ray-Data-first mapping: the lookup side is broadcast once with
``ray.put`` (a dict keyed by the primary key) and fetched in the actor
``__init__`` — an equality lookup needs no shuffle when one side fits
in memory. For larger lookup sides use ``stages.join.hash_join``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from kafka_connect_mongo_ray.utils import key_strings, limit_worker_threads


def build_lookup(table: pa.Table, key_cols: list[str], image_cols: list[str]) -> dict:
    """{key-string: (image values…)} for broadcasting via ``ray.put``."""
    keys = np.asarray(key_strings(table, key_cols)).astype(object)
    images = [np.asarray(table[c]).astype(object) for c in image_cols]
    return dict(zip(keys, zip(*images)))


class UpdateEnricher:
    """Actor-pool stage: substitute the full row image for image-less
    update events; drop updates whose key is absent from the lookup
    (the reference's deleted-before-lookup case).

    Inserts/deletes pass through untouched — their image (or tombstone)
    is already authoritative.
    """

    def __init__(self, lookup_ref, key_cols=("repo", "path"),
                 image_cols=("commit", "lang", "content")):
        import ray

        self.lookup = ray.get(lookup_ref)
        self.key_cols = list(key_cols)
        self.image_cols = list(image_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        limit_worker_threads()
        is_u = pc.equal(batch["op"], "u")
        needs = pc.and_(is_u, pc.is_null(batch["content"]))
        if not pc.any(needs).as_py():
            return batch
        passthrough = batch.filter(pc.invert(needs))
        todo = batch.filter(needs)
        keys = pd.Series(np.asarray(key_strings(todo, self.key_cols)).astype(object))
        hits = keys.map(self.lookup)  # NaN for misses ⇒ dropped
        found = hits.notna().to_numpy()
        todo = todo.filter(pa.array(found))
        images = list(hits[found])
        cols = {}
        for j, col in enumerate(self.image_cols):
            vals = np.array([img[j] for img in images], dtype=object)
            typ = todo.schema.field(col).type
            cols[col] = pa.array(vals, typ)
        for col, arr in cols.items():
            todo = todo.set_column(todo.schema.get_field_index(col), col, arr)
        return pa.concat_tables([passthrough, todo])


def enrich_updates(events_ds, base_table: pa.Table, *,
                   key_cols=("repo", "path"), image_cols=("commit", "lang", "content"),
                   concurrency=(1, 8)):
    import ray

    lookup_ref = ray.put(build_lookup(base_table, list(key_cols), list(image_cols)))
    return events_ds.map_batches(
        UpdateEnricher,
        fn_constructor_kwargs={"lookup_ref": lookup_ref, "key_cols": key_cols,
                               "image_cols": image_cols},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
