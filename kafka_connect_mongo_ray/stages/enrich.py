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
    """Broadcast variant — ONLY for lookup sides that genuinely fit in
    one worker's heap (a dimension table, not the corpus). The scale
    path is :func:`enrich_updates_join`."""
    import ray

    lookup_ref = ray.put(build_lookup(base_table, list(key_cols), list(image_cols)))
    return events_ds.map_batches(
        UpdateEnricher,
        fn_constructor_kwargs={"lookup_ref": lookup_ref, "key_cols": key_cols,
                               "image_cols": image_cols},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def _needs_image(batch: pa.Table, image_probe: str):
    return pc.and_(pc.equal(batch["op"], "u"), pc.is_null(batch[image_probe]))


def enrich_updates_join(events_ds, base_ds, *, key_cols=("repo", "path"),
                        image_cols=("commit", "lang", "content"),
                        num_buckets: int = 32):
    """Scale path for S3 enrichment: the base side stays a Dataset —
    nothing corpus-sized ever touches the driver. Image-less update
    events inner-hash-join the base on the key (miss ⇒ drop, the
    reference's deleted-before-lookup semantics, ``OplogReader.kt:102``)
    and take the base's image columns; everything else passes through
    untouched and never shuffles. The events source is read twice (one
    filtered branch each way) — cheap column-pruned scans — in exchange
    for shuffling only the image-less slice, which is the right trade at
    100 TB where updates needing enrichment are a small fraction of the
    stream."""
    from kafka_connect_mongo_ray.stages.join import hash_join

    key_cols, image_cols = list(key_cols), list(image_cols)
    out_names = list(events_ds.schema().names)
    probe = image_cols[-1]

    def keep_passthrough(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(_needs_image(t, probe)))

    def keep_todo(t: pa.Table) -> pa.Table:
        # drop the (null/stale) image columns; the join supplies them
        return t.filter(_needs_image(t, probe)).drop_columns(image_cols)

    passthrough = events_ds.map_batches(keep_passthrough, batch_format="pyarrow")
    todo = events_ds.map_batches(keep_todo, batch_format="pyarrow")
    joined = hash_join(todo, base_ds.select_columns(key_cols + image_cols),
                       on=key_cols, num_buckets=num_buckets, how="inner")
    enriched = joined.map_batches(lambda t: t.select(out_names),
                                  batch_format="pyarrow")
    return passthrough.union(enriched)
