"""Topic / table naming rules (SURVEY.md §2.8 scalar inventory).

- ``get_topic``: ``source/StructUtil.kt:13-16`` — oplog namespace
  ``"db.collection"`` → ``"{prefix}_{db}_{collection}"`` (the ``.``→
  ``_`` replacement of ``StructUtil.kt:14``).
- ``analyzed_table_name``: ``SchemaMapper.kt:108-114`` — the analyzed
  -mode table template with its special-cased default database
  (``"teambition"`` in the reference): default db → ``base_{table}``,
  any other → ``base_{db}_{table}``.

In this engine these map output paths: a change stream for namespace
``db.collection`` lands its snapshot under
``{snapshot_root}/{get_topic(ns, prefix)}/``.
"""

from __future__ import annotations


def get_topic(namespace: str, prefix: str) -> str:
    """``"db.collection"`` → ``"{prefix}_{db}_{collection}"``."""
    return f"{prefix}_{namespace.replace('.', '_')}"


def analyzed_table_name(db: str, collection: str, *, default_db: str = "teambition",
                        base: str = "base") -> str:
    if db == default_db:
        return f"{base}_{collection}"
    return f"{base}_{db}_{collection}"


def namespace_of(db: str, collection: str) -> str:
    return f"{db}.{collection}"
