"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on sf0.001: derive a deterministic change-event
    stream from the documents table and replay it through the full CDC
    engine (normalize → bucket shuffle → LWW merge-apply)."""
    from kafka_connect_mongo_ray.pipelines.queries import q_cdc_final_state

    return q_cdc_final_state("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from kafka_connect_mongo_ray.pipelines.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from kafka_connect_mongo_ray.pipelines.queries import build_oracle_sql

    return build_oracle_sql()
