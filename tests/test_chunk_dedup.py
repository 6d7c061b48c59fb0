"""Chunk-level dedup invariants the value-oracle cannot express:
first-wins ordering and conservation between explode and reassembly.
(The oracle gate in test_queries_oracle.py value-checks the full
output against SQL at sf0.001; these pin the SEMANTICS.)
"""

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_chunk_dedup_first_doc_survives_whole_and_counts_conserve(
        ray_session):
    import duckdb

    from kafka_connect_mongo_ray.pipelines.queries import q_docs_chunk_dedup

    out = q_docs_chunk_dedup(SF).to_pandas()

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    first = con.sql(
        "SELECT text FROM documents ORDER BY doc_id LIMIT 1").fetchone()[0]

    # the minimal doc_id owns the minimal composite for every chunk it
    # contains, so it must survive verbatim
    row0 = out.loc[out["doc_id"] == out["doc_id"].min()].iloc[0]
    assert row0["text_dedup"] == first
    assert int(row0["n_kept"]) == int(row0["n_chunks"])

    # conservation: kept chunks across the corpus == distinct chunks,
    # and no doc keeps more than it exploded
    n_distinct = con.sql("""
        WITH w AS (SELECT doc_id,
                          unnest(string_split(text,' ')) AS word,
                          generate_subscripts(string_split(text,' '),1) AS wi
                   FROM documents),
             c AS (SELECT doc_id, (wi-1)//10 AS pidx,
                          string_agg(word,' ' ORDER BY wi) AS chunk
                   FROM w GROUP BY 1,2)
        SELECT COUNT(DISTINCT chunk) FROM c""").fetchone()[0]
    assert int(out["n_kept"].sum()) == int(n_distinct)
    assert (out["n_kept"] <= out["n_chunks"]).all()
    assert (out["n_kept"] >= 1).all()

    # reassembled text is exactly the kept chunks joined in order
    words = out["text_dedup"].str.split(" ").str.len()
    assert (words <= out["n_kept"] * 10).all()
