"""functions/packing.py::pack_sequences — layout invariants and parity
with a single-process reference packer."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs(seed: int, n: int = 160):
    rng = np.random.default_rng(seed)
    texts = [" ".join(["w"] * rng.integers(1, 120)) for _ in range(n)]
    ids = rng.permutation(n).astype(np.int64)  # unordered input on purpose
    return pd.DataFrame({"doc_id": ids, "text": [texts[i] for i in ids]})


@pytest.mark.parametrize("seed,seq_len,buckets", [(0, 64, 4), (3, 200, 1)])
def test_pack_sequences_matches_reference(seed, seq_len, buckets):
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.packing import pack_sequences

    df = _docs(seed)
    out = pack_sequences(rd.from_pandas(df).repartition(5),
                         seq_len=seq_len, num_buckets=buckets).to_pandas()
    assert len(out) == len(df)

    # reference: per bucket, docs ordered by id, running prefix sum
    ref = df.copy()
    ref["n_tokens"] = ref["text"].str.split(" ").str.len()
    ref["bucket"] = ref["doc_id"] % buckets
    got = out.set_index("doc_id")
    for b, sub in ref.sort_values("doc_id").groupby("bucket"):
        start = 0
        for _, row in sub.iterrows():
            g = got.loc[row["doc_id"]]
            assert g["bucket"] == b
            assert g["seq_id"] == start // seq_len
            assert g["offset"] == start % seq_len
            assert g["n_tokens"] == row["n_tokens"]
            start += row["n_tokens"]

    # invariants: offsets within capacity; total tokens preserved
    assert (out["offset"] < seq_len).all() and (out["offset"] >= 0).all()
    assert out["n_tokens"].sum() == ref["n_tokens"].sum()
