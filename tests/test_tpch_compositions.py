"""The TPC-H-shaped composition family's non-oracle invariants.

The oracle gate (test_queries_oracle.py) already value-checks every
query at sf0.001; this file pins the paths the gate data cannot reach:
the Q5 supplier-side JOIN fallback (the gate's supplier table is far
below the broadcast threshold, so the bucketed third join would
otherwise never execute).
"""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_q5_supplier_join_fallback_matches_broadcast(ray_session,
                                                     monkeypatch):
    from kafka_connect_mongo_ray.pipelines import queries as q

    broadcast = _canon(q.q_tpch_regional_revenue(SF).to_pandas())
    # the middle plan: bucketed fact joins with the supplier side
    # still broadcast (force_bucketed skips only the broadcast-state
    # fast path, the supplier guard stays satisfied)
    mid = _canon(q.q_tpch_regional_revenue(
        SF, force_bucketed=True).to_pandas())
    pd.testing.assert_frame_equal(broadcast, mid)
    # force the size guard over the edge: the supplier side must run
    # as the third bucketed join and produce the identical result
    monkeypatch.setattr(q, "_SUPP_BROADCAST_MAX_ROWS", 0)
    joined = _canon(q.q_tpch_regional_revenue(SF).to_pandas())
    pd.testing.assert_frame_equal(broadcast, joined)
    assert len(joined) > 0


@pytest.mark.parametrize("qname", ["q_tpch_market_share",
                                   "q_tpch_product_profit",
                                   "q_tpch_dominant_suppliers"])
def test_q8_q9_join_fallbacks_match_broadcast(ray_session, monkeypatch,
                                              qname):
    """Q8/Q9 shapes broadcast part AND supplier under the size guard;
    forcing the guard to zero exercises the bucketed semi/inner join
    fallbacks, which must produce the identical result."""
    from kafka_connect_mongo_ray.pipelines import queries as q

    fn = getattr(q, qname)
    broadcast = _canon(fn(SF).to_pandas())
    monkeypatch.setattr(q, "_SUPP_BROADCAST_MAX_ROWS", 0)
    joined = _canon(fn(SF).to_pandas())
    pd.testing.assert_frame_equal(broadcast, joined)
    assert len(joined) > 0


def test_q2_join_fallback_matches_broadcast(ray_session, monkeypatch):
    from kafka_connect_mongo_ray.pipelines import queries as q

    broadcast = _canon(q.q_tpch_min_cost_supplier(SF).to_pandas())
    monkeypatch.setattr(q, "_SUPP_BROADCAST_MAX_ROWS", 0)
    got = q.q_tpch_min_cost_supplier(SF)
    joined = _canon(got.to_pandas() if hasattr(got, "to_pandas") else got)
    pd.testing.assert_frame_equal(broadcast, joined)
