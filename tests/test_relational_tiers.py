"""Tier-equality checks for the broadcast/cogroup TIERED relational
joins: fixtures run the broadcast tier; forcing ``broadcast_max_rows=0``
must produce identical results through the large-large cogroup path."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _rows(ds):
    return sorted(tuple(sorted(r.items())) for r in ds.take_all())


def test_ship_delay_hist_tiers_agree(ray_session):
    from autoner_ray.pipelines.relational import order_ship_delay_hist

    a = _rows(order_ship_delay_hist(SF))
    b = _rows(order_ship_delay_hist(SF, broadcast_max_rows=0))
    assert a == b and len(a) > 0


def test_customer_revenue_partials_tiers_agree(ray_session):
    """Summed per-custkey revenue identical through both tiers."""
    import pandas as pd

    from autoner_ray.pipelines.relational import _customer_revenue_partials

    def summed(broadcast_max_rows):
        df = _customer_revenue_partials(
            SF, broadcast_max_rows=broadcast_max_rows
        ).to_pandas()
        return (
            df.groupby("o_custkey")["order_cents"].sum().sort_index()
        )

    a, b = summed(5_000_000), summed(0)
    pd.testing.assert_series_equal(a, b)


def test_q3_shipping_priority_tiers_agree(ray_session):
    from autoner_ray.pipelines.relational import q3_shipping_priority

    a = _rows(q3_shipping_priority(SF))
    b = _rows(q3_shipping_priority(SF, broadcast_max_rows=0))
    assert a == b and len(a) == 10


def test_q4_order_priority_tiers_agree(ray_session):
    from autoner_ray.pipelines.relational import q4_order_priority

    a = _rows(q4_order_priority(SF))
    b = _rows(q4_order_priority(SF, broadcast_max_rows=0))
    assert a == b and len(a) > 0
