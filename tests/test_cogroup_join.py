"""cogroup_join vs an in-process pyarrow join oracle — including the
sparse/empty key shapes that crash Ray 2.49's native Dataset.join
(zero-block partitions -> schema-less tables in the aggregator)."""

from __future__ import annotations

import pyarrow as pa


def _pairs(result):
    rows = result.to_pandas().to_dict("records")
    return sorted(tuple(sorted(r.items())) for r in rows)


def test_cogroup_join_dense(ray_session):
    import ray.data as rd

    from autoner_ray.stages.joins import cogroup_join

    left = pa.table({"k": list(range(50)), "a": [i * 2 for i in range(50)]})
    right = pa.table(
        {"k": [i % 25 for i in range(100)], "b": list(range(100))}
    )
    got = cogroup_join(
        rd.from_arrow(left), rd.from_arrow(right), on=("k",)
    )
    want = left.join(right, keys=["k"], join_type="inner")
    assert _pairs(got) == _pairs(want)


def test_cogroup_join_sparse_single_key(ray_session):
    """One key on the left, many on the right: most hash partitions see
    only one side — the case the native join dies on."""
    import ray.data as rd

    from autoner_ray.stages.joins import cogroup_join

    left = pa.table({"k": [5], "a": [1]})
    right = pa.table({"k": list(range(100)), "b": list(range(100))})
    got = cogroup_join(
        rd.from_arrow(left), rd.from_arrow(right), on=("k",)
    ).take_all()
    assert got == [{"k": 5, "a": 1, "b": 5}]


def test_cogroup_join_empty_left(ray_session):
    import ray.data as rd

    from autoner_ray.stages.joins import cogroup_join

    left = rd.from_arrow(
        pa.schema([("k", pa.int64()), ("a", pa.int64())]).empty_table()
    )
    right = rd.from_arrow(pa.table({"k": [1, 2], "b": [3, 4]}))
    assert cogroup_join(left, right, on=("k",)).take_all() == []


def test_cogroup_join_multi_key(ray_session):
    import ray.data as rd

    from autoner_ray.stages.joins import cogroup_join

    left = pa.table(
        {"k1": [1, 1, 2], "k2": ["x", "y", "x"], "a": [10, 20, 30]}
    )
    right = pa.table(
        {"k1": [1, 2, 2], "k2": ["x", "x", "z"], "b": [7, 8, 9]}
    )
    got = cogroup_join(
        rd.from_arrow(left), rd.from_arrow(right), on=("k1", "k2")
    )
    want = left.join(right, keys=["k1", "k2"], join_type="inner")
    assert _pairs(got) == _pairs(want)


def test_default_num_partitions_scales_with_session(ray_session):
    """2x cluster CPUs when a session is live, floor otherwise."""
    import ray

    from autoner_ray.cluster import default_num_partitions

    cpus = int(ray.cluster_resources()["CPU"])
    assert default_num_partitions() == max(8, 2 * cpus)
    assert default_num_partitions(multiplier=1, floor=1) == max(1, cpus)
