"""triangle_counts vs brute-force enumeration on random graphs."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd


def _brute(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    nodes = sorted(adj)
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for x in (a, b, c):
                counts[x] = counts.get(x, 0) + 1
    return counts


def test_triangle_counts_random_matches_bruteforce(ray_session):
    import ray

    from autoner_ray.stages.graph import triangle_counts

    rng = np.random.default_rng(11)
    for trial in range(3):
        n = 18
        names = [f"e{i:02d}" for i in range(n)]
        edges = set()
        for _ in range(70):
            i, j = rng.integers(0, n, 2)
            if i != j:
                a, b = sorted((names[i], names[j]))
                edges.add((a, b))
        edges = sorted(edges)
        df = pd.DataFrame(
            {
                "subj": [a for a, _ in edges],
                "obj": [b for _, b in edges],
            }
        )
        ds = ray.data.from_pandas(df)
        got_df = triangle_counts(ds).to_pandas()
        got = dict(
            zip(got_df["entity"], got_df["triangles"].astype(int))
        )
        assert got == _brute(edges), f"trial {trial}"
        assert got, "random graph should contain triangles"


def test_triangle_counts_empty_and_triangle_free(ray_session):
    import ray

    from autoner_ray.stages.graph import triangle_counts

    # a path graph has zero triangles
    df = pd.DataFrame(
        {"subj": ["a", "b", "c"], "obj": ["b", "c", "d"]}
    )
    got = triangle_counts(ray.data.from_pandas(df)).to_pandas()
    assert len(got) == 0


def test_c4_count_crafted(ray_session):
    """Quadrilateral census vs hand-counted fixtures (square, chorded
    square, triangle, diagonal-sharing double square)."""
    import pyarrow as pa
    import ray.data as rd

    from autoner_ray.stages.graph import c4_count

    cases = [
        ([(1, 2), (2, 3), (3, 4), (4, 1)], 1),
        ([(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)], 1),
        ([(1, 2), (2, 3), (3, 1)], 0),
        ([(1, 2), (2, 3), (3, 4), (4, 1), (1, 5), (5, 3)], 3),
    ]
    for pairs, want in cases:
        eds = rd.from_arrow(
            pa.table(
                {
                    "subj": pa.array([a for a, _ in pairs], pa.int64()),
                    "obj": pa.array([b for _, b in pairs], pa.int64()),
                }
            )
        )
        assert c4_count(eds)["n_c4"][0].as_py() == want
