"""Hyperlink-graph pins: anchor parse == arithmetic generator,
degree histogram brute force, PageRank twin vs DuckDB unroll, and the
extraction invariant (links must not disturb first-paragraph text)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from autoner_ray.sources.pages import (
    URL_PREFIX,
    derive_pages_batch,
    link_targets,
    make_html,
)
from autoner_ray.stages.webgraph import extract_links_batch

SF = "/root/testdata/sf0.001"


def test_link_targets_arithmetic():
    assert link_targets(0) == [1]            # 0//3 is a self-loop
    assert link_targets(1) == [2, 3, 0]
    assert link_targets(9) == [10, 19, 3]
    for i in range(200):
        ts = link_targets(i)
        assert i not in ts and len(ts) == len(set(ts))


def test_parse_recovers_generator_links():
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(50)), pa.int64()),
            "text": pa.array([f"t {i} <&>" for i in range(50)]),
            "lang": pa.array(["en"] * 50),
        }
    )
    edges = extract_links_batch(derive_pages_batch(docs))
    got = set(zip(edges["src"].to_pylist(), edges["dst"].to_pylist()))
    want = {(i, d) for i in range(50) for d in link_targets(i)}
    assert got == want


def test_links_do_not_disturb_text_extraction():
    from autoner_ray.stages.extract import extract_text_from_html

    text = 'x <a href="https://other.example/">inline</a> & y'
    assert extract_text_from_html(make_html(7, text)) == text


def test_degree_hist_bruteforce(ray_session):
    from autoner_ray.stages.webgraph import link_degree_hist

    got = (
        link_degree_hist(SF).to_pandas()
        .sort_values("in_degree").reset_index(drop=True)
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    edges = [
        (i, d) for i in docs["doc_id"] for d in link_targets(int(i))
    ]
    indeg = pd.Series([d for _, d in edges]).value_counts()
    want = (
        indeg.value_counts().rename_axis("in_degree")
        .rename("n_nodes").reset_index()
        .sort_values("in_degree").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64")
    )


def test_link_pagerank_matches_duckdb(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    from autoner_ray.stages.webgraph import link_pagerank

    got = link_pagerank(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(entrymod._link_pagerank_sql()).df()
    g = got.sort_values("page").reset_index(drop=True)
    w = want.sort_values("page").reset_index(drop=True)
    assert len(g) == len(w)
    assert (g["page"].to_numpy() == w["page"].to_numpy()).all()
    assert np.allclose(
        g["rank"].to_numpy(), w["rank"].to_numpy(), atol=1e-9
    )


def test_crawl_frontier_matches_duckdb(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    from autoner_ray.stages.webgraph import link_crawl_frontier

    got = (
        link_crawl_frontier(SF).to_pandas()
        .sort_values("page").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(entrymod.oracle_sql()["pages_crawl_frontier"]).df()
        .sort_values("page").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64")
    )


def test_directed_bfs_distributed_tier_equality(ray_session):
    """The distributed directed fixpoint must agree with a hand BFS on
    a small graph (each round is 2 shuffles, so the test graph has a
    tiny diameter — the driver tier covers the deep-chain case)."""
    import ray

    from autoner_ray.stages.graph import bfs_distances

    # 0->1, 0->2, 1->3, 3->4, 2->4, 4->0 (cycle back), 5 isolated-ish
    edges = pa.table(
        {
            "subj": pa.array([0, 0, 1, 3, 2, 4, 5], pa.int64()),
            "obj": pa.array([1, 2, 3, 4, 4, 0, 6], pa.int64()),
        }
    )
    got = (
        bfs_distances(
            ray.data.from_arrow(edges), source=0, max_depth=4,
            directed=True, num_partitions=2,
        )
        .to_pandas().sort_values("entity").reset_index(drop=True)
    )
    want = pd.DataFrame(
        {"entity": [0, 1, 2, 3, 4], "dist": [0, 1, 1, 2, 2]}
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want)


def test_directed_bfs_survives_indegree_zero_ancestry(ray_session):
    """Regression: nodes with no in-edge (and everything downstream of
    them) must NOT erode out of the dist table round by round. The old
    inner-join merge dropped in-degree-0 node 10 in round 1, then the
    seed 0 (whose only in-edge came from 10) in round 2, then 1 — the
    fixpoint returned only {2}. The merge is left-outer now."""
    import ray

    from autoner_ray.stages.graph import bfs_distances

    edges = pa.table(
        {
            "subj": pa.array([10, 0, 1], pa.int64()),
            "obj": pa.array([0, 1, 2], pa.int64()),
        }
    )
    got = (
        bfs_distances(
            ray.data.from_arrow(edges), source=0, max_depth=4,
            directed=True, num_partitions=2,
        )
        .to_pandas().sort_values("entity").reset_index(drop=True)
    )
    want = pd.DataFrame({"entity": [0, 1, 2], "dist": [0, 1, 2]})
    pd.testing.assert_frame_equal(got.astype("int64"), want)


def test_link_reciprocity_counts(ray_session):
    """Hand-check on sf0.001: reciprocal edges are exactly the a<->b
    pairs where both directions were parsed; recompute from the raw
    edge list."""
    from autoner_ray.stages.webgraph import link_graph, link_reciprocity

    edges = {
        (r["src"], r["dst"])
        for r in link_graph("/root/testdata/sf0.001").take_all()
    }
    n_recip = sum(1 for (a, b) in edges if (b, a) in edges)
    t = link_reciprocity("/root/testdata/sf0.001")
    assert t["n_edges"][0].as_py() == len(edges)
    assert t["n_reciprocal"][0].as_py() == n_recip
    assert (
        t["reciprocity_ppm"][0].as_py()
        == (n_recip * 1_000_000) // len(edges)
    )


def test_link_wcc_stats_driver(ray_session):
    from autoner_ray.stages.webgraph import link_graph, link_wcc_stats

    # brute-force union-find over the raw edge list
    edges = [
        (r["src"], r["dst"])
        for r in link_graph("/root/testdata/sf0.001").take_all()
    ]
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    import collections

    sizes = collections.Counter(find(v) for v in parent)
    t = link_wcc_stats("/root/testdata/sf0.001")
    assert t["n_components"][0].as_py() == len(sizes)
    assert t["giant_size"][0].as_py() == max(sizes.values())
    assert (
        t["giant_fraction_ppm"][0].as_py()
        == max(sizes.values()) * 1_000_000 // len(parent)
    )


def test_wcc_census_tier_equality(ray_session):
    # tiny two-component graph: the distributed-CC census tier must
    # match the union-find tier exactly (full-size graphs would pay
    # O(diameter) fixpoint rounds of pure Ray overhead in the suite)
    import pyarrow as pa
    import ray.data as rd

    from autoner_ray.stages.graph import wcc_census

    pairs = [(0, 1), (1, 2), (5, 6)]
    eds = rd.from_arrow(
        pa.table(
            {
                "subj": pa.array([a for a, _ in pairs], pa.int64()),
                "obj": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
    )
    drv = wcc_census(eds)
    dist = wcc_census(eds, driver_max_edges=0)
    assert drv.to_pydict() == dist.to_pydict()
    assert drv["n_components"][0].as_py() == 2
    assert drv["giant_size"][0].as_py() == 3


def test_link_rich_club_bruteforce(ray_session):
    from autoner_ray.stages.webgraph import link_graph, link_rich_club

    edges = {
        tuple(sorted((r["src"], r["dst"])))
        for r in link_graph("/root/testdata/sf0.001").take_all()
    }
    import collections

    deg = collections.Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    t = link_rich_club("/root/testdata/sf0.001").to_pandas()
    for _, row in t.iterrows():
        k = row["k"]
        rich = {n for n, d in deg.items() if d > k}
        e_k = sum(1 for u, v in edges if u in rich and v in rich)
        assert row["n_nodes"] == len(rich)
        assert row["n_edges"] == e_k
        want = (
            (2 * e_k * 1_000_000) // (len(rich) * (len(rich) - 1))
            if len(rich) >= 2 else 0
        )
        assert row["phi_ppm"] == want


def test_link_attack_tolerance_bruteforce(ray_session):
    """Driver tier vs brute force: remove top-k degree hubs (deduped
    undirected degree, ties min id), giant weak component over the
    survivors, isolated nodes as singletons. (The distributed branch
    composes the independently tier-pinned degree combine + wcc
    census.)"""
    import collections

    from autoner_ray.stages.webgraph import (
        link_attack_tolerance,
        link_graph,
    )

    edges = {
        tuple(sorted((r["src"], r["dst"])))
        for r in link_graph("/root/testdata/sf0.001").take_all()
    }
    deg = collections.Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    hubs = sorted(deg, key=lambda n: (-deg[n], n))
    t = link_attack_tolerance("/root/testdata/sf0.001").to_pandas()
    for _, row in t.iterrows():
        k = int(row["k"])
        rm = set(hubs[:k])
        surv = [(u, v) for u, v in edges if u not in rm and v not in rm]
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in surv:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        alive = set(deg) - rm
        sizes = collections.Counter(find(n) for n in alive if n in parent)
        giant = max(sizes.values()) if sizes else 0
        if len(alive) > giant:
            giant = max(giant, 1)
        assert row["n_nodes"] == len(alive)
        assert row["giant_size"] == giant
        assert row["giant_fraction_ppm"] == giant * 1_000_000 // len(alive)
