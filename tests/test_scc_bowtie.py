"""SCC + bow-tie census: Kosaraju vs brute force on random digraphs,
driver tier vs hand-derived classes on a fixture covering all five
bow-tie regions, and driver/distributed tier equality (the
``driver_max_edges=0`` override forces the Dataset-resident peel)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from autoner_ray.stages.graph import (
    _scc_kosaraju,
    bowtie_census,
    scc,
    scc_distributed,
)

# CORE cycle {10,11,12,13}; IN {4,5}; OUT 2-SCC {20,21}; TENDRIL {30}
# (dead-end off IN) and {40} (a classic "tube": IN-side to OUT-side,
# never through CORE); DISCONNECTED 2-SCC {50,51}.
_FIXTURE_EDGES = [
    (10, 11), (11, 12), (12, 13), (13, 10),
    (4, 5), (5, 10),
    (13, 20), (20, 21), (21, 20),
    (5, 30),
    (4, 40), (40, 20),
    (50, 51), (51, 50),
]
_FIXTURE_SCC = {
    4: 4, 5: 5, 10: 10, 11: 10, 12: 10, 13: 10,
    20: 20, 21: 20, 30: 30, 40: 40, 50: 50, 51: 50,
}
_FIXTURE_BOWTIE = {
    "CORE": 4, "IN": 2, "OUT": 2, "TENDRIL": 2, "DISCONNECTED": 2,
}


def _edges_ds(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "subj": pa.array([a for a, _ in pairs], pa.int64()),
                "obj": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
    )


def _brute_scc(src, dst, n):
    adj = [[] for _ in range(n)]
    for s, o in zip(src, dst):
        adj[int(s)].append(int(o))

    def reach(v):
        seen = {v}
        st = [v]
        while st:
            u = st.pop()
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    st.append(w)
        return seen

    r = [reach(v) for v in range(n)]
    return [
        min(u for u in range(n) if u in r[v] and v in r[u])
        for v in range(n)
    ]


def test_kosaraju_matches_brute_force_random():
    rng = np.random.default_rng(0)
    for _ in range(120):
        n = int(rng.integers(2, 40))
        m = int(rng.integers(1, 120))
        src = rng.integers(0, n, m).astype(np.int64)
        dst = rng.integers(0, n, m).astype(np.int64)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        if not len(src):
            continue
        nodes, inv = np.unique(
            np.concatenate([src, dst]), return_inverse=True
        )
        s2 = inv[: len(src)].astype(np.int64)
        d2 = inv[len(src):].astype(np.int64)
        comp = _scc_kosaraju(s2, d2)
        assert comp.tolist() == _brute_scc(s2, d2, len(nodes))


def test_scc_driver_tier_fixture(ray_session):
    t = scc(_edges_ds(_FIXTURE_EDGES))
    got = dict(zip(t["entity"].to_pylist(), t["scc_id"].to_pylist()))
    assert got == _FIXTURE_SCC


def test_bowtie_driver_tier_fixture(ray_session):
    t = bowtie_census(_edges_ds(_FIXTURE_EDGES))
    got = dict(zip(t["component"].to_pylist(), t["n_pages"].to_pylist()))
    assert got == _FIXTURE_BOWTIE


def test_bowtie_zero_classes_kept(ray_session):
    # a pure cycle: everything is CORE; the other four classes must
    # still emit explicit zero rows (stable schema for the oracle)
    t = bowtie_census(_edges_ds([(1, 2), (2, 3), (3, 1)]))
    got = dict(zip(t["component"].to_pylist(), t["n_pages"].to_pylist()))
    assert got == {
        "CORE": 3, "IN": 0, "OUT": 0, "TENDRIL": 0, "DISCONNECTED": 0,
    }



# compact 2-peel fixtures for the distributed tier: every Dataset
# fixpoint round costs fixed Ray overhead, so the tier-equality pins
# use the smallest graphs that still exercise multi-SCC peeling /
# every census count; class richness is pinned above on the driver
# tier and by the driver's SQL oracle (pages_link_scc/_bowtie).
_MINI_EDGES = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2)]
_MINI_SCC = {0: 0, 1: 0, 2: 2, 3: 2}


def test_scc_distributed_tier_equality(ray_session):
    drv = scc(_edges_ds(_MINI_EDGES))
    assert dict(
        zip(drv["entity"].to_pylist(), drv["scc_id"].to_pylist())
    ) == _MINI_SCC
    dist = scc_distributed(_edges_ds(_MINI_EDGES)).to_pandas()
    got = dict(zip(dist["entity"], dist["scc_id"]))
    assert got == _MINI_SCC


def test_bowtie_distributed_tier_equality(ray_session):
    # 9 -> CORE{0,1} -> 5, plus an isolated 2-cycle {7,8}
    edges = _MINI_EDGES[:2] + [(9, 0), (1, 5), (7, 8), (8, 7)]
    expected = {
        "CORE": 2, "IN": 1, "OUT": 1, "TENDRIL": 0, "DISCONNECTED": 2,
    }
    drv = bowtie_census(_edges_ds(edges))
    assert dict(
        zip(drv["component"].to_pylist(), drv["n_pages"].to_pylist())
    ) == expected
    t = bowtie_census(_edges_ds(edges), driver_max_edges=0)
    got = dict(zip(t["component"].to_pylist(), t["n_pages"].to_pylist()))
    assert got == expected


def _brute_diameter(pairs, max_depth=64):
    nodes = sorted({v for e in pairs for v in e})
    adj = {v: set() for v in nodes}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)

    def bfs(root):
        dist = {root: 0}
        frontier = [root]
        d = 0
        while frontier and d < max_depth:
            d += 1
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = d
                        nxt.append(w)
            frontier = nxt
        return dist

    d1 = bfs(nodes[0])
    ecc = max(d1.values())
    peri = min(v for v, d in d1.items() if d == ecc)
    return nodes[0], peri, max(bfs(peri).values())


def test_double_sweep_diameter_tiers(ray_session):
    from autoner_ray.stages.graph import double_sweep_diameter

    # path + branch + isolated cycle: peripheral tie-break matters
    pairs = [(0, 1), (1, 2), (2, 3), (1, 7), (8, 9), (9, 8)]
    want = _brute_diameter(pairs)
    drv = double_sweep_diameter(_edges_ds(pairs))
    got = (
        drv["start_node"][0].as_py(),
        drv["peripheral_node"][0].as_py(),
        drv["diameter_lb"][0].as_py(),
    )
    assert got == want
    dist = double_sweep_diameter(_edges_ds(pairs), driver_max_edges=0)
    got_d = (
        dist["start_node"][0].as_py(),
        dist["peripheral_node"][0].as_py(),
        dist["diameter_lb"][0].as_py(),
    )
    assert got_d == want


def test_double_sweep_diameter_random(ray_session):
    import numpy as np

    rng = np.random.default_rng(3)
    for _ in range(5):
        n = int(rng.integers(4, 25))
        m = int(rng.integers(3, 50))
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        pairs = [
            (int(a), int(b)) for a, b in zip(src, dst) if a != b
        ]
        if not pairs:
            continue
        from autoner_ray.stages.graph import double_sweep_diameter

        want = _brute_diameter(pairs)
        t = double_sweep_diameter(_edges_ds(pairs))
        got = (
            t["start_node"][0].as_py(),
            t["peripheral_node"][0].as_py(),
            t["diameter_lb"][0].as_py(),
        )
        assert got == want
