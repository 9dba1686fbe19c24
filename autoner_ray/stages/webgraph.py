"""Web link-graph construction from crawled pages (north-rule KG
family: the hyperlink graph is the other graph a Common-Crawl-style
corpus carries besides the entity graph).

Anchor extraction parses the ``html`` binary column directly — the
pages generator embeds outlinks as a pure arithmetic function of
``doc_id`` (``sources/pages.py::link_targets``) precisely so a DuckDB
oracle can re-derive the SAME edge set from ``documents`` without an
HTML parser: the driver's value-hash then proves the engine's parse is
exact end-to-end.

Scale shape: link extraction is a stateless ``map_batches`` over pages
blocks (the wide html column is dropped on output, same as
``stages/extract.py``); each url appears exactly once in the crawl
table, so per-row dedup of anchors makes the edge stream globally
distinct with NO shuffle. Degree aggregation uses the partitioned
combine (never driver-sized); PageRank reuses ``stages/graph.py`` —
node set here is corpus-sized, so at 10^12 pages the
``pagerank_distributed`` twin is the default (same contract as the
entity graph's vocab-bounded/driver split).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from autoner_ray.sources.pages import URL_PREFIX, read_pages

_HREF_RE = re.compile(
    rb'href="' + re.escape(URL_PREFIX.encode()) + rb'(\d+)"'
)

_EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])


def extract_links_batch(batch: pa.Table) -> pa.Table:
    """pages -> (src, dst) outlink edges; anchors first-occurrence-
    deduped per page (mirrors the generator's dedup so re-parsed
    duplicates collapse identically)."""
    if batch.num_columns == 0 or len(batch) == 0:
        return _EDGE_SCHEMA.empty_table()
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    plen = len(URL_PREFIX)
    srcs: list[int] = []
    dsts: list[int] = []
    for u, h in zip(urls, htmls):
        src = int(u[plen:])
        seen: set[int] = set()
        for m in _HREF_RE.finditer(h or b""):
            dst = int(m.group(1))
            if dst != src and dst not in seen:
                seen.add(dst)
                srcs.append(src)
                dsts.append(dst)
    return pa.table(
        {
            "src": pa.array(srcs, pa.int64()),
            "dst": pa.array(dsts, pa.int64()),
        }
    )


def link_graph(sf_dir: str):
    """The parsed hyperlink edge list (src, dst), globally distinct
    (one crawl row per url + per-row dedup — no shuffle needed)."""
    return read_pages(sf_dir).map_batches(
        extract_links_batch, batch_format="pyarrow"
    )


def link_degree_hist(sf_dir: str):
    """In-degree histogram of the hyperlink graph: (in_degree,
    n_nodes). Per-dst counts flow through the dst-partitioned combine
    (node set is corpus-sized — never on the driver); the histogram
    tail is the shuffle-free bounded combine over the small degree
    domain."""
    from autoner_ray.stages.combine import (
        bounded_key_sum,
        partitioned_key_sum,
    )

    def count_partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "dst": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        vals, counts = np.unique(t["dst"].to_numpy(), return_counts=True)
        return pa.table(
            {
                "dst": pa.array(vals, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    per_dst = partitioned_key_sum(
        link_graph(sf_dir).map_batches(
            count_partial, batch_format="pyarrow", batch_size=65536
        ),
        keys=["dst"], sum_cols=["n"], part_on=("dst",),
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "in_degree": pa.array([], pa.int64()),
                    "n_nodes": pa.array([], pa.int64()),
                }
            )
        vals, counts = np.unique(t["n"].to_numpy(), return_counts=True)
        return pa.table(
            {
                "in_degree": pa.array(vals, pa.int64()),
                "n_nodes": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return bounded_key_sum(
        per_dst.map_batches(
            hist_partial, batch_format="pyarrow", batch_size=None
        ),
        keys=["in_degree"], sum_cols=["n_nodes"],
    )


def link_pagerank(sf_dir: str, round_dp: int = 6):
    """PageRank over the hyperlink graph, undirected expansion (same
    contract as the entity graph's ``kg_pagerank``: co-citation
    relevance, weight 1 per distinct parsed edge; the SQL twin unrolls
    the identical power iteration). String node ids keep the
    ``stages/graph.py`` interface; the collect there is documented as
    the bounded-vocab default with ``pagerank_distributed`` as the
    at-scale twin — for the corpus-sized web graph the distributed
    variant IS the default at 10^12 pages."""
    from autoner_ray.stages.graph import pagerank

    def to_weighted(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "subj": pa.array([], pa.string()),
                    "obj": pa.array([], pa.string()),
                    "weight": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "subj": t["src"].cast(pa.string()),
                "obj": t["dst"].cast(pa.string()),
                "weight": pa.array(
                    np.ones(len(t), np.int64), pa.int64()
                ),
            }
        )

    ranked = pagerank(
        link_graph(sf_dir).map_batches(
            to_weighted, batch_format="pyarrow"
        ),
        round_dp=round_dp,
    )
    # int node ids for the oracle compare (and a saner public schema)
    import pyarrow.compute as pc

    page = ranked["entity"].cast(pa.int64())
    out = pa.table({"page": page, "rank": ranked["rank"]})
    order = pc.sort_indices(
        out, sort_keys=[("rank", "descending"), ("page", "ascending")]
    )
    return out.take(order)


def link_crawl_frontier(sf_dir: str, seed: int = 0,
                        max_depth: int = 16,
                        driver_max_edges: int = 2_000_000):
    """Crawl-frontier simulation: hop distance from the ``seed`` page
    following OUTLINKS only (directed BFS — the order a breadth-first
    crawler would discover pages in); pages unreachable within
    ``max_depth`` hops emit no row (same cap as the recursive-CTE
    oracle).

    TIERED like ``dedup.neardup_keep_one``: an edge set up to
    ``driver_max_edges`` runs a numpy CSR frontier sweep on the driver
    (each distributed fixpoint round costs two cogroup shuffles of pure
    fixed overhead — ~16 rounds of that dwarf a small graph); above the
    bound, the Dataset min-distance fixpoint
    (``graph.bfs_distances(directed=True)``) takes over with identical
    results (equality pytest-pinned on the fixture graph)."""
    edges = link_graph(sf_dir).materialize()
    if edges.count() <= driver_max_edges:
        df = edges.to_pandas()
        src = df["src"].to_numpy(np.int64)
        dst = df["dst"].to_numpy(np.int64)
        nodes = np.unique(np.concatenate([src, dst, [seed]]))
        comp = {int(n): i for i, n in enumerate(nodes)}
        s = np.fromiter((comp[int(x)] for x in src), np.int64,
                        count=len(src))
        d = np.fromiter((comp[int(x)] for x in dst), np.int64,
                        count=len(dst))
        order = np.argsort(s, kind="stable")
        s, d = s[order], d[order]
        starts = np.searchsorted(s, np.arange(len(nodes) + 1))
        dist = np.full(len(nodes), -1, np.int64)
        frontier = np.array([comp[seed]], np.int64)
        dist[frontier] = 0
        for depth in range(1, max_depth + 1):
            if len(frontier) == 0:
                break
            neigh = np.concatenate(
                [d[starts[f]:starts[f + 1]] for f in frontier]
            ) if len(frontier) else np.array([], np.int64)
            neigh = np.unique(neigh)
            frontier = neigh[dist[neigh] < 0]
            dist[frontier] = depth
        hit = dist >= 0
        return pa.table(
            {
                "page": pa.array(nodes[hit], pa.int64()),
                "hops": pa.array(dist[hit], pa.int64()),
            }
        )

    from autoner_ray.stages.graph import bfs_distances

    def to_named(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "subj": pa.array([], pa.int64()),
                    "obj": pa.array([], pa.int64()),
                }
            )
        return pa.table({"subj": t["src"], "obj": t["dst"]})

    dist = bfs_distances(
        edges.map_batches(to_named, batch_format="pyarrow"),
        source=seed, max_depth=max_depth, directed=True,
    )

    def rename(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "page": pa.array([], pa.int64()),
                    "hops": pa.array([], pa.int64()),
                }
            )
        return pa.table({"page": t["entity"], "hops": t["dist"]})

    return dist.map_batches(rename, batch_format="pyarrow")


def link_scc(sf_dir: str, driver_max_edges: int = 2_000_000):
    """Strongly connected components of the DIRECTED hyperlink graph
    (page, scc_id) — the first half of the classic web bow-tie census
    (Broder et al., "Graph structure in the Web", WWW 2000). scc_id is
    the smallest member page id, so labels are content-derived and
    identical across tiers / parallelism.

    Node set is every page id appearing as either endpoint (dangling
    outlink targets included, as sink nodes). TIERED via
    ``stages/graph.py::scc``: numpy-CSR Kosaraju under
    ``driver_max_edges``, Dataset-resident min-label forward/backward
    peeling above it (tier equality pytest-pinned)."""
    from autoner_ray.stages.graph import scc

    def to_named(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.schema(
                [("subj", pa.int64()), ("obj", pa.int64())]
            ).empty_table()
        return pa.table({"subj": t["src"], "obj": t["dst"]})

    labels = scc(
        link_graph(sf_dir).map_batches(to_named, batch_format="pyarrow"),
        driver_max_edges=driver_max_edges,
    )
    if not isinstance(labels, pa.Table):
        # distributed tier: stay a Dataset (corpus-sized node table) —
        # rename only; the driver compare is order-insensitive
        def rename(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or len(t) == 0:
                return pa.schema(
                    [("page", pa.int64()), ("scc_id", pa.int64())]
                ).empty_table()
            return pa.table(
                {"page": t["entity"], "scc_id": t["scc_id"]}
            )

        return labels.map_batches(rename, batch_format="pyarrow")
    import pyarrow.compute as pc

    out = pa.table({"page": labels["entity"], "scc_id": labels["scc_id"]})
    return out.take(pc.sort_indices(out, sort_keys=[("page", "ascending")]))




def link_bowtie(sf_dir: str, driver_max_edges: int = 2_000_000,
                max_depth: int = 64):
    """Bow-tie census of the directed hyperlink graph (Broder et al.,
    WWW 2000): every page lands in exactly one of
      CORE          — the largest SCC (ties broken by smallest scc_id),
      IN            — reaches CORE but is not in it,
      OUT           — reachable from CORE but not in it,
      TENDRIL       — weakly connected to CORE, neither IN nor OUT
                      (classic tendrils + tubes, folded together),
      DISCONNECTED  — no undirected path to CORE at all.
    Output: (component, n_pages) over all five classes (zero counts
    kept — stable schema at any scale).

    Because CORE is strongly connected, reachability to/from ANY one
    member decides IN/OUT — the sweeps seed from the core's smallest
    member only, never from the (possibly huge) member list.

    TIERED like :func:`link_scc`: under ``driver_max_edges`` the three
    reachability sweeps run on the same numpy CSR as the Kosaraju
    labels; above it, ``graph.scc_distributed`` + three
    ``graph.bfs_distances`` fixpoints (forward, reversed-edge, and
    undirected, all seeded at the core root) produce identical classes
    (tier equality pytest-pinned). ``max_depth`` caps the distributed
    sweeps; the real web's diameter is far below it."""
    from autoner_ray.stages.graph import bowtie_census

    def to_named(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.schema(
                [("subj", pa.int64()), ("obj", pa.int64())]
            ).empty_table()
        return pa.table({"subj": t["src"], "obj": t["dst"]})

    return bowtie_census(
        link_graph(sf_dir).map_batches(to_named, batch_format="pyarrow"),
        driver_max_edges=driver_max_edges, max_depth=max_depth,
    )


def link_diameter(sf_dir: str, driver_max_edges: int = 2_000_000,
                  max_depth: int = 64):
    """Double-sweep diameter lower bound of the UNDIRECTED hyperlink
    graph — the crawl-reach companion to :func:`link_bowtie` (how many
    hops a frontier needs to cross the crawl). One row:
    (start_page, peripheral_page, diameter_lb); see
    ``graph.double_sweep_diameter`` for the sweep/tier contract."""
    from autoner_ray.stages.graph import double_sweep_diameter

    def to_named(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.schema(
                [("subj", pa.int64()), ("obj", pa.int64())]
            ).empty_table()
        return pa.table({"subj": t["src"], "obj": t["dst"]})

    out = double_sweep_diameter(
        link_graph(sf_dir).map_batches(to_named, batch_format="pyarrow"),
        driver_max_edges=driver_max_edges, max_depth=max_depth,
    )
    return pa.table(
        {
            "start_page": out["start_node"],
            "peripheral_page": out["peripheral_node"],
            "diameter_lb": out["diameter_lb"],
        }
    )


def link_reciprocity(sf_dir: str, num_partitions: int | None = None):
    """Reciprocity of the directed hyperlink graph: the fraction of
    directed edges whose reverse edge also exists (a↔b both present) —
    the classic webgraph symmetry measure. One row:
    (n_edges, n_reciprocal, reciprocity_ppm) with the ratio in integer
    parts-per-million (exact at any parallelism; the oracle computes
    the same integer).

    Scale shape: each directed edge maps to its UNORDERED pair key and
    a direction bit; a pair-key-partitioned sum counts directions per
    pair (1 = one way, 2 = both, self-pair-free by construction), and
    the reciprocal total is a bounded combine over the tiny
    (n_directions, n_pairs) histogram — the edge set never lands on
    the driver."""
    import pyarrow.compute as pc

    from autoner_ray.stages.combine import (
        bounded_key_sum,
        partitioned_key_sum,
    )

    _pair_schema = pa.schema(
        [("lo", pa.int64()), ("hi", pa.int64()), ("n_dir", pa.int64())]
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _pair_schema.empty_table()
        import numpy as np

        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        return pa.table(
            {
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
                "n_dir": pa.array(np.ones(len(lo), np.int64), pa.int64()),
            },
            schema=_pair_schema,
        )

    per_pair = partitioned_key_sum(
        link_graph(sf_dir).map_batches(
            pair_partial, batch_format="pyarrow", batch_size=65536
        ),
        keys=["lo", "hi"], sum_cols=["n_dir"], part_on=("lo",),
        num_partitions=num_partitions,
    )

    _h_schema = pa.schema([("n_dir", pa.int64()), ("n_pairs", pa.int64())])

    def hist_partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _h_schema.empty_table()
        vc = pc.value_counts(t["n_dir"])
        return pa.table(
            {
                "n_dir": vc.field("values"),
                "n_pairs": pc.cast(vc.field("counts"), pa.int64()),
            },
            schema=_h_schema,
        )

    hist = bounded_key_sum(
        per_pair.map_batches(hist_partial, batch_format="pyarrow"),
        keys=["n_dir"], sum_cols=["n_pairs"],
    ).to_pandas()
    counts = dict(zip(hist["n_dir"], hist["n_pairs"]))
    n_recip_pairs = int(counts.get(2, 0))
    n_edges = sum(int(k) * int(v) for k, v in counts.items())
    n_reciprocal = 2 * n_recip_pairs
    ppm = (n_reciprocal * 1_000_000) // n_edges if n_edges else 0
    return pa.table(
        {
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_reciprocal": pa.array([n_reciprocal], pa.int64()),
            "reciprocity_ppm": pa.array([ppm], pa.int64()),
        }
    )


def link_wcc_stats(sf_dir: str, driver_max_edges: int = 2_000_000):
    """Weak-connectivity census of the hyperlink graph: one row
    (n_components, giant_size, giant_fraction_ppm) over the undirected
    edge set (node set = both endpoints, dangling targets included).
    Giant fraction is integer ppm of ALL nodes.

    TIERED on the component labels (the :func:`link_scc` contract):
    driver union-find under ``driver_max_edges``, else
    ``graph.connected_components_distributed`` with the census derived
    from a label-grouped count — only the (component, size) table,
    never the node table, feeds the final single-row reduce."""
    from autoner_ray.stages.graph import wcc_census

    def to_named(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.schema(
                [("subj", pa.int64()), ("obj", pa.int64())]
            ).empty_table()
        return pa.table({"subj": t["src"], "obj": t["dst"]})

    return wcc_census(
        link_graph(sf_dir).map_batches(to_named, batch_format="pyarrow"),
        driver_max_edges=driver_max_edges,
    )


def link_rich_club(sf_dir: str, ks: tuple = (1, 2, 4, 8),
                   num_partitions: int | None = None):
    """Rich-club coefficient of the undirected hyperlink graph at
    degree thresholds ``ks``: φ(k) = 2·E_k / (N_k·(N_k−1)) over the
    subgraph induced by nodes with degree > k (Colizza et al. 2006 —
    do high-degree pages preferentially link each other?). One row per
    k: (k, n_nodes, n_edges, phi_ppm) with φ in integer ppm (0 when
    N_k < 2).

    Scale shape: degrees come from the dst/src-partitioned count
    combine; each (undirected-deduped) edge joins the degree table
    twice (both endpoints co-partition by node key) and carries
    ``min(deg_u, deg_v)`` forward, so ALL thresholds are answered by
    ONE two-join pass + a tiny histogram — no per-k passes, nothing
    node-set-sized on the driver."""
    import numpy as np
    import pyarrow.compute as pc

    from autoner_ray.stages.combine import (
        bounded_key_sum,
        partitioned_key_sum,
    )
    from autoner_ray.stages.joins import cogroup_join

    edges = link_graph(sf_dir).materialize()

    _und_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])

    def undirected(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _und_schema.empty_table()
        import numpy as np

        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.minimum(s, d), pa.int64()),
                "v": pa.array(np.maximum(s, d), pa.int64()),
            },
            schema=_und_schema,
        )

    # dedup unordered pairs (a<->b parsed both ways counts once)
    und = partitioned_key_sum(
        edges.map_batches(undirected, batch_format="pyarrow")
        .map_batches(
            lambda t: (
                pa.table(
                    {
                        "u": t["u"], "v": t["v"],
                        "one": pa.array([1] * len(t), pa.int64()),
                    }
                )
                if t.num_columns else
                pa.schema(
                    [("u", pa.int64()), ("v", pa.int64()),
                     ("one", pa.int64())]
                ).empty_table()
            ),
            batch_format="pyarrow",
        ),
        keys=["u", "v"], sum_cols=["one"], part_on=("u",),
        num_partitions=num_partitions,
    ).materialize()

    _deg_schema = pa.schema([("node", pa.int64()), ("deg", pa.int64())])

    def ends(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0 or "u" not in t.schema.names:
            return _deg_schema.empty_table()
        import numpy as np

        nodes = np.concatenate(
            [t["u"].to_numpy(zero_copy_only=False),
             t["v"].to_numpy(zero_copy_only=False)]
        )
        vals, counts = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "node": pa.array(vals, pa.int64()),
                "deg": pa.array(counts.astype(np.int64), pa.int64()),
            },
            schema=_deg_schema,
        )

    degrees = partitioned_key_sum(
        und.map_batches(ends, batch_format="pyarrow"),
        keys=["node"], sum_cols=["deg"], part_on=("node",),
        num_partitions=num_partitions,
    ).materialize()

    # join side A: key on u
    _ea_schema = pa.schema(
        [("node", pa.int64()), ("v", pa.int64())]
    )

    def key_u(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0 or "u" not in t.schema.names:
            return _ea_schema.empty_table()
        return pa.table({"node": t["u"], "v": t["v"]}, schema=_ea_schema)

    _eb_schema = pa.schema(
        [("node", pa.int64()), ("deg_u", pa.int64())]
    )

    def carry_u(t: pa.Table) -> pa.Table:
        # after join on node: (node, v, deg) -> key on v, carry deg_u
        if t.num_columns == 0 or len(t) == 0 or "v" not in t.schema.names:
            return _eb_schema.empty_table()
        return pa.table(
            {"node": t["v"], "deg_u": t["deg"]}, schema=_eb_schema
        )

    joined_u = cogroup_join(
        und.map_batches(key_u, batch_format="pyarrow"),
        degrees, on=("node",), num_partitions=num_partitions,
    ).map_batches(carry_u, batch_format="pyarrow")
    _min_schema = pa.schema([("min_deg", pa.int64()), ("n", pa.int64())])

    def min_hist(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0 or "deg_u" not in (
            t.schema.names
        ):
            return _min_schema.empty_table()
        import numpy as np

        md = np.minimum(
            t["deg_u"].to_numpy(zero_copy_only=False),
            t["deg"].to_numpy(zero_copy_only=False),
        )
        vals, counts = np.unique(md, return_counts=True)
        return pa.table(
            {
                "min_deg": pa.array(vals, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            },
            schema=_min_schema,
        )

    edge_hist = bounded_key_sum(
        cogroup_join(
            joined_u, degrees, on=("node",),
            num_partitions=num_partitions,
        ).map_batches(min_hist, batch_format="pyarrow"),
        keys=["min_deg"], sum_cols=["n"],
    ).to_pandas()
    deg_hist = bounded_key_sum(
        degrees.map_batches(
            lambda t: (
                pa.table(
                    {
                        "deg": t["deg"],
                        "n_nodes": pa.array([1] * len(t), pa.int64()),
                    }
                )
                if t.num_columns and "deg" in t.schema.names else
                pa.schema(
                    [("deg", pa.int64()), ("n_nodes", pa.int64())]
                ).empty_table()
            ),
            batch_format="pyarrow",
        ),
        keys=["deg"], sum_cols=["n_nodes"],
    ).to_pandas()
    out_k, out_n, out_e, out_p = [], [], [], []
    for k in ks:
        n_k = int(deg_hist[deg_hist["deg"] > k]["n_nodes"].sum())
        e_k = int(edge_hist[edge_hist["min_deg"] > k]["n"].sum())
        phi = (
            (2 * e_k * 1_000_000) // (n_k * (n_k - 1))
            if n_k >= 2 else 0
        )
        out_k.append(int(k))
        out_n.append(n_k)
        out_e.append(e_k)
        out_p.append(phi)
    return pa.table(
        {
            "k": pa.array(out_k, pa.int64()),
            "n_nodes": pa.array(out_n, pa.int64()),
            "n_edges": pa.array(out_e, pa.int64()),
            "phi_ppm": pa.array(out_p, pa.int64()),
        }
    )


def link_attack_tolerance(sf_dir: str, ks: tuple = (0, 1, 2, 4, 8),
                          driver_max_edges: int = 2_000_000):
    """Attack-tolerance curve of the hyperlink graph (Albert/Jeong/
    Barabási 2000): remove the ``k`` highest-degree pages (undirected
    degree, ties -> smallest page id) and measure how the giant weak
    component shrinks. One row per k: (k, n_nodes, giant_size,
    giant_fraction_ppm) over the REMAINING node set (isolated
    survivors count as size-1 components).

    Scale shape: degrees come from the node-partitioned combine and
    the hub list is top-k of it (tiny, broadcast); each k's surviving
    edge set is a vectorized anti-filter. The census itself is TIERED
    like :func:`link_wcc_stats` — numpy union-find per k under
    ``driver_max_edges``, else the distributed CC census per k (few
    ks; each pays O(diameter) fixpoint rounds)."""
    import numpy as np

    edges = link_graph(sf_dir).materialize()
    df = edges.to_pandas() if edges.count() <= driver_max_edges else None
    if df is None:
        # distributed tier: derive hubs from the degree combine, then
        # run the wcc census per k on the anti-filtered edge Dataset
        from autoner_ray.stages.combine import partitioned_key_sum
        from autoner_ray.stages.graph import wcc_census

        # dedup unordered pairs first: degree must match the driver
        # tier's deduped-pair definition (a<->b counts once)
        _und_schema = pa.schema(
            [("u", pa.int64()), ("v", pa.int64()), ("one", pa.int64())]
        )

        def und_partial(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or len(t) == 0:
                return _und_schema.empty_table()
            ss = t["src"].to_numpy(zero_copy_only=False)
            dd = t["dst"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "u": pa.array(np.minimum(ss, dd), pa.int64()),
                    "v": pa.array(np.maximum(ss, dd), pa.int64()),
                    "one": pa.array(np.ones(len(ss), np.int64),
                                    pa.int64()),
                },
                schema=_und_schema,
            )

        und = partitioned_key_sum(
            edges.map_batches(und_partial, batch_format="pyarrow"),
            keys=["u", "v"], sum_cols=["one"], part_on=("u",),
        ).materialize()
        _d_schema = pa.schema([("node", pa.int64()), ("deg", pa.int64())])

        def ends(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or len(t) == 0 or "u" not in (
                t.schema.names
            ):
                return _d_schema.empty_table()
            nodes = np.concatenate(
                [t["u"].to_numpy(zero_copy_only=False),
                 t["v"].to_numpy(zero_copy_only=False)]
            )
            vals, counts = np.unique(nodes, return_counts=True)
            return pa.table(
                {
                    "node": pa.array(vals, pa.int64()),
                    "deg": pa.array(counts.astype(np.int64), pa.int64()),
                },
                schema=_d_schema,
            )

        degrees = partitioned_key_sum(
            und.map_batches(ends, batch_format="pyarrow"),
            keys=["node"], sum_cols=["deg"], part_on=("node",),
        )
        top = degrees.sort(
            ["deg", "node"], descending=[True, False]
        ).limit(max(ks)).to_pandas()
        n_total = degrees.count()
        hubs_all = top["node"].to_list()
        rows = []
        import ray

        for k in ks:
            hubs = ray.put(pa.array(hubs_all[:k], pa.int64()))

            def drop(t: pa.Table, _h=hubs) -> pa.Table:
                import pyarrow.compute as pc

                if t.num_columns == 0 or len(t) == 0 or "u" not in (
                    t.schema.names
                ):
                    return pa.schema(
                        [("subj", pa.int64()), ("obj", pa.int64())]
                    ).empty_table()
                hv = ray.get(_h)
                keep = pc.and_(
                    pc.invert(pc.is_in(t["u"], value_set=hv)),
                    pc.invert(pc.is_in(t["v"], value_set=hv)),
                )
                return pa.table(
                    {
                        "subj": t["u"].filter(keep),
                        "obj": t["v"].filter(keep),
                    }
                )

            cen = wcc_census(
                und.map_batches(drop, batch_format="pyarrow"),
                driver_max_edges=0,
            )
            n_rem = n_total - k
            giant = max(
                int(cen["giant_size"][0].as_py()),
                1 if n_rem > int(cen["giant_size"][0].as_py()) else 0,
            )
            rows.append((k, n_rem, giant,
                         (giant * 1_000_000) // n_rem if n_rem else 0))
        return pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.int64()),
                "n_nodes": pa.array([r[1] for r in rows], pa.int64()),
                "giant_size": pa.array([r[2] for r in rows], pa.int64()),
                "giant_fraction_ppm": pa.array(
                    [r[3] for r in rows], pa.int64()
                ),
            }
        )

    s = df["src"].to_numpy(np.int64)
    d = df["dst"].to_numpy(np.int64)
    nodes, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
    a = inv[: len(s)].astype(np.int64)
    b = inv[len(s):].astype(np.int64)
    n = len(nodes)
    deg = np.zeros(n, np.int64)
    # undirected degree over DEDUPED unordered pairs
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    pair = np.unique(lo * np.int64(n) + hi)
    pu = (pair // n).astype(np.int64)
    pv = (pair % n).astype(np.int64)
    np.add.at(deg, pu, 1)
    np.add.at(deg, pv, 1)
    hub_order = np.lexsort((np.arange(n), -deg))  # deg desc, id asc
    out = []
    for k in ks:
        removed = np.zeros(n, bool)
        removed[hub_order[:k]] = True
        keep = ~(removed[pu] | removed[pv])
        parent = np.arange(n, dtype=np.int64)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in zip(pu[keep], pv[keep]):
            ru, rv = find(int(u)), find(int(v))
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        alive = ~removed
        roots = np.fromiter(
            (find(int(i)) for i in np.flatnonzero(alive)), np.int64
        )
        _, sizes = np.unique(roots, return_counts=True)
        n_rem = int(alive.sum())
        giant = int(sizes.max()) if len(sizes) else 0
        out.append(
            (int(k), n_rem, giant,
             (giant * 1_000_000) // n_rem if n_rem else 0)
        )
    return pa.table(
        {
            "k": pa.array([r[0] for r in out], pa.int64()),
            "n_nodes": pa.array([r[1] for r in out], pa.int64()),
            "giant_size": pa.array([r[2] for r in out], pa.int64()),
            "giant_fraction_ppm": pa.array(
                [r[3] for r in out], pa.int64()
            ),
        }
    )


def link_random_failure(sf_dir: str, ps=(250_000, 500_000, 750_000),
                        driver_max_edges: int = 2_000_000):
    """Random-failure tolerance of the hyperlink graph — the companion
    curve to :func:`link_attack_tolerance` (Albert/Jeong/Barabási:
    scale-free graphs survive random failure but crumble under
    targeted attack): at each failure rate p (in ppm), KEEP the
    deduped undirected edges whose content hash
    ``md5_64('{u}|{v}')`` lands >= p on the 32-bit-scaled ring — a
    deterministic stand-in for "each edge fails with probability p" —
    and report the surviving giant weak component. One row per p:
    (p_ppm, n_edges_kept, n_nodes, giant_size, giant_fraction_ppm)
    over the ORIGINAL node set (failed-away nodes count as isolated
    singletons, exactly how a crawler sees unreachable-but-known
    pages).

    Scale shape: the edge filter is a vectorized memoized-md5
    threshold per batch; the census per p is the tiered
    :func:`graph.wcc_census` driver/distributed split."""
    import numpy as np

    from autoner_ray.functions.hashing import md5_64_array
    from autoner_ray.stages.combine import partitioned_key_sum
    from autoner_ray.stages.graph import wcc_census

    edges = link_graph(sf_dir).materialize()
    _und_schema = pa.schema(
        [("u", pa.int64()), ("v", pa.int64()), ("one", pa.int64())]
    )

    def und_partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _und_schema.empty_table()
        ss = t["src"].to_numpy(zero_copy_only=False)
        dd = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.minimum(ss, dd), pa.int64()),
                "v": pa.array(np.maximum(ss, dd), pa.int64()),
                "one": pa.array(np.ones(len(ss), np.int64), pa.int64()),
            },
            schema=_und_schema,
        )

    und = partitioned_key_sum(
        edges.map_batches(und_partial, batch_format="pyarrow"),
        keys=["u", "v"], sum_cols=["one"],
        part_on=("u",),
    ).materialize()

    def node_count(ds) -> int:
        import ray.data  # noqa: F401

        def ends(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or len(t) == 0 or "u" not in (
                t.schema.names
            ):
                return pa.schema([("n", pa.int64())]).empty_table()
            return pa.table(
                {
                    "n": pa.chunked_array(
                        [t["u"].combine_chunks(),
                         t["v"].combine_chunks()]
                    )
                }
            )

        from ray.data.aggregate import Count

        return (
            ds.map_batches(ends, batch_format="pyarrow")
            .groupby("n").aggregate(Count(alias_name="_c")).count()
        )

    n_total = node_count(und)
    rows = []
    for p in ps:
        thr = np.uint64(int(p * (1 << 32) // 1_000_000) << 32)

        _e_schema = pa.schema([("subj", pa.int64()), ("obj", pa.int64())])

        def keep(t: pa.Table, _thr=thr) -> pa.Table:
            if t.num_columns == 0 or len(t) == 0 or "u" not in (
                t.schema.names
            ):
                return _e_schema.empty_table()
            uu = t["u"].to_pylist()
            vv = t["v"].to_pylist()
            h = md5_64_array([f"{a}|{b}" for a, b in zip(uu, vv)])
            mask = h >= _thr
            return pa.table(
                {
                    "subj": pa.array(
                        np.asarray(uu, np.int64)[mask], pa.int64()
                    ),
                    "obj": pa.array(
                        np.asarray(vv, np.int64)[mask], pa.int64()
                    ),
                },
                schema=_e_schema,
            )

        kept = und.map_batches(keep, batch_format="pyarrow").materialize()
        n_kept = kept.count()
        cen = wcc_census(kept, driver_max_edges=driver_max_edges)
        giant = int(cen["giant_size"][0].as_py())
        if n_total > giant:
            giant = max(giant, 1)
        rows.append(
            (int(p), n_kept, n_total, giant,
             (giant * 1_000_000) // n_total if n_total else 0)
        )
    return pa.table(
        {
            "p_ppm": pa.array([r[0] for r in rows], pa.int64()),
            "n_edges_kept": pa.array([r[1] for r in rows], pa.int64()),
            "n_nodes": pa.array([r[2] for r in rows], pa.int64()),
            "giant_size": pa.array([r[3] for r in rows], pa.int64()),
            "giant_fraction_ppm": pa.array(
                [r[4] for r in rows], pa.int64()
            ),
        }
    )


def link_densification(sf_dir: str, fractions=(250_000, 500_000,
                                               750_000, 1_000_000)):
    """Densification-law curve (Leskovec/Kleinberg/Faloutsos: e(t)
    grows superlinearly in n(t)): for each crawl PREFIX (first
    ``f/1e6`` of pages by doc_id — crawl order IS id order in this
    corpus), the node and deduped-undirected-edge counts of the
    induced outlink graph, plus edges-per-node in integer ppm. One
    row per fraction: (fraction_ppm, n_pages_crawled, n_nodes,
    n_edges, edges_per_node_ppm).

    Scale shape: one pass per prefix — a doc_id threshold filter at
    the read feeds the same pair-dedup combine as
    :func:`link_reciprocity`; node counts ride the endpoint-distinct
    combine. Nothing driver-sized."""
    import numpy as np

    from ray.data.aggregate import Count

    from autoner_ray.stages.combine import partitioned_key_sum
    from autoner_ray.sources.pages import read_pages

    # max doc id once (cheap aggregate over the id column)
    import ray.data as rd

    ids = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    max_id = ids.max("doc_id")
    n_docs = ids.count()
    rows = []
    edges_all = link_graph(sf_dir).materialize()
    for f in fractions:
        cutoff = (max_id + 1) * f // 1_000_000  # doc_id < cutoff

        _e_schema = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                               ("one", pa.int64())])

        def prefix_pairs(t: pa.Table, _c=cutoff) -> pa.Table:
            if t.num_columns == 0 or len(t) == 0:
                return _e_schema.empty_table()
            import pyarrow.compute as pc

            keep = pc.less(t["src"], _c)
            s = t["src"].filter(keep).to_numpy(zero_copy_only=False)
            d = t["dst"].filter(keep).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "u": pa.array(np.minimum(s, d), pa.int64()),
                    "v": pa.array(np.maximum(s, d), pa.int64()),
                    "one": pa.array(np.ones(len(s), np.int64),
                                    pa.int64()),
                },
                schema=_e_schema,
            )

        und = partitioned_key_sum(
            edges_all.map_batches(prefix_pairs, batch_format="pyarrow"),
            keys=["u", "v"], sum_cols=["one"], part_on=("u",),
        ).materialize()
        n_edges = und.count()

        def ends(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or len(t) == 0 or "u" not in (
                t.schema.names
            ):
                return pa.schema([("n", pa.int64())]).empty_table()
            return pa.table(
                {
                    "n": pa.chunked_array(
                        [t["u"].combine_chunks(),
                         t["v"].combine_chunks()]
                    )
                }
            )

        n_nodes = (
            und.map_batches(ends, batch_format="pyarrow")
            .groupby("n").aggregate(Count(alias_name="_c")).count()
        )
        n_crawled = min(int(cutoff), n_docs)
        rows.append(
            (int(f), n_crawled, int(n_nodes), int(n_edges),
             (n_edges * 1_000_000) // n_nodes if n_nodes else 0)
        )
    return pa.table(
        {
            "fraction_ppm": pa.array([r[0] for r in rows], pa.int64()),
            "n_pages_crawled": pa.array(
                [r[1] for r in rows], pa.int64()
            ),
            "n_nodes": pa.array([r[2] for r in rows], pa.int64()),
            "n_edges": pa.array([r[3] for r in rows], pa.int64()),
            "edges_per_node_ppm": pa.array(
                [r[4] for r in rows], pa.int64()
            ),
        }
    )


def link_core_numbers(sf_dir: str, driver_max_edges: int = 2_000_000,
                      max_k: int = 8):
    """Full k-core decomposition of the undirected hyperlink graph:
    (page, core_number) where core_number(v) = the largest k whose
    k-core still contains v (0 for nodes whose every neighbor peels
    away at k=1 — dangling-only endpoints keep core 1 via their one
    edge). The per-node coreness is THE standard web-graph centrality
    for crawl prioritization (denser shells first).

    Tiers: under ``driver_max_edges`` the textbook iterative peel runs
    on numpy adjacency (O(E · max_core)); above it, the Dataset path
    calls :func:`graph.kcore_distributed` for k = 1..``max_k`` and
    takes the largest k that kept each node (few shells; each peel is
    the independently-pinned distributed kernel). The SQL twin unrolls
    the same per-k peels."""
    import numpy as np

    edges = link_graph(sf_dir).materialize()
    _named = pa.schema([("subj", pa.int64()), ("obj", pa.int64())])

    def to_named(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _named.empty_table()
        return pa.table({"subj": t["src"], "obj": t["dst"]},
                        schema=_named)

    n_edges = edges.count()
    if n_edges > driver_max_edges:
        from autoner_ray.stages.graph import kcore_distributed

        named = edges.map_batches(
            to_named, batch_format="pyarrow"
        ).materialize()
        core: dict[int, int] = {}
        for k in range(1, max_k + 1):
            kept = kcore_distributed(named, k=k)
            kt = kept.to_pandas() if not isinstance(kept, pa.Table) else (
                kept.to_pandas()
            )
            if len(kt) == 0:
                break
            for node in kt["entity"]:
                core[int(node)] = k
        nodes = sorted(core)
        return pa.table(
            {
                "page": pa.array(nodes, pa.int64()),
                "core_number": pa.array(
                    [core[n] for n in nodes], pa.int64()
                ),
            }
        )

    df = edges.to_pandas()
    s = df["src"].to_numpy(np.int64)
    d = df["dst"].to_numpy(np.int64)
    nodes, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
    a = inv[: len(s)].astype(np.int64)
    b = inv[len(s):].astype(np.int64)
    # dedup unordered pairs
    n = len(nodes)
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    pair = np.unique(lo * np.int64(n) + hi)
    pu = (pair // n).astype(np.int64)
    pv = (pair % n).astype(np.int64)
    deg = np.zeros(n, np.int64)
    np.add.at(deg, pu, 1)
    np.add.at(deg, pv, 1)
    alive_edge = np.ones(len(pu), bool)
    core_no = np.zeros(n, np.int64)
    k = 1
    while alive_edge.any():
        # peel at k: repeatedly drop nodes with degree < k
        while True:
            weak = deg < k
            drop = alive_edge & (weak[pu] | weak[pv])
            if not drop.any():
                break
            np.subtract.at(deg, pu[drop], 1)
            np.subtract.at(deg, pv[drop], 1)
            alive_edge &= ~drop
        survivors = np.unique(
            np.concatenate([pu[alive_edge], pv[alive_edge]])
        )
        core_no[survivors] = k
        k += 1
        if k > max_k:
            break
    return pa.table(
        {
            "page": pa.array(nodes[core_no > 0], pa.int64()),
            "core_number": pa.array(core_no[core_no > 0], pa.int64()),
        }
    )


def link_hits(sf_dir: str, iters: int = 8, scale: int = 1_000_000):
    """Kleinberg HITS over the DIRECTED hyperlink graph — hub scores
    for pages that point at good authorities and authority scores for
    pages good hubs point at, on the exact integer lattice of
    ``graph.hits_lattice`` (L1 floor-normalization per iteration; the
    SQL twin replays the identical HUGEINT arithmetic). Output
    (page, kind, score) with kind in {hub, authority}; a page can
    carry both rows.

    Scale shape: the parsed edge list is already globally distinct;
    the lattice matvec runs on the aggregated edge table (the
    vocab-bounded default of the hits family, with the
    join-per-step Dataset variant the documented unbounded path)."""
    from autoner_ray.stages.graph import hits_lattice

    _b_schema = pa.schema(
        [("src", pa.string()), ("ent", pa.string()), ("w", pa.int64())]
    )

    def to_bipartite(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _b_schema.empty_table()
        return pa.table(
            {
                "src": t["src"].cast(pa.string()),
                "ent": t["dst"].cast(pa.string()),
                "w": pa.array([1] * len(t), pa.int64()),
            },
            schema=_b_schema,
        )

    out = hits_lattice(
        link_graph(sf_dir).map_batches(
            to_bipartite, batch_format="pyarrow"
        ),
        iters=iters, scale=scale,
    )
    return pa.table(
        {
            "page": out["node"].cast(pa.int64()),
            "kind": out["kind"],
            "score": out["score"],
        }
    )


def link_indegree_gini(sf_dir: str):
    """Attention-inequality (Gini) profile of hyperlink in-degrees —
    the "how concentrated is the link economy" number beside the
    degree histogram and rich-club rows. One row
    (n_docs, total, rank_val_sum, gini_ppm) over pages ranked by
    ascending (in_degree, page); reuses the exact distributed ranking
    pass of ``ranking.gini_inequality`` — per-dst counts come from the
    dst-partitioned combine, nothing node-set-sized on the driver."""
    import numpy as np

    from autoner_ray.stages.combine import partitioned_key_sum
    from autoner_ray.stages.ranking import gini_inequality

    _d_schema = pa.schema([("page", pa.int64()), ("deg", pa.int64())])

    def count_partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _d_schema.empty_table()
        vals, counts = np.unique(
            t["dst"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {
                "page": pa.array(vals, pa.int64()),
                "deg": pa.array(counts.astype(np.int64), pa.int64()),
            },
            schema=_d_schema,
        )

    per_dst = partitioned_key_sum(
        link_graph(sf_dir).map_batches(
            count_partial, batch_format="pyarrow", batch_size=65536
        ),
        keys=["page"], sum_cols=["deg"], part_on=("page",),
    )
    return gini_inequality(per_dst, "page", "deg")


def link_mis(sf_dir: str, driver_max_edges: int = 2_000_000,
             max_rounds: int = 12):
    """Maximal independent set of the undirected hyperlink graph via
    deterministic Luby rounds (:func:`graph.luby_mis`) — the
    symmetry-breaking primitive behind distributed page-coloring /
    landmark selection. (page, in_mis) for every linked page."""
    from autoner_ray.stages.graph import luby_mis

    def to_named(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.schema(
                [("subj", pa.int64()), ("obj", pa.int64())]
            ).empty_table()
        return pa.table({"subj": t["src"], "obj": t["dst"]})

    return luby_mis(
        link_graph(sf_dir).map_batches(to_named, batch_format="pyarrow"),
        max_rounds=max_rounds, driver_max_edges=driver_max_edges,
    )


def link_edgecut(sf_dir: str, num_shards: int = 16):
    """Partitioning-quality census for the materialized adjacency
    shards: with pages assigned to ``num_shards`` shards by the
    deterministic Knuth hash (``(page * 2654435761) % 2^31 %
    num_shards`` — the same arithmetic the SQL twin applies), report
    per shard-pair class how the edges land: (cut, n_edges) with cut=0
    for intra-shard edges and 1 for cross-shard ones, plus per-shard
    load rows (shard, n_src_edges) — the numbers a layout planner
    reads before choosing hash vs range vs METIS-style placement.
    Output (kind, key, n): kind='cut' key in {0,1}; kind='load'
    key=shard id.

    Scale shape: stateless vectorized map over the edge stream +
    bounded combine (2 + num_shards keys)."""
    import numpy as np

    from autoner_ray.stages.combine import bounded_key_sum

    _schema = pa.schema(
        [("kind", pa.string()), ("key", pa.int64()),
         ("n", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _schema.empty_table()
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        hs = (s * 2654435761) % (1 << 31) % num_shards
        hd = (d * 2654435761) % (1 << 31) % num_shards
        cut = (hs != hd).astype(np.int64)
        kinds, keys, ns = [], [], []
        for c in (0, 1):
            kinds.append("cut")
            keys.append(c)
            ns.append(int((cut == c).sum()))
        binc = np.bincount(hs, minlength=num_shards)
        for sh in range(num_shards):
            kinds.append("load")
            keys.append(sh)
            ns.append(int(binc[sh]))
        return pa.table(
            {
                "kind": pa.array(kinds, pa.string()),
                "key": pa.array(keys, pa.int64()),
                "n": pa.array(ns, pa.int64()),
            },
            schema=_schema,
        )

    return bounded_key_sum(
        link_graph(sf_dir).map_batches(partial, batch_format="pyarrow"),
        keys=["kind", "key"], sum_cols=["n"],
    )


def link_neighbor_sample(sf_dir: str, k: int = 3):
    """GraphSAGE-style 2-hop neighborhood sampling over the undirected
    hyperlink graph — the data-prep step a GNN trainer consumes, made
    DETERMINISTIC so the twin can verify it: each node's hop-1 sample
    is its k neighbors with the smallest ``((u*31 + v) * 2654435761)
    % 2147483647`` edge hash (ties -> smallest neighbor id); the hop-2
    sample is the UNION of the hop-1 samples of those neighbors, minus
    the root and its own hop-1 set. Output (node, hop, nb) rows.

    Scale shape: one groupby on the node for the per-node top-k (rows
    carried are (node, nb, h) — 24 bytes), one cogroup join expands
    hop-2 (volume <= k^2 per node), one distinct pass; no driver
    state. The SQL twin ranks with ROW_NUMBER over the identical hash
    expression."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from ray.data.aggregate import Max

    from autoner_ray.stages.joins import cogroup_join

    edges = link_graph(sf_dir).materialize()

    _n_schema = pa.schema([("node", pa.int64()), ("nb", pa.int64())])

    def bidir(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _n_schema.empty_table()
        return pa.table(
            {
                "node": pa.chunked_array(
                    t["src"].chunks + t["dst"].chunks
                ),
                "nb": pa.chunked_array(
                    t["dst"].chunks + t["src"].chunks
                ),
            },
            schema=_n_schema,
        )

    _s_cols = ["node", "nb"]

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        u = df["node"].to_numpy(np.int64)
        v = df["nb"].to_numpy(np.int64)
        h = ((u * 31 + v) * 2654435761) % 2147483647
        o = np.lexsort((v, h))[:k]
        return pd.DataFrame({"node": u[o], "nb": v[o]})

    s1 = (
        edges.map_batches(bidir, batch_format="pyarrow")
        .groupby("node")
        .map_groups(topk, batch_format="pandas")
        .materialize()
    )

    # hop-2 expand: join s1's neighbor column onto s1's node column
    def as_mid(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.schema(
                [("nb", pa.int64()), ("node2", pa.int64())]
            ).empty_table()
        return pa.table({"nb": t["node"], "node2": t["nb"]})

    expanded = cogroup_join(
        s1, s1.map_batches(as_mid, batch_format="pyarrow"),
        on=("nb",),
    )

    def hop2_rows(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _n_schema.empty_table()
        keep = pc.not_equal(t["node"], t["node2"])
        return pa.table(
            {
                "node": t["node"].filter(keep),
                "nb": t["node2"].filter(keep),
            },
            schema=_n_schema,
        )

    h2_raw = (
        expanded.map_batches(hop2_rows, batch_format="pyarrow")
        .groupby(["node", "nb"])
        .aggregate(Max("nb", alias_name="_m"))
        .select_columns(["node", "nb"])
    )
    # anti-join: drop hop-2 rows already in the hop-1 sample
    s1_tag = s1.map_batches(
        lambda t: t.append_column(
            "in1", pa.array([1] * len(t), pa.int64())
        )
        if len(t) else pa.schema(
            [("node", pa.int64()), ("nb", pa.int64()),
             ("in1", pa.int64())]
        ).empty_table(),
        batch_format="pyarrow",
    )
    h2 = cogroup_join(
        h2_raw, s1_tag, on=("node", "nb"), join_type="left outer"
    ).map_batches(
        lambda t: pa.table(
            {
                "node": t["node"].filter(pc.is_null(t["in1"])),
                "nb": t["nb"].filter(pc.is_null(t["in1"])),
            },
            schema=_n_schema,
        )
        if len(t) else _n_schema.empty_table(),
        batch_format="pyarrow",
    )

    _o_schema = pa.schema(
        [("node", pa.int64()), ("hop", pa.int64()), ("nb", pa.int64())]
    )

    def with_hop(hop):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or len(t) == 0:
                return _o_schema.empty_table()
            return pa.table(
                {
                    "node": t["node"],
                    "hop": pa.array([hop] * len(t), pa.int64()),
                    "nb": t["nb"],
                },
                schema=_o_schema,
            )

        return fn

    return s1.map_batches(with_hop(1), batch_format="pyarrow").union(
        h2.map_batches(with_hop(2), batch_format="pyarrow")
    )


def link_bipartite_check(sf_dir: str, driver_max_edges: int = 2_000_000):
    """Bipartiteness / odd-cycle census of the undirected hyperlink
    graph — the 2-colorability question behind crawl frontier
    partitioning and conflict-free scheduling: color every node by the
    PARITY of its shortest-hop distance from its component's root (the
    component's smallest node id — both well-defined and
    deterministic), then count edges whose endpoints share a parity;
    zero conflicts <=> the graph is bipartite. One row:
    (n_edges, n_parity_conflicts, is_bipartite).

    Tiers (the :func:`scc` contract): numpy BFS parity under
    ``driver_max_edges``; above it, min-label distributed CC supplies
    one root per component as a DATASET of seeds (never a driver
    list — components can be corpus-scale) into the multi-seed
    ``bfs_distances(sources_ds=..., to_fixpoint=True)`` fixpoint, and
    two cogroup joins stamp each edge's endpoint parities. The SQL
    twin runs the same parity arithmetic over a depth-capped recursive
    closure (cap 96 — beyond any real link-graph eccentricity; a
    deeper graph fails loudly via the value-hash)."""
    import numpy as np
    from collections import deque

    edges = link_graph(sf_dir).materialize()
    n_edges = edges.count()

    _named = pa.schema([("subj", pa.int64()), ("obj", pa.int64())])

    def to_named(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _named.empty_table()
        return pa.table({"subj": t["src"], "obj": t["dst"]},
                        schema=_named)

    def counts_row(conflicts: int) -> pa.Table:
        return pa.table(
            {
                "n_edges": pa.array([n_edges], pa.int64()),
                "n_parity_conflicts": pa.array([conflicts], pa.int64()),
                "is_bipartite": pa.array(
                    [1 if conflicts == 0 else 0], pa.int64()
                ),
            }
        )

    if n_edges <= driver_max_edges:
        df = edges.to_pandas()
        s = df["src"].to_numpy(np.int64)
        d = df["dst"].to_numpy(np.int64)
        nodes, inv = np.unique(np.concatenate([s, d]),
                               return_inverse=True)
        u = inv[: len(s)]
        v = inv[len(s):]
        adj: dict[int, list[int]] = {}
        for a, b in zip(u, v):
            adj.setdefault(int(a), []).append(int(b))
            adj.setdefault(int(b), []).append(int(a))
        dist = np.full(len(nodes), -1, np.int64)
        for start in range(len(nodes)):  # ascending = per-component min
            if dist[start] >= 0:
                continue
            dist[start] = 0
            q = deque([start])
            while q:
                x = q.popleft()
                for y in adj.get(x, ()):
                    if dist[y] < 0:
                        dist[y] = dist[x] + 1
                        q.append(y)
        conflicts = int(((dist[u] % 2) == (dist[v] % 2)).sum())
        return counts_row(conflicts)

    # ---- distributed tier
    import pyarrow.compute as pc

    from autoner_ray.stages.graph import (
        bfs_distances,
        connected_components_distributed,
    )
    from autoner_ray.stages.joins import cogroup_join

    named = edges.map_batches(to_named, batch_format="pyarrow")
    labels = connected_components_distributed(
        named, as_dataset=True
    ).materialize()
    roots = labels.filter(expr="src == label").select_columns(["src"])
    dist = bfs_distances(
        named, sources_ds=roots, to_fixpoint=True
    ).materialize()

    def dist_as(colname):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or len(t) == 0:
                return pa.schema(
                    [(colname, pa.int64()),
                     (f"p_{colname}", pa.int64())]
                ).empty_table()
            return pa.table(
                {
                    colname: t["entity"],
                    f"p_{colname}": pc.bit_wise_and(
                        t["dist"], pa.scalar(1, pa.int64())
                    ),
                }
            )

        return fn

    e1 = cogroup_join(
        edges.map_batches(
            lambda t: pa.table({"src": t["src"], "dst": t["dst"]})
            if len(t) else pa.schema(
                [("src", pa.int64()), ("dst", pa.int64())]
            ).empty_table(),
            batch_format="pyarrow",
        ),
        dist.map_batches(dist_as("src"), batch_format="pyarrow"),
        on=("src",),
    )
    e2 = cogroup_join(
        e1, dist.map_batches(dist_as("dst"), batch_format="pyarrow"),
        on=("dst",),
    )

    def conflict_partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table({"c": pa.array([], pa.int64())})
        eq = pc.equal(t["p_src"], t["p_dst"])
        return pa.table(
            {"c": pa.array([int(pc.sum(pc.cast(eq, pa.int64())).as_py()
                            or 0)], pa.int64())}
        )

    conflicts = sum(
        r["c"] for r in e2.map_batches(
            conflict_partial, batch_format="pyarrow"
        ).take_all()
    )
    return counts_row(int(conflicts))


def link_kcenter_landmarks(sf_dir: str, k: int = 4,
                           driver_max_edges: int = 2_000_000):
    """Greedy farthest-first k-center landmark selection over the
    undirected hyperlink graph — the classic 2-approximation every
    landmark-embedding / routing-sketch pipeline starts with, made
    deterministic: landmark 1 is the smallest node id; each next
    landmark is the node FARTHEST (shortest-hop distance) from the
    current landmark set, unreachable nodes counting as infinitely far
    (ties -> smallest id). Output (rank, page, dist_when_chosen) with
    dist -1 standing for "unreachable from the previous set" (the
    disconnected-component pick).

    Tiers (the :func:`scc` contract): numpy multi-source BFS under
    ``driver_max_edges``; above it k-1 multi-seed BFS fixpoints
    (:func:`graph.bfs_distances` ``sources=... to_fixpoint=True`` —
    seed list is the k-bounded landmark set, safely broadcast); the
    argmax each round is a tiny (max dist, min id) aggregate, never a
    node-set materialization. The SQL twin unrolls the same k-1
    capped-closure BFS rounds."""
    import numpy as np

    from ray.data.aggregate import Max, Min

    from autoner_ray.stages.graph import bfs_distances

    edges = link_graph(sf_dir).materialize()

    if edges.count() <= driver_max_edges:
        from collections import deque

        df = edges.to_pandas()
        s = df["src"].to_numpy(np.int64)
        d = df["dst"].to_numpy(np.int64)
        nodes, inv = np.unique(np.concatenate([s, d]),
                               return_inverse=True)
        u = inv[: len(s)]
        v = inv[len(s):]
        adj: dict[int, list[int]] = {}
        for a, b in zip(u, v):
            adj.setdefault(int(a), []).append(int(b))
            adj.setdefault(int(b), []).append(int(a))
        lms = [0]  # index of min node (nodes sorted ascending)
        dd = [0]
        for _ in range(k - 1):
            dist = np.full(len(nodes), -1, np.int64)
            q = deque(lms)
            for x in lms:
                dist[x] = 0
            while q:
                x = q.popleft()
                for y in adj.get(x, ()):
                    if dist[y] < 0:
                        dist[y] = dist[x] + 1
                        q.append(y)
            unreached = np.nonzero(dist < 0)[0]
            if len(unreached):
                pick = int(unreached[0])  # nodes ascending -> min id
                lms.append(pick)
                dd.append(-1)
                continue
            dmax = int(dist.max())
            cand = np.nonzero(dist == dmax)[0]
            pick = int(cand[0])
            lms.append(pick)
            dd.append(dmax)
        return pa.table(
            {
                "rank": pa.array(range(1, len(lms) + 1), pa.int64()),
                "page": pa.array(
                    [int(nodes[i]) for i in lms], pa.int64()
                ),
                "dist_when_chosen": pa.array(dd, pa.int64()),
            }
        )

    _named = pa.schema([("subj", pa.int64()), ("obj", pa.int64())])

    def to_named(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _named.empty_table()
        return pa.table({"subj": t["src"], "obj": t["dst"]},
                        schema=_named)

    named = edges.map_batches(to_named, batch_format="pyarrow")
    first = int(
        min(edges.min("src"), edges.min("dst"))
    )
    landmarks = [first]
    dists = [0]
    # node universe is loop-invariant — build it ONCE, not per round
    total_nodes = (
        named.map_batches(
            lambda t: pa.table(
                {
                    "src": pa.chunked_array(
                        t["subj"].chunks + t["obj"].chunks
                    )
                }
            )
            if len(t) else pa.schema(
                [("src", pa.int64())]
            ).empty_table(),
            batch_format="pyarrow",
        )
        .groupby("src")
        .aggregate(Max("src", alias_name="_m"))
        .select_columns(["src"])
        .materialize()
    )
    n_total = total_nodes.count()
    for _ in range(k - 1):
        dist = bfs_distances(
            named, sources=list(landmarks), to_fixpoint=True
        ).materialize()
        # candidate 1: unreachable node (not in dist) -> smallest id
        reached = dist.count()
        if n_total > reached:
            # anti-join: smallest unreached id
            import pyarrow.compute as pc2

            from autoner_ray.stages.joins import cogroup_join

            tagged = dist.map_batches(
                lambda t: pa.table(
                    {"src": t["entity"],
                     "r": pa.array([1] * len(t), pa.int64())}
                )
                if len(t) else pa.schema(
                    [("src", pa.int64()), ("r", pa.int64())]
                ).empty_table(),
                batch_format="pyarrow",
            )
            unreached_min = (
                cogroup_join(total_nodes, tagged, on=("src",),
                             join_type="left outer")
                .map_batches(
                    lambda t: pa.table(
                        {"src": t["src"].filter(pc2.is_null(t["r"]))}
                    )
                    if len(t) else pa.schema(
                        [("src", pa.int64())]
                    ).empty_table(),
                    batch_format="pyarrow",
                )
                .min("src")
            )
            landmarks.append(int(unreached_min))
            dists.append(-1)
            continue
        # farthest reached node; tie -> smallest id at the max dist
        dmax = dist.max("dist")
        pick = (
            dist.filter(expr=f"dist == {int(dmax)}")
            .min("entity")
        )
        landmarks.append(int(pick))
        dists.append(int(dmax))
    return pa.table(
        {
            "rank": pa.array(range(1, len(landmarks) + 1), pa.int64()),
            "page": pa.array(landmarks, pa.int64()),
            "dist_when_chosen": pa.array(dists, pa.int64()),
        }
    )
