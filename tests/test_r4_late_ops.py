"""Brute-force equivalence pins for the late round-4 operators:
partitioned_key_agg (re-associative min across split batches),
new_users_daily, lang_hot_ngrams, grid_histogram, clustering_coeff."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_partitioned_key_agg_min_across_blocks(ray_session):
    """Min combine must be exact when one key's rows are split across
    many input blocks (the re-association contract)."""
    import ray

    from autoner_ray.stages.combine import partitioned_key_agg

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 50, size=2000)
    vals = rng.integers(-10**9, 10**9, size=2000)
    tables = [
        pa.table(
            {
                "k": pa.array(keys[i:i + 100], pa.int64()),
                "v": pa.array(vals[i:i + 100], pa.int64()),
            }
        )
        for i in range(0, 2000, 100)
    ]
    ds = ray.data.from_arrow(tables)
    got = (
        partitioned_key_agg(ds, ["k"], [("v", "min")], part_on=("k",))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame({"k": keys, "v": vals})
        .groupby("k", as_index=False)["v"]
        .min()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_new_users_daily_bruteforce(ray_session):
    import ray

    from autoner_ray.stages.windows import new_users_daily

    events = pd.read_parquet(f"{SF}/events.parquet")
    got = new_users_daily(
        ray.data.read_parquet(f"{SF}/events.parquet")
    ).to_pandas().sort_values("day").reset_index(drop=True)

    first = events.groupby("user_id")["ts"].min().dt.floor("D")
    want = (
        first.value_counts().sort_index().rename("new_users").to_frame()
    )
    want["cum_users"] = want["new_users"].cumsum()
    want = want.reset_index(names="day")
    pd.testing.assert_frame_equal(
        got, want.astype({"new_users": "int64", "cum_users": "int64"})
    )


def test_lang_hot_ngrams_bruteforce(ray_session):
    import ray

    from autoner_ray.stages.webtext import lang_hot_ngrams

    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    n, min_df, k = 3, 2, 10
    got = lang_hot_ngrams(
        ray.data.read_parquet(
            f"{SF}/documents.parquet",
            columns=["doc_id", "lang", "text"],
        ),
        n=n, min_df=min_df, k=k,
    ).to_pandas()

    rows = []
    for _, r in docs.iterrows():
        ws = (r["text"] or "").split(" ")
        for i in range(len(ws) - n + 1):
            rows.append((r["lang"], " ".join(ws[i:i + n]), r["doc_id"]))
    df = pd.DataFrame(rows, columns=["lang", "gram", "doc_id"])
    agg = (
        df.groupby(["lang", "gram"])
        .agg(n_occurrences=("doc_id", "size"), n_docs=("doc_id", "nunique"))
        .reset_index()
    )
    agg = agg[agg["n_docs"] >= min_df]
    agg = agg.sort_values(
        ["lang", "n_occurrences", "gram"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    want = agg.groupby("lang", sort=False).head(k).reset_index(drop=True)

    key = ["lang", "gram", "n_occurrences", "n_docs"]
    got = got[key].sort_values(key).reset_index(drop=True)
    want = want[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_occurrences": "int64", "n_docs": "int64"}), want
    )


def test_grid_histogram_bruteforce(ray_session):
    import ray

    from autoner_ray.stages.similarity import grid_histogram

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    got = (
        grid_histogram(ray.data.read_parquet(f"{SF}/embeddings.parquet"))
        .to_pandas()
        .sort_values(["gx", "gy"])
        .reset_index(drop=True)
    )
    mat = np.array(emb["embedding"].tolist(), dtype=np.float64)
    want = (
        pd.DataFrame(
            {
                "gx": np.floor(mat[:, 0] * 4).astype(np.int64),
                "gy": np.floor(mat[:, 1] * 4).astype(np.int64),
            }
        )
        .value_counts()
        .rename("n")
        .reset_index()
        .sort_values(["gx", "gy"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want.astype({"n": "int64"}))


def test_clustering_coeff_bruteforce(ray_session):
    """cc_ppm against a dense-adjacency numpy reference on a small
    random graph."""
    import ray

    from autoner_ray.stages.graph import clustering_coeff

    rng = np.random.default_rng(11)
    n_nodes = 30
    adj = np.triu(rng.random((n_nodes, n_nodes)) < 0.25, k=1)
    subj, obj = np.nonzero(adj)
    names = np.array([f"e{i:02d}" for i in range(n_nodes)])
    edges = pa.table(
        {
            "subj": pa.array(names[subj]),
            "obj": pa.array(names[obj]),
        }
    )
    got = (
        clustering_coeff(ray.data.from_arrow(edges))
        .to_pandas()
        .sort_values("entity")
        .reset_index(drop=True)
    )

    A = (adj | adj.T).astype(np.int64)
    deg = A.sum(axis=1)
    tri = np.diag(A @ A @ A) // 2
    keep = deg >= 2
    want = pd.DataFrame(
        {
            "entity": names[keep],
            "deg": deg[keep],
            "triangles": tri[keep],
            "cc_ppm": (tri[keep] * 2_000_000) // (deg[keep] * (deg[keep] - 1)),
        }
    ).sort_values("entity").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({c: "int64" for c in ["deg", "triangles", "cc_ppm"]}),
        want,
    )


def test_time_weighted_avg_bruteforce(ray_session):
    import ray

    from autoner_ray.stages.windows import time_weighted_avg

    events = pd.read_parquet(f"{SF}/events.parquet")
    got = (
        time_weighted_avg(ray.data.read_parquet(f"{SF}/events.parquet"))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )

    rows = []
    for uid, g in events.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        if len(g) < 2:
            continue
        c = np.floor(g["value"].to_numpy(float) * 100 + 0.5).astype(
            np.int64
        )
        t = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        dt = t[1:] - t[:-1]
        rows.append(
            (uid, int(((c[1:] + c[:-1]) * dt).sum()), int(2 * dt.sum()))
        )
    want = pd.DataFrame(
        rows, columns=["user_id", "twa_num", "twa_den"]
    ).sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64")
    )


def test_bigram_collocations_tiers_agree(ray_session):
    """Broadcast-vocab and cogroup-join tiers produce identical
    collocation tables."""
    import ray

    from autoner_ray.stages.webtext import bigram_collocations

    def rows(broadcast_max_vocab):
        ds = ray.data.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        )
        df = bigram_collocations(
            ds, broadcast_max_vocab=broadcast_max_vocab
        ).to_pandas()
        return df.sort_values("gram").reset_index(drop=True)

    a, b = rows(2_000_000), rows(0)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 20


def test_pagerank_personalized_bruteforce(ray_session):
    """Seeded power iteration against a dense numpy reference."""
    import ray

    from autoner_ray.stages.graph import pagerank_personalized

    rng = np.random.default_rng(3)
    n_nodes = 12
    adj = np.triu(rng.random((n_nodes, n_nodes)) < 0.4, k=1)
    subj, obj = np.nonzero(adj)
    w = rng.integers(1, 5, size=len(subj))
    names = np.array([f"e{i:02d}" for i in range(n_nodes)])
    edges = pa.table(
        {
            "subj": pa.array(names[subj]),
            "obj": pa.array(names[obj]),
            "weight": pa.array(w, pa.int64()),
        }
    )
    got = pagerank_personalized(
        ray.data.from_arrow(edges)
    ).to_pandas().set_index("entity")["rank"]

    W = np.zeros((n_nodes, n_nodes))
    W[subj, obj] = w
    W = W + W.T
    deg = W.sum(axis=1)
    keep = deg > 0
    M = np.zeros_like(W)
    M[keep] = (W[keep].T / deg[keep]).T  # row-stochastic
    kept_names = names[keep]
    e_s = np.zeros(n_nodes)
    e_s[np.argmax(keep)] = 1.0  # lexicographic min = first kept node
    r = e_s.copy()
    for _ in range(20):
        r = 0.15 * e_s + 0.85 * (M.T @ r)
    for i, name in enumerate(names):
        if keep[i]:
            assert abs(got[name] - round(float(r[i]), 6)) < 2e-6, name
    assert abs(got.sum() - 1.0) < 1e-4  # probability mass conserved


def test_text_format_roundtrip_fidelity(ray_session, tmp_path):
    """JSONL and CSV sinks/sources preserve tricky strings (quotes,
    commas, unicode, embedded newlines) and int typing exactly."""
    import ray

    from autoner_ray.sources import text_formats as tf

    tricky = [
        'plain',
        'comma, inside',
        'quote " double',
        "quote ' single",
        'tab\tinside',
        'newline\ninside',
        'unicode é中文',
        '',
    ]
    src = pa.table(
        {
            "doc_id": pa.array(range(len(tricky)), pa.int64()),
            "text": pa.array(tricky, pa.string()),
        }
    )
    want = src.to_pandas().sort_values("doc_id").reset_index(drop=True)

    ds = ray.data.from_arrow(src)
    tf.write_jsonl(ds, str(tmp_path / "j"))
    got_j = (
        tf.read_jsonl(str(tmp_path / "j")).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_j, want)

    tf.write_csv(ds, str(tmp_path / "c"))
    got_c = (
        tf.read_csv(str(tmp_path / "c")).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    # pyarrow CSV reads empty strings back as null — the one documented
    # CSV lossiness; everything else must round-trip exactly
    got_c["text"] = got_c["text"].fillna("")
    pd.testing.assert_frame_equal(got_c, want)


def test_length_gini_bruteforce(ray_session):
    import ray

    from autoner_ray.stages.ranking import gini_inequality

    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    got = gini_inequality(
        ray.data.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]
        ),
        "doc_id", "n_chars",
    ).to_pandas()

    d = docs.sort_values(["n_chars", "doc_id"], kind="mergesort")
    v = d["n_chars"].to_numpy(np.int64)
    n = len(v)
    tot = int(v.sum())
    s = int((np.arange(1, n + 1, dtype=np.int64) * v).sum())
    gini = ((2 * s - (n + 1) * tot) * 1_000_000) // (n * tot)
    assert got.iloc[0].tolist() == [n, tot, s, gini]
    assert 0 <= gini < 1_000_000


def test_winnowing_guarantee_and_tiebreak():
    """Every length-w window of gram hashes contains a selected position
    (the winnowing coverage guarantee) and ties pick the RIGHTMOST min."""
    from autoner_ray.stages.analysis import _winnow_positions

    rng = np.random.default_rng(7)
    for trial in range(50):
        n = int(rng.integers(1, 40))
        w = int(rng.integers(1, 6))
        # small value range to force ties
        grams = rng.integers(0, 5, size=n).astype(np.uint64)
        sel = _winnow_positions(grams, w)
        assert len(np.unique(sel)) == len(sel)
        if n <= w:
            mn = grams.min()
            assert len(sel) == 1
            # rightmost occurrence of the min
            assert sel[0] == np.flatnonzero(grams == mn).max()
        else:
            for start in range(n - w + 1):
                window = np.arange(start, start + w)
                hit = np.intersect1d(sel, window)
                assert len(hit) > 0, (trial, start)
            # each selected pos is the rightmost min of SOME window
            for p in sel:
                ok = False
                for start in range(max(0, p - w + 1),
                                   min(p, n - w) + 1):
                    win = grams[start:start + w]
                    mn = win.min()
                    if grams[p] == mn and (
                        p - start == np.flatnonzero(win == mn).max()
                    ):
                        ok = True
                        break
                assert ok, (trial, p)


def test_poly_gram_hash_matches_rolling_short_doc():
    """Short-doc (< k tokens) winnowing hash equals rolling_fingerprint's
    whole-doc hash — the two fingerprint families agree on the base case."""
    from autoner_ray.stages.analysis import (
        _poly_gram_hashes,
        rolling_fingerprint,
    )

    text = "alpha beta gamma"
    hs = _poly_gram_hashes(text.split(" "), k=8)
    assert len(hs) == 1
    assert f"{hs[0]:016x}" == rolling_fingerprint(text, window=8)


def test_kcore_tier_equality():
    """Driver-peel and Dataset-resident k-core agree on the thresholded
    bigram graph (the distributed tier is the at-scale default path)."""
    import ray

    from autoner_ray.stages.graph import kcore, kcore_distributed
    from autoner_ray.stages.webtext import bigram_graph

    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    edges = bigram_graph(docs, min_count=75).materialize()
    drv = (
        kcore(edges, k=2).to_pandas()
        .sort_values("entity").reset_index(drop=True)
    )
    dist = (
        kcore_distributed(edges, k=2).to_pandas()
        .sort_values("entity").reset_index(drop=True)
    )
    assert len(drv) > 0  # the fixture graph has a non-empty 2-core
    pd.testing.assert_frame_equal(drv, dist)


def test_dau_wau_bruteforce(ray_session):
    """Windowed distinct: DAU/WAU/stickiness vs a pandas brute force
    (a user active twice in the window must count once)."""
    import ray

    from autoner_ray.stages.windows import dau_wau_stickiness

    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "user_id"])
    got = dau_wau_stickiness(
        ray.data.read_parquet(f"{SF}/events.parquet")
    ).to_pandas()

    days = ev["ts"].dt.floor("D").dt.date
    du = pd.DataFrame({"d": days, "u": ev["user_id"]}).drop_duplicates()
    dau = du.groupby("d").size()
    rows = []
    for d, n in dau.items():
        lo = d - pd.Timedelta(days=6).to_pytimedelta()
        wau = du[(du["d"] >= lo) & (du["d"] <= d)]["u"].nunique()
        rows.append((d, int(n), int(wau), int(n) * 1_000_000 // wau))
    exp = pd.DataFrame(
        rows, columns=["day", "dau", "wau", "stickiness_ppm"]
    ).sort_values("day").reset_index(drop=True)
    got = got.sort_values("day").reset_index(drop=True)
    assert got["day"].tolist() == exp["day"].tolist()
    for c in ["dau", "wau", "stickiness_ppm"]:
        assert got[c].tolist() == exp[c].tolist(), c


def test_rfm_ntile_tiebreak(ray_session):
    """RFM quartiles: deterministic NTILE tie-break (value desc,
    custkey asc) against a numpy reimplementation."""
    from autoner_ray.pipelines.relational import customer_rfm_segments

    got = (
        customer_rfm_segments(SF).to_pandas()
        .sort_values("o_custkey").reset_index(drop=True)
    )
    o = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    cents = np.floor(o["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(
        np.int64
    )
    per = (
        pd.DataFrame(
            {
                "o_custkey": o["o_custkey"],
                "last": o["o_orderdate"],
                "cents": cents,
                "n": 1,
            }
        )
        .groupby("o_custkey")
        .agg(last=("last", "max"), n=("n", "sum"), cents=("cents", "sum"))
        .reset_index()
    )

    def ntile(vals, keys, n=4):
        order = np.lexsort((keys, -vals))  # vals desc, then key asc
        m = len(vals)
        out = np.empty(m, np.int64)
        base, rem = divmod(m, n)
        sizes = [base + (1 if i < rem else 0) for i in range(n)]
        pos = 0
        for b, sz in enumerate(sizes, 1):
            out[order[pos:pos + sz]] = b
            pos += sz
        return out

    exp = (
        pd.DataFrame(
            {
                "o_custkey": per["o_custkey"],
                "r_quartile": ntile(
                    per["last"].astype("int64").to_numpy(),
                    per["o_custkey"].to_numpy(),
                ),
                "f_quartile": ntile(
                    per["n"].to_numpy(), per["o_custkey"].to_numpy()
                ),
                "m_quartile": ntile(
                    per["cents"].to_numpy(), per["o_custkey"].to_numpy()
                ),
            }
        )
        .sort_values("o_custkey")
        .reset_index(drop=True)
    )
    assert got["o_custkey"].tolist() == exp["o_custkey"].tolist()
    for c in ["r_quartile", "f_quartile", "m_quartile"]:
        assert got[c].tolist() == exp[c].tolist(), c
    assert (
        got["rfm_segment"]
        == "R" + got["r_quartile"].astype(str)
        + "F" + got["f_quartile"].astype(str)
        + "M" + got["m_quartile"].astype(str)
    ).all()


def test_bigram_bfs_tier_equality(ray_session):
    """Driver BFS and the Dataset-resident multi-seed loop agree on the
    thresholded bigram graph."""
    import ray

    from autoner_ray.stages.webtext import bigram_bfs_multi

    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    drv = (
        bigram_bfs_multi(docs).to_pandas()
        .sort_values("entity").reset_index(drop=True)
    )
    docs2 = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    dist = (
        bigram_bfs_multi(docs2, driver_max_edges=0).to_pandas()
        .sort_values("entity").reset_index(drop=True)
    )
    assert len(drv) > 0
    pd.testing.assert_frame_equal(drv, dist)


def test_paragraph_dedup_bruteforce(ray_session):
    """Chunk-level first-wins dedup + reassembly matches a pandas
    brute force on a corpus with a full-duplicate doc, a partial
    repeat, and an all-repeats doc (which must vanish)."""
    import ray

    from autoner_ray.stages.dedup import paragraph_dedup

    W = 3
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "a b c d e f",          # two chunks: abc, def
                "a b c x y z",          # first chunk repeats doc 1
                "a b c d e f",          # full duplicate -> vanishes
                "p q r",                # unique single chunk
            ],
        }
    )
    got = (
        paragraph_dedup(ray.data.from_pandas(docs), words_per_chunk=W)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # brute force
    seen: dict[str, tuple[int, int]] = {}
    rows = []
    for d, t in zip(docs["doc_id"], docs["text"]):
        ws = t.split(" ")
        chunks = [
            " ".join(ws[i : i + W]) for i in range(0, len(ws), W)
        ]
        for c_i, c in enumerate(chunks):
            if c not in seen:
                seen[c] = (d, c_i)
    for d, t in zip(docs["doc_id"], docs["text"]):
        ws = t.split(" ")
        chunks = [
            " ".join(ws[i : i + W]) for i in range(0, len(ws), W)
        ]
        kept = [
            c for c_i, c in enumerate(chunks) if seen[c] == (d, c_i)
        ]
        if kept:
            rows.append(
                {
                    "doc_id": d,
                    "text": " ".join(kept),
                    "n_chunks": len(chunks),
                    "n_kept": len(kept),
                }
            )
    exp = pd.DataFrame(rows).reset_index(drop=True)
    got["doc_id"] = got["doc_id"].astype("int64")
    pd.testing.assert_frame_equal(
        got[["doc_id", "text", "n_chunks", "n_kept"]].astype(
            {"n_chunks": "int64", "n_kept": "int64"}
        ),
        exp.astype({"n_chunks": "int64", "n_kept": "int64"}),
    )
    assert 3 not in got["doc_id"].tolist()


def test_pack_sequences_bruteforce(ray_session):
    """Range-bucketed packing matches a single-process prefix-sum on a
    corpus sized to force bins that straddle range boundaries."""
    import ray

    from autoner_ray.stages.ranking import pack_sequences

    rng = np.random.default_rng(11)
    n = 3000
    keys = np.arange(n, dtype=np.int64)
    w = rng.integers(1, 40, size=n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": keys, "n_tok": w})
    ).repartition(7)
    got = (
        pack_sequences(ds, "doc_id", "n_tok", bin_size=257,
                       num_ranges=5)
        .to_pandas()
        .sort_values("seq_id")
        .reset_index(drop=True)
    )
    prev = np.cumsum(w) - w
    seq = prev // 257
    exp = (
        pd.DataFrame(
            {"seq_id": seq, "one": 1, "w": w, "k": keys}
        )
        .groupby("seq_id", sort=True)
        .agg(
            n_docs=("one", "sum"),
            n_tokens=("w", "sum"),
            first_key=("k", "min"),
            last_key=("k", "max"),
        )
        .reset_index()
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


def test_kmeans_lattice_three_iterations(ray_session):
    """The unrolled SQL twin generalizes beyond the driver default:
    engine and DuckDB agree at n_iter=3 / k=3 too."""
    import duckdb
    import ray

    from autoner_ray.stages.similarity import (
        kmeans_lattice,
        kmeans_lattice_oracle_sql,
    )

    sf = SF
    got = (
        kmeans_lattice(
            ray.data.read_parquet(f"{sf}/embeddings.parquet"),
            k=3, n_iter=3,
        )
        .to_pandas()
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf}/embeddings.parquet'"
    )
    exp = (
        con.execute(kmeans_lattice_oracle_sql(k=3, n_iter=3))
        .df()
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64")
    )


def test_ktruss_tier_equality(ray_session):
    """Driver-peel and Dataset-resident k-truss agree on the bigram
    collocation graph — including a config where peeling actually
    removes edges round over round (mc=50, k=20 peels 393->369 at
    sf0.001). The distributed tier is the at-scale default path."""
    import ray

    from autoner_ray.stages.graph import ktruss, ktruss_distributed
    from autoner_ray.stages.webtext import bigram_graph

    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    edges = bigram_graph(docs, min_count=50).materialize()

    def canon(df):
        lo = np.minimum(df["subj"], df["obj"])
        hi = np.maximum(df["subj"], df["obj"])
        out = pd.DataFrame(
            {"subj": lo, "hi": hi, "support": df["support"]}
        ).rename(columns={"hi": "obj"})
        return out.sort_values(["subj", "obj"]).reset_index(drop=True)

    drv = canon(ktruss(edges, k=20, rounds=3).to_pandas())
    dist = canon(
        ktruss_distributed(edges, k=20, rounds=3).to_pandas()
    )
    assert len(drv) > 0  # survivors exist after 3 peel rounds
    assert len(drv) < edges.count()  # and peeling removed edges
    pd.testing.assert_frame_equal(drv, dist)


def test_knn_pq_matches_single_process(ray_session):
    """Distributed PQ-ADC top-k equals a one-process recompute of the
    same deterministic contract (lattice codebooks, int64 ADC lookup,
    vec_id-ascending tiebreak), and the codebooks it searches with are
    exactly _pq_train's."""
    import ray

    from autoner_ray.stages.similarity import (
        _pq_quantized,
        _pq_sub_assign,
        _pq_train,
        knn_pq,
    )

    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    full = emb.to_pandas().sort_values("vec_id").reset_index(drop=True)
    q = np.asarray(full["embedding"].iloc[7], dtype=np.float64)

    got = knn_pq(emb, q, k_top=10, m=4, kc=16, n_iter=2).to_pandas()

    cents = _pq_train(emb, m=4, k=16, n_iter=2)
    sub = cents.shape[2]
    qi = np.floor(q * 1048576.0 + 0.5).astype(np.int64)
    lut = np.stack(
        [((qi[ms * sub:(ms + 1) * sub][None] - cents[ms]) ** 2).sum(1)
         for ms in range(4)]
    )
    qv = _pq_quantized(
        pa.table(
            {
                "embedding": pa.array(
                    list(full["embedding"]), pa.list_(pa.float32())
                )
            }
        )
    )
    labs, _ = _pq_sub_assign(qv, cents)
    dist = sum(lut[ms][labs[:, ms]] for ms in range(4))
    ids = full["vec_id"].to_numpy(np.int64)
    order = np.lexsort((ids, dist))[:10]
    exp = pd.DataFrame(
        {"vec_id": ids[order], "adc_dist": dist[order]}
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)
    assert (got["adc_dist"].to_numpy() >= 0).all()


def test_hits_lattice_hand_computed(ray_session):
    import ray

    from autoner_ray.stages.graph import hits_lattice

    # two hubs, two auths: s1 -(3)-> e1, s1 -(1)-> e2, s2 -(1)-> e2
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(["s1", "s1", "s2"]),
                "ent": pa.array(["e1", "e2", "e2"]),
                "w": pa.array([3, 1, 1], pa.int64()),
            }
        )
    )
    got = (
        hits_lattice(edges, iters=1, scale=1_000_000)
        .to_pandas()
        .set_index("node")
    )
    # iter 1: a_raw = {e1: 3M, e2: 2M}, total 5M
    #         a = {e1: 600000, e2: 400000}
    # h_raw = {s1: 3*600000 + 400000 = 2.2M, s2: 400000}, total 2.6M
    # h = floor(2.2M*1M/2.6M)=846153, floor(0.4M*1M/2.6M)=153846
    assert got.loc["e1", "score"] == 600_000
    assert got.loc["e2", "score"] == 400_000
    assert got.loc["s1", "score"] == 846_153
    assert got.loc["s2", "score"] == 153_846
    assert set(got["kind"]) == {"hub", "authority"}


def test_q12_band_clamp_and_inner_join(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from autoner_ray.pipelines import relational

    days = lambda d: pa.scalar(d * 86_400_000_000).cast(
        pa.timestamp("us")
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_orderdate": pa.array(
                [days(0).as_py(), days(0).as_py(), days(0).as_py()],
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(
                ["1-URGENT", "5-LOW", "2-HIGH"]
            ),
        }
    )
    # lags: +2000d (clamps to band 4), -1000d (band -4 via clamp:
    # floor(-1000/180) = -6 -> -4), 10d (band 0); orderkey 9 is absent
    # from orders -> dropped (inner-join semantics)
    line = pa.table(
        {
            "l_orderkey": pa.array([1, 2, 3, 9], pa.int64()),
            "l_shipdate": pa.array(
                [
                    days(2000).as_py(),
                    days(-1000).as_py(),
                    days(10).as_py(),
                    days(1).as_py(),
                ],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(orders, f"{tmp_path}/orders.parquet")
    pq.write_table(line, f"{tmp_path}/lineitem.parquet")
    for tier in (10, 1):  # broadcast tier, then cogroup tier
        got = (
            relational.q12_priority_shipping_lag(
                str(tmp_path), broadcast_max_rows=tier
            )
            .to_pandas()
            .set_index("lag_band")
            .sort_index()
        )
        assert list(got.index) == [-4, 0, 4]
        assert got.loc[4, "high_lines"] == 1  # urgent, +2000d
        assert got.loc[-4, "low_lines"] == 1  # 5-LOW, -1000d
        assert got.loc[0, "high_lines"] == 1  # 2-HIGH, 10d
        assert int(got["high_lines"].sum() + got["low_lines"].sum()) == 3


def test_ntriples_roundtrip_and_window_cooc_bruteforce(ray_session):
    from collections import Counter

    from autoner_ray.pipelines.kg import (
        parse_ntriples_batch,
        unigram_ntriples,
        unigram_triples,
    )
    from autoner_ray.stages.webtext import window_cooccurrence

    # N-Triples serialize -> parse is the identity on the edge list
    nt = unigram_ntriples(SF).to_pandas()
    back = (
        parse_ntriples_batch(pa.Table.from_pandas(nt))
        .to_pandas()
        .sort_values(["subj", "obj"])
        .reset_index(drop=True)
    )
    edges = (
        unigram_triples(SF)
        .to_pandas()
        .sort_values(["subj", "obj"])
        .reset_index(drop=True)
    )
    assert (back["pred"] == "cooccurs_with").all()
    pd.testing.assert_frame_equal(
        back[["subj", "obj", "weight"]],
        edges[["subj", "obj", "weight"]].astype(
            {"weight": back["weight"].dtype}
        ),
    )

    # window co-occurrence vs a per-doc python brute force
    import ray
    import ray.data as rd

    docs = rd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    got = Counter()
    for _, r in window_cooccurrence(docs, window=3).to_pandas().iterrows():
        got[(r["word_a"], r["word_b"])] = int(r["n"])
    want = Counter()
    for t in docs.to_pandas()["text"]:
        toks = (t or "").split(" ")
        for i in range(len(toks)):
            for j in range(i + 1, min(i + 3, len(toks) - 1) + 1):
                a, b = toks[i], toks[j]
                if a != b and a and b:
                    want[(min(a, b), max(a, b))] += 1
    assert got == want


def test_linear_probe_exact_vs_numpy_lstsq(ray_session):
    """The integer Cramer solve agrees with float lstsq to float
    precision, and scores are the exact floor-scaled plane."""
    import ray.data as rd

    from autoner_ray.stages.analysis import linear_probe_mention

    docs = rd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    got = linear_probe_mention(docs).to_pandas()
    assert len(got) == 500 and set(got["y"].unique()) <= {0, 1}
    # float reference fit
    df = docs.to_pandas()
    feats = []
    from autoner_ray.dicts import UNIGRAM_DICT

    for _, r in df.iterrows():
        toks = [w for w in (r["text"] or "").split(" ") if w]
        feats.append(
            (
                r["doc_id"],
                len(toks),
                sum(len(w) for w in toks),
                int(any(w in UNIGRAM_DICT for w in toks)),
            )
        )
    f = pd.DataFrame(feats, columns=["doc_id", "x1", "x2", "y"])
    X = np.column_stack(
        [np.ones(len(f)), f["x1"].to_numpy(), f["x2"].to_numpy()]
    )
    w, *_ = np.linalg.lstsq(X, f["y"].to_numpy(float), rcond=None)
    pred = X @ w
    g = got.set_index("doc_id").loc[f["doc_id"]]
    assert np.abs(g["score_milli"].to_numpy() / 1000.0 - pred).max() < 2e-3


def test_ipc_roundtrip_identity(ray_session, tmp_path):
    import ray.data as rd

    from autoner_ray.sources.text_formats import read_ipc, write_ipc

    docs = rd.read_parquet(f"{SF}/documents.parquet")
    write_ipc(docs, str(tmp_path / "ipc"))
    back = (
        read_ipc(str(tmp_path / "ipc"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    orig = docs.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[orig.columns.tolist()], orig)
