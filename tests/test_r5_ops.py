"""Round-5 operator edge cases: chunked substring dedup, passage
chunking, training-sequence packing."""

import pyarrow as pa
import ray.data as rd


def _docs(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    ).repartition(2)


def test_substring_dedup_first_wins_and_within_doc(ray_session):
    """First occurrence (smallest doc_id, then chunk idx) keeps; a
    WITHIN-doc repeat also counts as removed; docs shorter than a
    chunk emit no row."""
    from autoner_ray.stages.dedup import substring_dedup_census

    a40 = "a" * 40
    b40 = "b" * 40
    rows = [
        (1, a40 + b40),          # chunks: a40(idx0, wins), b40(idx1, wins)
        (2, b40 + a40 + a40),    # all three removed (b40 loses to doc1;
                                 # a40 both lose to doc1 idx0)
        (3, "short"),            # < 40 chars: no row
    ]
    out = {
        r["doc_id"]: r
        for r in substring_dedup_census(_docs(rows)).take_all()
    }
    assert set(out) == {1, 2}
    assert out[1]["n_chunks"] == 2 and out[1]["n_removed"] == 0
    assert out[2]["n_chunks"] == 3 and out[2]["n_removed"] == 3
    assert out[2]["chars_after"] == 120 - 3 * 40


def test_substring_dedup_within_doc_only(ray_session):
    """A doc repeating its own chunk keeps the first occurrence."""
    from autoner_ray.stages.dedup import substring_dedup_census

    c40 = "c" * 40
    out = substring_dedup_census(
        _docs([(7, c40 + c40 + c40)])
    ).take_all()
    assert out[0]["n_chunks"] == 3 and out[0]["n_removed"] == 2


def test_passage_chunks_boundaries(ray_session):
    """len == window -> 1 chunk; len == window+1 -> 2 (second clipped);
    empty text -> one zero-length chunk."""
    from autoner_ray.stages.analysis import passage_chunks

    rows = [(1, "x" * 200), (2, "y" * 201), (3, "")]
    got = {}
    for r in passage_chunks(_docs(rows)).take_all():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_char"], r["end_char"])
        )
    assert got[1] == [(0, 0, 200)]
    assert sorted(got[2]) == [(0, 0, 200), (1, 150, 201)]
    assert got[3] == [(0, 0, 0)]


def test_training_pack_split_count(ray_session):
    """Docs straddling a 512-token boundary are counted; totals and
    sequence counts are exact."""
    from autoner_ray.stages.analysis import training_pack_census

    def words(n):
        return " ".join(["w"] * n)

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [words(500), words(100), words(436)], pa.string()
                ),
                "source": pa.array(["s"] * 3, pa.string()),
            }
        )
    )
    row = training_pack_census(ds).take_all()[0]
    # stream: doc1 [0,499], doc2 [500,599] (straddles 511|512),
    # doc3 [600,1035] (straddles 1023|1024)
    assert row["n_docs"] == 3
    assert row["total_tokens"] == 1036
    assert row["n_sequences"] == 3
    assert row["n_docs_split"] == 2


def test_heavy_hitters_exact_and_spread_word_found(ray_session):
    """A word spread THIN across every batch (never locally heavy at
    the full threshold, but above threshold/slack) is still found with
    its exact count — the pigeonhole guarantee; rare words are not."""
    from autoner_ray.stages.analysis import heavy_hitter_words

    # 10 docs x 100 tokens = 1000 tokens; threshold = 1/200 -> n >= 5.
    # "hh" appears once per doc (10 total, spread thin); "rare" 4x.
    docs = []
    for i in range(10):
        filler = [f"u{i}_{j}" for j in range(98)]
        toks = ["hh"] + filler + (["rare"] if i < 4 else ["pad"])
        docs.append((i, " ".join(toks)))
    out = {
        r["word"]: r["n"]
        for r in heavy_hitter_words(_docs(docs)).take_all()
    }
    assert out.get("hh") == 10
    assert "rare" not in out
    assert all(n * 200 >= 1000 for n in out.values())


def test_dsir_weights_favor_target_lang(ray_session, tmp_path):
    """Docs made of target-language-only words score higher than docs
    of words absent from the target slice."""
    import pyarrow.parquet as pq

    from autoner_ray.stages.analysis import dsir_importance

    rows = [
        (1, "alpha beta alpha beta", "en"),
        (2, "alpha beta beta alpha", "fr"),   # target-ish words, non-en
        (3, "gamma delta gamma delta", "fr"),  # words never in target
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )
    out = {
        r["doc_id"]: r["dsir_microweight"]
        for r in dsir_importance(ds).take_all()
    }
    assert out[2] > out[3]          # target-aligned vocab wins
    assert out[1] == out[2]         # weight depends on words, not lang


def test_hard_negatives_excludes_same_label(ray_session, tmp_path):
    """The mined negative is the most-similar DIFFERENT-label vector
    even when a same-label vector is closer; all-same-label corpora
    emit no rows."""
    import pyarrow.parquet as pq

    from autoner_ray.stages.similarity import hard_negatives

    vecs = [
        ([1.0, 0.0, 0.0], 0),   # 0: query
        ([0.99, 0.14, 0.0], 0),  # 1: closest overall, SAME label
        ([0.9, 0.43, 0.0], 1),   # 2: closest different-label
        ([0.0, 1.0, 0.0], 1),    # 3
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [v for v, _ in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([l for _, l in vecs], pa.int32()),
            }
        ),
        f"{tmp_path}/embeddings.parquet",
    )
    out = {
        r["vec_id"]: r for r in hard_negatives(str(tmp_path)).take_all()
    }
    assert out[0]["neg_id"] == 2 and out[0]["neg_label"] == 1
    assert out[1]["neg_id"] == 2


def test_snapshot_diff_statuses(ray_session):
    """doc_id 0: A-absent -> added (0%5==0 mutation irrelevant);
    1: B-absent -> removed; 5: in both, text mutated -> changed;
    2: in both, same -> unchanged."""
    from autoner_ray.stages.webtext import snapshot_diff

    rows = [(0, "t0"), (1, "t1"), (2, "t2"), (5, "t5")]
    out = {
        r["doc_id"]: r["status"]
        for r in snapshot_diff(_docs(rows)).take_all()
    }
    assert out == {0: "added", 1: "removed", 2: "unchanged",
                   5: "changed"}


def _edges_named(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "subj": pa.array([a for a, _ in pairs], pa.int64()),
                "obj": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
    ).repartition(2)


def test_luby_mis_properties_and_tier_equality(ray_session):
    """MIS output is independent (no edge inside the set), maximal
    (every out-node has an in-neighbor), and the distributed tier
    matches the driver tier exactly."""
    import numpy as np

    from autoner_ray.stages.graph import luby_mis

    rng = np.random.default_rng(23)
    n = 40
    pairs = {tuple(sorted(rng.choice(n, 2, replace=False)))
             for _ in range(80)}
    pairs = [(int(a), int(b)) for a, b in pairs]
    drv = luby_mis(_edges_named(pairs))
    got = {r["page"]: r["in_mis"] for r in drv.to_pylist()}

    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # independence
    for a, b in pairs:
        assert not (got[a] == 1 and got[b] == 1), (a, b)
    # maximality
    for v, nbrs in adj.items():
        if got[v] == 0:
            assert any(got[u] == 1 for u in nbrs), v

    dist = luby_mis(_edges_named(pairs), driver_max_edges=0)
    got_d = {r["page"]: r["in_mis"] for r in dist.take_all()}
    assert got_d == got


def test_image_dhash_invariance_and_pairs():
    """dHash is invariant to container roundtrip, within 2 bits of a
    one-pixel perturbation, and far from an unrelated image."""
    import numpy as np

    from autoner_ray.stages.multimodal import (
        decode_bmp,
        encode_bmp,
        encode_ppm,
        decode_ppm,
        image_dhash,
    )

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    h0 = image_dhash(px)
    assert image_dhash(decode_bmp(encode_bmp(px))) == h0
    assert image_dhash(decode_ppm(encode_ppm(px))) == h0

    vx = px.copy()
    vx[0, 0, 0] ^= 0x80
    hv = image_dhash(vx)
    assert bin((h0 & (2**64 - 1)) ^ (hv & (2**64 - 1))).count("1") <= 2

    other = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    ho = image_dhash(other)
    assert bin((h0 & (2**64 - 1)) ^ (ho & (2**64 - 1))).count("1") > 10


def test_link_bipartite_tiers_and_semantics(ray_session, monkeypatch):
    """Driver and distributed tiers agree on a graph mixing an odd
    cycle, a bipartite even cycle, and a disconnected edge; the odd
    cycle forces >= 1 parity conflict."""
    import numpy as np
    import pyarrow.compute as _pc

    from autoner_ray.stages import webgraph as wg

    # triangle {1,2,3} (odd), square {10,11,12,13} (even),
    # island edge {20,21}
    edges = [(1, 2), (2, 3), (1, 3),
             (10, 11), (11, 12), (12, 13), (10, 13),
             (20, 21)]

    def fake_link_graph(sf_dir):
        return rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([a for a, _ in edges], pa.int64()),
                    "dst": pa.array([b for _, b in edges], pa.int64()),
                }
            )
        ).repartition(2)

    monkeypatch.setattr(wg, "link_graph", fake_link_graph)
    drv = wg.link_bipartite_check("ignored").to_pylist()[0]
    dist = wg.link_bipartite_check(
        "ignored", driver_max_edges=0
    ).to_pylist()[0]
    assert drv == dist
    assert drv["n_edges"] == len(edges)
    assert drv["is_bipartite"] == 0
    assert drv["n_parity_conflicts"] >= 1


def test_kcenter_tier_equality(ray_session, monkeypatch):
    """Driver and distributed k-center tiers agree, including the
    disconnected-component pick (dist -1)."""
    from autoner_ray.stages import webgraph as wg

    # path 1-2-3-4-5 plus island {50, 51}
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (50, 51)]

    def fake_link_graph(sf_dir):
        return rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([a for a, _ in edges], pa.int64()),
                    "dst": pa.array([b for _, b in edges], pa.int64()),
                }
            )
        ).repartition(2)

    monkeypatch.setattr(wg, "link_graph", fake_link_graph)
    drv = wg.link_kcenter_landmarks("x", k=3).to_pylist()
    dist = wg.link_kcenter_landmarks(
        "x", k=3, driver_max_edges=0
    ).to_pylist()
    assert drv == dist
    assert drv[0] == {"rank": 1, "page": 1, "dist_when_chosen": 0}
    # island unreachable from node 1 -> second pick is min island node
    assert drv[1] == {"rank": 2, "page": 50, "dist_when_chosen": -1}
    # now everything reachable; farthest from {1, 50} is node 5 (d 4)
    assert drv[2] == {"rank": 3, "page": 5, "dist_when_chosen": 4}


def test_luby_mis_self_loop_excluded(ray_session):
    """A self-loop-only node is excluded from the universe on BOTH
    tiers (matching the SQL twin, which never sees self-loop edges)."""
    from autoner_ray.stages.graph import luby_mis

    pairs = [(1, 2), (3, 3)]
    drv = {r["page"]: r["in_mis"]
           for r in luby_mis(_edges_named(pairs)).to_pylist()}
    dist = {r["page"]: r["in_mis"]
            for r in luby_mis(_edges_named(pairs),
                              driver_max_edges=0).take_all()}
    assert drv == dist
    assert set(drv) == {1, 2}  # node 3 (self-loop only) not reported
