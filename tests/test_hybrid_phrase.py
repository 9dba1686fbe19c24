"""Hybrid (dict ∪ neural) mention union and the M9 phrase-markup parser."""

from __future__ import annotations

import pyarrow as pa

ARTIFACT = "/root/repo/autoner_ray/artifacts/tagger_demo.npz"


def test_phrase_markup_parser():
    from autoner_ray.functions.phrase_markup import parse_phrase_markup
    from autoner_ray.state.trie import FILTERED_TYPE, build_trie

    trie = build_trie(
        ["Operator\thash join", "System\tspark"], ["big data"], []
    )
    line = "run <phrase>hash join</phrase> on <phrase>big data</phrase> now"
    tokens, segments = parse_phrase_markup(line, trie)
    assert tokens == ["run", "hash", "join", "on", "big", "data", "now"]
    seg_map = {(l, r): t for l, r, t in segments}
    assert seg_map[(1, 3)] == "Operator"        # KB hit -> typed
    assert seg_map[(4, 6)] == FILTERED_TYPE     # full-dict only -> filtered
    assert seg_map[(0, 1)] == "" and seg_map[(6, 7)] == ""
    # all tokens covered exactly once
    covered = sorted((l, r) for l, r, _ in segments)
    pos = 0
    for l, r in covered:
        assert l == pos
        pos = r
    assert pos == len(tokens)


def test_phrase_markup_multi_type_sorted():
    from autoner_ray.functions.phrase_markup import parse_phrase_markup
    from autoner_ray.state.trie import build_trie

    trie = build_trie(["B,A\torder"], [], [])
    tokens, segments = parse_phrase_markup("<phrase>order</phrase>", trie)
    assert segments == [(0, 1, "A,B")]  # set-sorted comma join


def test_hybrid_triples_superset_of_dict(ray_session):
    """Union mentions can only add entities — every dict edge survives
    with weight >= the dict-only weight."""
    from autoner_ray.dicts import CORE_DICT, FULL_DICT, STOPWORDS
    from autoner_ray.pipelines.kg import sentences_dataset, triples_dataset
    from autoner_ray.stages.tagger_stage import hybrid_triples

    sf = "/root/testdata/sf0.001"
    with open(ARTIFACT, "rb") as f:
        blob = f.read()
    dict_edges = {
        (r.subj, r.obj): r.weight
        for r in triples_dataset(sf, concurrency=2)
        .to_pandas()
        .itertuples(index=False)
    }
    hybrid = {
        (r.subj, r.obj): r.weight
        for r in hybrid_triples(
            sentences_dataset(sf), blob, CORE_DICT, FULL_DICT, STOPWORDS,
            concurrency=2,
        )
        .to_pandas()
        .itertuples(index=False)
    }
    assert dict_edges  # non-trivial fixture
    for edge, w in dict_edges.items():
        assert hybrid.get(edge, 0) >= w
