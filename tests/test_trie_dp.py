"""Unit tests for the KB trie + segmentDP parity quirks (SURVEY.md §5)."""

from autoner_ray.functions.ck import get_boundary, get_types, to_ck
from autoner_ray.state.trie import (
    FILTERED_TYPE,
    KBTrie,
    build_trie,
    segment_dp,
)


def mk_trie(core, full=(), stop=()):
    return build_trie(list(core), list(full), list(stop))


def test_insert_case_variants():
    t = mk_trie(["Disease\theart attack"])
    assert t.get_type_from_kb(["heart", "attack"]) == "Disease"
    assert t.get_type_from_kb(["HEART", "ATTACK"]) == "Disease"
    assert t.get_type_from_kb(["heart", "ATTACK"]) == ""


def test_no_lowercases_for_per_org_loc():
    t = mk_trie(["PER\tJohn Smith"])
    assert t.get_type_from_kb(["John", "Smith"]) == "PER"
    assert t.get_type_from_kb(["JOHN", "SMITH"]) == "PER"
    # all-lower variant NOT inserted for PER (src/annotation.h:195)
    assert t.get_type_from_kb(["john", "smith"]) == ""


def test_multi_type_accumulation():
    t = mk_trie(["Chemical\tlead", "Disease\tlead"])
    # std::set byte order -> "Chemical,Disease" (src/annotation.h:162-178)
    assert t.get_type_from_kb(["lead"]) == "Chemical,Disease"


def test_filtered_does_not_override_entity():
    t = mk_trie(["Disease\tfever"], full=["fever"])
    u = t.get_child(0, "fever")
    assert t.is_entity(u) and not t.is_filtered(u)


def test_full_dict_uses_last_core_row_flag():
    # bug-compat: last core row PER -> full dict gets NO lowercase variant
    t = mk_trie(["Disease\tfever", "PER\tJohn"], full=["Big Phrase"])
    assert t.in_kb(["Big", "Phrase"])
    assert t.in_kb(["BIG", "PHRASE"])
    assert not t.in_kb(["big", "phrase"])  # noLowercasesForThisKB leaked
    # and with a non-PER last row the lowercase variant IS inserted
    t2 = mk_trie(["PER\tJohn", "Disease\tfever"], full=["Big Phrase"])
    assert t2.in_kb(["big", "phrase"])


def test_stopword_removal_three_variants():
    t = mk_trie(["Disease\tthe"], full=["The"], stop=["the"])
    assert not t.in_kb(["the"])
    assert not t.in_kb(["THE"])
    assert not t.in_kb(["The"])
    assert "the" in t.stopword_set


def test_stopword_set_empty_during_kb_load():
    # bin/generate order: loadKB BEFORE cleanStopwords (annotation.h:235-243)
    # so the stopword-escalation branch at :197-204 never fires.
    t = mk_trie(["Disease\tof fever"], stop=["of"])
    # lowercase variant present because noLowercases stayed False
    assert t.in_kb(["of", "fever"])


def test_segment_dp_prefers_longer_match():
    t = mk_trie(["Disease\theart attack", "Organ\theart"])
    segs = segment_dp(t, ["heart", "attack"])
    assert segs == [(0, 2, "Disease")]


def test_segment_dp_skip_and_match():
    t = mk_trie(["Disease\tfever"])
    segs = segment_dp(t, ["a", "fever", "b"])
    assert segs == [(0, 1, ""), (1, 2, "Disease"), (2, 3, "")]


def test_segment_dp_never_crosses_sentinel():
    t = mk_trie(["Disease\theart attack"])
    segs = segment_dp(t, ["heart", "\n", "attack"])
    assert all(ty == "" for _, _, ty in segs)


def test_segment_dp_filtered_weight():
    t = mk_trie(["Disease\tfever"], full=["big phrase"])
    segs = segment_dp(t, ["big", "phrase"])
    assert segs == [(0, 2, FILTERED_TYPE)]


def test_segment_dp_overlap_resolution():
    # "x y" core (len²=4) vs "y z" core (4): DP picks one tiling;
    # earliest-computed candidate wins ties via strict inequality.
    t = mk_trie(["A\tx y", "B\ty z"])
    segs = segment_dp(t, ["x", "y", "z"])
    # trace of the C++ loop: at i=1 the B match sets f[3]=4 (tb=(1,B));
    # at i=2 the skip transition f[2](=4) > f[3](=4) is strict and fails,
    # so traceback keeps B: [skip x][y z:B]
    assert segs == [(0, 1, ""), (1, 3, "B")]


def test_boundary_filtered_inclusive_r():
    # FILTERED span [1,3) marks boundary 0 at 1,2 AND 3 (annotation.h:278-280)
    raw = ["a", "big", "phrase", "tail"]
    segs = [(0, 1, ""), (1, 3, FILTERED_TYPE), (3, 4, "")]
    assert get_boundary(raw, segs) == [1, 0, 0, 0]
    assert get_types(raw, segs) == ["None"] * 4


def test_boundary_entity():
    raw = ["heart", "attack", "x"]
    segs = [(0, 2, "Disease"), (2, 3, "")]
    assert get_boundary(raw, segs) == [1, -1, 1]
    assert get_types(raw, segs) == ["Disease", "Disease", "None"]


def test_to_ck_format():
    raw = ["fever", "\n", "big", "phrase"]
    segs = [(0, 1, "Disease"), (1, 2, ""), (2, 4, FILTERED_TYPE)]
    ck = to_ck(raw, segs)
    assert ck == (
        "<s> O None S\n"
        "fever I Disease S\n"
        "<eof> I None S\n"
        "\n\n"
        "<s> O None S\n"
        "big O None D\n"
        "phrase O None D\n"
    )


def test_per_sentence_equals_whole_corpus():
    """Sentence-parallel decomposition == the reference's whole-corpus DP."""
    t = mk_trie(["Disease\theart attack", "Chemical\tlithium"], full=["big phrase"])
    corpus = [
        "heart", "attack", "x", "\n",
        "big", "phrase", "\n",
        "lithium", "\n",
    ]
    whole = segment_dp(t, corpus)

    # split into sentences incl. their trailing sentinel positions
    parts = []
    start = 0
    for idx, tok in enumerate(corpus):
        if tok == "\n":
            if idx > start:
                segs = segment_dp(t, corpus[start:idx])
                parts.extend((l + start, r + start, ty) for l, r, ty in segs)
            parts.append((idx, idx + 1, ""))
            start = idx + 1
    if start < len(corpus):
        segs = segment_dp(t, corpus[start:])
        parts.extend((l + start, r + start, ty) for l, r, ty in segs)
    assert parts == whole


def test_segment_dp_tiling_property():
    """Property: for ANY token sequence, segments tile [0, n) exactly —
    sorted, contiguous, non-overlapping — and sentinel tokens are never
    inside a typed segment."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from autoner_ray.dicts import CORE_DICT, FULL_DICT, STOPWORDS
    from autoner_ray.state.trie import build_trie, segment_dp

    trie = build_trie(list(CORE_DICT), list(FULL_DICT), list(STOPWORDS))
    vocab = ["hash", "join", "order", "batch", "big", "data", "the",
             "a", "xyz", "\n", "spark", "customer"]

    @given(st.lists(st.sampled_from(vocab), max_size=30))
    @settings(max_examples=200, deadline=None)
    def check(tokens):
        segs = segment_dp(trie, tokens)
        pos = 0
        for l, r, ty in segs:
            assert l == pos and r > l
            pos = r
            if ty:
                assert "\n" not in tokens[l:r]
        assert pos == len(tokens)

    check()
