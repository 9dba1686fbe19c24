"""v2 tagger arch (reference default): stacked bi-LSTM + highway +
label-dim projection heads (`model_partial_ner/ner.py:36-174`,
`highway.py:59-67`, `basic.py:33-35`), softCE with the model's own
masked softmax as target (`object.py:16-67`), DS_GOLD_MIXED record
mixing (`dataset.py:383`).
"""

from __future__ import annotations

import numpy as np
import pytest

from autoner_ray.state.tagger import (
    Tagger,
    build_vocabs,
    encode_sentence,
    mixed_records,
    segments_from_gold_labels,
    segments_to_slots,
    soft_ce,
    soft_ce_rows,
    spans_from_segments,
    token_budget_batches,
)


def test_soft_ce_reference_target_and_gradient():
    """Target is the model's own masked softmax (object.py:36-47) and the
    gradient matches finite differences (reference does NOT detach)."""
    rng = np.random.default_rng(0)
    for khot in ([1, 0, 1, 0, 0], [0, 1, 0, 0, 0], [1, 1, 1, 0, 1]):
        khot = np.array(khot, np.float32)
        s = rng.normal(size=5)
        loss, grad = soft_ce(s, khot)
        # reference target: exp(s)*khot renormalized — for a one-hot
        # mask this is plain CE; multi-type masks weight by the model
        m = s.max()
        tgt = khot * np.exp(s - m)
        tgt /= tgt.sum()
        logp = s - (m + np.log(np.exp(s - m).sum()))
        assert abs(loss - float(-(tgt * logp).sum())) < 1e-9
        eps = 1e-6
        for k in range(5):
            sp, sm = s.copy(), s.copy()
            sp[k] += eps
            sm[k] -= eps
            fd = (soft_ce(sp, khot)[0] - soft_ce(sm, khot)[0]) / (2 * eps)
            assert abs(fd - grad[k]) < 1e-6


def test_soft_ce_rows_matches_scalar():
    rng = np.random.default_rng(1)
    K = np.array([[1, 0, 1], [0, 1, 0]], np.float32)
    S = rng.normal(size=(2, 3))
    loss, grads = soft_ce_rows(S, K)
    per = [soft_ce(S[i], K[i]) for i in range(2)]
    assert abs(loss - np.mean([p[0] for p in per])) < 1e-9
    for i in range(2):
        assert np.allclose(grads[i], per[i][1] / 2, atol=1e-6)


def _tiny_setup():
    sents = [["alpha", "beta", "gamma"], ["beta", "delta"], ["x"]]
    types = [["T"], ["U"], []]
    c_map, w_map, tl_map = build_vocabs(sents, types, char_min_count=0)
    segs = [
        [(0, 2, "T"), (2, 3, "")],
        [(0, 1, "U"), (1, 2, "__FILTERED__")],
        [(0, 1, "")],
    ]
    batch = []
    for toks, sg in zip(sents, segs):
        ci, wi, slots = encode_sentence(toks, c_map, w_map)
        brk, known = segments_to_slots(len(toks), sg)
        batch.append(
            (ci, wi, slots, brk, known, spans_from_segments(sg, tl_map))
        )
    return sents, batch, (c_map, w_map, tl_map)


def test_v2_train_reduces_loss_and_roundtrips():
    sents, batch, maps = _tiny_setup()
    tg = Tagger(*maps, arch="lstm", char_dim=8, word_dim=8, hidden=16,
                layers=2, label_dim=10, seed=5)
    rng = np.random.default_rng(2)
    state = None
    losses = []
    for _ in range(30):
        loss, state = tg.train_batch_v2(
            batch, lr=5e-3, droprate=0.0, adam_state=state, rng=rng
        )
        losses.append(loss)
    assert losses[-1] < losses[0] * 0.7
    # persistence roundtrip preserves arch + predictions
    blob = tg.to_bytes()
    tg2 = Tagger.from_bytes(blob)
    assert tg2.arch == "lstm"
    p1, s1, x1 = tg.predict_batch(sents, with_chunk_stats=True)
    p2, s2, x2 = tg2.predict_batch(sents, with_chunk_stats=True)
    assert p1 == p2 and s1 == s2 and x1 == x2
    assert s1 <= x1


def test_v2_chunk_stats_sentinels():
    _, _, maps = _tiny_setup()
    tg = Tagger(*maps, arch="lstm", char_dim=8, word_dim=8, hidden=16,
                layers=1, label_dim=10)
    preds, smin, smax = tg.predict_batch([], with_chunk_stats=True)
    assert preds == [] and smin == float("inf") and smax == float("-inf")


def test_mixed_records_gold_always_kept():
    distant = [("d", i) for i in range(1000)]
    gold = [("g", i) for i in range(10)]
    out = mixed_records(distant, gold, sample_ratio=0.25, seed=1)
    n_gold = sum(1 for r in out if r[0] == "g")
    n_dist = sum(1 for r in out if r[0] == "d")
    assert n_gold == 10  # dataset.py:383 — gold is never sampled away
    assert 150 < n_dist < 350
    # ratio 1.0 keeps everything
    assert len(mixed_records(distant, gold, 1.0)) == 1010


def test_segments_from_gold_labels():
    # tokens: A B C D ; gold: [A B]=T, C=None, D=U
    labels = [(1, "T"), (0, "T"), (1, "None"), (1, "U")]
    segs = segments_from_gold_labels(labels)
    assert segs == [(0, 2, "T"), (2, 3, ""), (3, 4, "U")]


def test_v2_learns_tiny_task():
    """End-to-end: the v2 arch learns a separable toy tagging task."""
    sents = [["aa", "bb"], ["cc", "dd"], ["aa", "dd"], ["cc", "bb"]] * 4
    types = [["T"]] * len(sents)
    c_map, w_map, tl_map = build_vocabs(sents, types, char_min_count=0)
    segs = [[(0, 1, "T"), (1, 2, "")] for _ in sents]
    batch = []
    for toks, sg in zip(sents, segs):
        ci, wi, slots = encode_sentence(toks, c_map, w_map)
        brk, known = segments_to_slots(len(toks), sg)
        batch.append(
            (ci, wi, slots, brk, known, spans_from_segments(sg, tl_map))
        )
    tg = Tagger(c_map, w_map, tl_map, arch="lstm", char_dim=8, word_dim=8,
                hidden=16, layers=2, label_dim=10, seed=11)
    rng = np.random.default_rng(3)
    state = None
    for _ in range(60):
        for bt in token_budget_batches(batch, budget=64):
            _, state = tg.train_batch_v2(
                bt, lr=5e-3, droprate=0.0, adam_state=state, rng=rng
            )
    preds = tg.predict_batch([["aa", "bb"], ["cc", "dd"]])
    for pred in preds:
        assert (0, 1, "T") in [(l, r, t) for l, r, t, _ in pred]


def test_carve_pseudo_segments_self_training_merge():
    """Pseudo spans only land inside FILTERED regions, never override
    dictionary supervision, and re-enable exactly their own slots."""
    from autoner_ray.state.tagger import (
        carve_pseudo_segments,
        segments_to_slots,
    )

    F = "__FILTERED__"
    segs = [(0, 2, "Chem"), (3, 7, F), (8, 10, "")]
    pred = [
        (4, 6, "Dis", 1.5),   # inside filtered -> accepted
        (0, 2, "Chem", 2.0),  # overlaps dict supervision -> rejected
        (8, 9, "Dis", 3.0),   # overlaps plain segment -> rejected
    ]
    merged, k = carve_pseudo_segments(segs, pred, 10)
    assert k == 1
    assert sorted(merged) == [
        (0, 2, "Chem"), (3, 3, F), (4, 6, "Dis"), (7, 7, F), (8, 10, ""),
    ]
    brk, known = segments_to_slots(10, merged)
    assert known.astype(int).tolist() == [1, 1, 1, 0, 1, 1, 1, 0, 1, 1, 1]
    assert brk.astype(int).tolist() == [1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1]
    # confidence floor rejects low-score spans
    _, k2 = carve_pseudo_segments(segs, pred, 10, min_score=2.0)
    assert k2 == 0
    # no accepted spans -> segments unchanged
    same, k3 = carve_pseudo_segments(segs, [], 10)
    assert k3 == 0 and same == segs


def test_word_dropout_records():
    """p=0 is identity (same objects); p=1 unks every real word id but
    never specials; char stream and supervision untouched."""
    from autoner_ray.state.tagger import (
        WORD_PAD,
        WORD_SPECIALS,
        WORD_UNK,
        word_dropout_records,
    )

    _, batch, _ = _tiny_setup()
    assert word_dropout_records(batch, 0.0, np.random.default_rng(0)) is batch
    out = word_dropout_records(batch, 1.0, np.random.default_rng(0))
    for (ci, wi, *rest), (ci2, wi2, *rest2) in zip(batch, out):
        assert ci is ci2 and rest[0] is rest2[0]  # chars/slots untouched
        real = wi >= WORD_SPECIALS
        assert (wi2[real] == WORD_UNK).all()
        assert (wi2[~real] == wi[~real]).all()  # PAD stays PAD


def test_bucketed_predict_matches_unbucketed():
    """Length-bucketed inference (the actor-pool hot path) must decode
    the same spans and the same chunk-score min/max as one padded
    whole-batch call — bucketing is a padding optimization, not a
    semantic change. (Scores are float32 BLAS sums whose shape changes
    with padding, so they match to ~1e-5, not bit-exactly.)"""
    from autoner_ray.stages.tagger_stage import bucketed_predict

    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "x", "longword" * 3]
    sents = [
        [vocab[j] for j in rng.integers(0, len(vocab), n)]
        for n in rng.integers(1, 12, 40)
    ]
    types = [["T"] if i % 3 == 0 else ["U"] for i in range(len(sents))]
    c_map, w_map, tl_map = build_vocabs(sents, types, char_min_count=0)
    tg = Tagger(c_map, w_map, tl_map, arch="lstm", char_dim=8, word_dim=8,
                hidden=16, layers=2, label_dim=10, seed=5)
    want, wmin, wmax = tg.predict_batch(sents, 0.0, with_chunk_stats=True)
    # tiny budget forces many buckets; large budget = one bucket
    for budget in (8, 64, 10_000):
        got, gmin, gmax = bucketed_predict(
            tg, sents, 0.0, budget=budget, with_chunk_stats=True
        )
        assert [[s[:3] for s in row] for row in got] == [
            [s[:3] for s in row] for row in want
        ]
        for wrow, grow in zip(want, got):
            assert np.allclose(
                [s[3] for s in wrow], [s[3] for s in grow], atol=1e-5
            )
        assert np.isclose(gmin, wmin, atol=1e-5)
        assert np.isclose(gmax, wmax, atol=1e-5)
    assert bucketed_predict(tg, [], 0.0) == []
