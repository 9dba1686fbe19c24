"""Tie-or-Break neural tagger: numpy char-level bi-GRU (T3/T4/T5/T6).

Re-expresses the reference model family (`model_partial_ner/ner.py:36-174`,
`basic.py:12-151`) with the ``--rnn_unit gru`` option
(`train_partial_ner.py:52`, unit map `basic.py:33`) in pure numpy —
forward AND backward passes — because this container ships no torch.
Architecture contract kept:

- char-level sequence: ``<bos> w0chars <sep> w1chars <sep> ... <sep(eos)>``,
  word embedding repeated at every char of the word and CONCATENATED with
  the char embedding (`encode_folder.py:178-202` repeats word ids per
  char; the reference concatenates the embedded streams in
  `ner.py:91-101`);
- bi-GRU over the char stream;
- CHUNKING head: a linear score at every boundary slot (the separator
  positions, `encode_folder.py:190` chunk_mask); ``score < threshold``
  means Break (`test_partial_ner.py:91`);
- TYPING head: span representation = backward state at the LEFT break
  concat forward state at the RIGHT break -> one hidden layer -> type
  logits (`ner.py:176-238` to_typed_span);
- losses: BCE-with-logits on Break scores (safe slots only,
  `encode_folder.py:74-88` S/D mask) + soft cross-entropy against the
  k-hot type mask (`model_partial_ner/object.py:16-67` softCE);
- SGD + momentum, gradient clip 5 (`train_partial_ner.py:89,140`);
- token-budget batching: sentences sorted by length desc, batch size =
  ``max(budget // seq_len, 1)`` (`dataset.py:144-188`).

Boundary-slot convention (engine-normalized form of the .ck contract):
a sentence of n words has n+1 slots — slot 0 before word 0 (the
``<bos>`` char), slot i at the separator before word i, slot n at the
trailing separator. Segments [l, r) mark slots l and r Break, interior
slots Tie; FILTERED spans mark slots l..r UNKNOWN (the inclusive-r
quirk, `annotation.h:278-280`).
"""

from __future__ import annotations

import io
from collections import Counter

import numpy as np

PAD, BOS, SEP, UNK = 0, 1, 2, 3  # char-stream specials
CHAR_SPECIALS = 4
WORD_PAD, WORD_UNK = 0, 1
WORD_SPECIALS = 2
NONE_TYPE = "None"


# ---------------------------------------------------------------------------
# Vocab builds (A1 corpus vocab, A2 label map, A3 char freq threshold)
# ---------------------------------------------------------------------------

def build_vocabs(
    sentences: list[list[str]],
    type_lists: list[list[str]],
    char_min_count: int = 5,
):
    """Return (c_map, w_map, tl_map).

    - chars with count > ``char_min_count`` enter c_map
      (`encode_folder.py:165-174`);
    - every corpus word (raw) enters w_map (`encode_folder.py:12-21`);
    - tl_map: ``None`` first, then first-occurrence order of span types
      (`encode_folder.py:33-52`) — normalized to sorted order for
      shard-independence (SURVEY §2.5 A2 note).
    """
    c_count: Counter[str] = Counter()
    w_set: set[str] = set()
    t_set: set[str] = set()
    for toks in sentences:
        for w in toks:
            w_set.add(w)
            c_count.update(w)
    for types in type_lists:
        for t in types:
            if t and t != NONE_TYPE:
                t_set.add(t)
    c_map = {
        ch: i + CHAR_SPECIALS
        for i, ch in enumerate(
            sorted(ch for ch, n in c_count.items() if n > char_min_count)
        )
    }
    w_map = {w: i + WORD_SPECIALS for i, w in enumerate(sorted(w_set))}
    tl_map = {NONE_TYPE: 0}
    for t in sorted(t_set):
        tl_map[t] = len(tl_map)
    return c_map, w_map, tl_map


# ---------------------------------------------------------------------------
# Encoder (M10/M11): tokens -> char/word id streams + boundary slots
# ---------------------------------------------------------------------------

def encode_sentence(tokens: list[str], c_map: dict, w_map: dict):
    """Return (char_ids, word_ids, slot_pos) — slot_pos[i] = char index of
    boundary slot i (n+1 slots). Word lookup falls back raw -> lower ->
    unk (`encode_folder.py:184-185`)."""
    char_ids = [BOS]
    word_ids = [WORD_PAD]
    slot_pos = [0]
    for w in tokens:
        wid = w_map.get(w) or w_map.get(w.lower(), WORD_UNK)
        for ch in w:
            char_ids.append(c_map.get(ch, UNK))
            word_ids.append(wid)
        char_ids.append(SEP)
        word_ids.append(wid)
        slot_pos.append(len(char_ids) - 1)
    return (
        np.asarray(char_ids, np.int32),
        np.asarray(word_ids, np.int32),
        np.asarray(slot_pos, np.int32),
    )


def segments_to_slots(n_words: int, segments, filtered_type="__FILTERED__"):
    """Segments -> (break_label[n+1] in {1,0}, known_mask[n+1]).

    Typed/plain segments stamp Breaks at both edges and Ties inside;
    FILTERED spans void supervision on slots l..r INCLUSIVE
    (`annotation.h:278-280`)."""
    brk = np.zeros(n_words + 1, np.float32)
    known = np.ones(n_words + 1, bool)
    brk[0] = brk[n_words] = 1.0
    for l, r, ty in segments:
        if ty == filtered_type:
            known[l : min(r, n_words) + 1] = False
            continue
        brk[l] = 1.0
        brk[r] = 1.0
        # interior slots are Tie (0) — already zero unless another
        # segment marked them; explicit for clarity:
        if r - l > 1:
            brk[l + 1 : r] = 0.0
    return brk, known


def spans_from_segments(segments, tl_map, filtered_type="__FILTERED__"):
    """Typed spans [(l, r, khot)] for typing supervision (M12).

    Plain (untyped, non-FILTERED) segments supervise the ``None`` class —
    the reference stamps ``"None"`` on every non-entity token
    (`annotation.h:298-317`) and the typing loss sees those chunks too;
    without them the None logit is never trained and every decoded span
    argmaxes to an entity type. FILTERED spans stay unsupervised."""
    out = []
    for l, r, ty in segments:
        if ty == filtered_type:
            continue
        khot = np.zeros(len(tl_map), np.float32)
        if not ty:
            khot[tl_map[NONE_TYPE]] = 1.0
            out.append((l, r, khot))
            continue
        found = False
        for t in ty.split(","):
            if t in tl_map:
                khot[tl_map[t]] = 1.0
                found = True
        if found:
            out.append((l, r, khot))
    return out


# ---------------------------------------------------------------------------
# Token-budget batcher (T6)
# ---------------------------------------------------------------------------

def token_budget_batches(records, budget: int = 3000):
    """records sorted by char-seq length desc; batch rows =
    max(budget // seq_len, 1) (`dataset.py:144-188`)."""
    order = sorted(range(len(records)), key=lambda i: -len(records[i][0]))
    i = 0
    while i < len(order):
        seq_len = len(records[order[i]][0])
        rows = max(budget // max(seq_len, 1), 1)
        yield [records[j] for j in order[i : i + rows]]
        i += rows


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

def init_params(
    n_chars: int,
    n_words: int,
    n_types: int,
    char_dim: int = 16,
    word_dim: int = 16,
    hidden: int = 32,
    seed: int = 19910724,
) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)

    def mat(*shape):
        bound = np.sqrt(6.0 / sum(shape))
        return rng.uniform(-bound, bound, size=shape).astype(np.float32)

    d = char_dim + word_dim
    p = {
        "Ec": mat(n_chars, char_dim),
        "Ew": mat(n_words, word_dim),
        # GRU (shared shapes fwd/bwd): gates z, r, candidate h
        "Wf": mat(d, 3 * hidden), "Uf": mat(hidden, 3 * hidden),
        "bf": np.zeros(3 * hidden, np.float32),
        "Wb": mat(d, 3 * hidden), "Ub": mat(hidden, 3 * hidden),
        "bb": np.zeros(3 * hidden, np.float32),
        # chunk head over [h_fwd, h_bwd]
        "Wc": mat(2 * hidden, 1), "bc": np.zeros(1, np.float32),
        # typing head over [h_bwd(left), h_fwd(right)]
        "Wt1": mat(2 * hidden, hidden), "bt1": np.zeros(hidden, np.float32),
        "Wt2": mat(hidden, n_types), "bt2": np.zeros(n_types, np.float32),
    }
    p["_dims"] = np.asarray(
        [n_chars, n_words, n_types, char_dim, word_dim, hidden], np.int64
    )
    return p


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-np.clip(x, -30, 30)))


def _gru_forward(x, W, U, b, mask, reverse=False):
    """x: (T, B, D), mask: (T, B) 1.0 on real positions -> h: (T, B, H).

    Masked steps pass state through unchanged, so PAD positions in a
    mixed-length batch never contaminate real positions (matters for the
    backward scan, which crosses the padding before the sentence)."""
    T, B, D = x.shape
    H = U.shape[0]
    h = np.zeros((T, B, H), np.float32)
    cache = []
    hp = np.zeros((B, H), np.float32)
    steps = range(T - 1, -1, -1) if reverse else range(T)
    pre = x @ W + b  # (T,B,3H)
    for t in steps:
        zr = pre[t][:, : 2 * H] + hp @ U[:, : 2 * H]
        z = _sigmoid(zr[:, :H])
        r = _sigmoid(zr[:, H:])
        c_in = pre[t][:, 2 * H :] + (r * hp) @ U[:, 2 * H :]
        c = np.tanh(c_in)
        m = mask[t][:, None]
        ht = m * ((1 - z) * hp + z * c) + (1 - m) * hp
        h[t] = ht
        cache.append((t, hp.copy(), z, r, c))
        hp = ht
    return h, cache


def _gru_backward(dh_all, x, W, U, b, mask, cache, reverse=False):
    """Backprop through the masked GRU; returns (dx, dW, dU, db)."""
    T, B, D = x.shape
    H = U.shape[0]
    dx = np.zeros_like(x)
    dW = np.zeros_like(W)
    dU = np.zeros_like(U)
    db = np.zeros_like(b)
    dhp = np.zeros((B, H), np.float32)
    for t_, hp, z, r, c in reversed(cache):
        m = mask[t_][:, None]
        dh_total = dh_all[t_] + dhp
        dh = dh_total * m          # through the GRU update
        dhp_skip = dh_total * (1 - m)  # straight through on masked steps
        dz = dh * (c - hp)
        dc = dh * z
        dhp_direct = dh * (1 - z)
        dc_in = dc * (1 - c * c)
        # candidate path
        dpre_c = dc_in
        d_rhp = dc_in @ U[:, 2 * H :].T
        dU[:, 2 * H :] += (r * hp).T @ dc_in
        dr = d_rhp * hp
        dhp_c = d_rhp * r
        # gates
        dzr = np.concatenate(
            [dz * z * (1 - z), dr * r * (1 - r)], axis=1
        )
        dU[:, : 2 * H] += hp.T @ dzr
        dhp_g = dzr @ U[:, : 2 * H].T
        dpre = np.concatenate([dzr, dpre_c], axis=1)
        dW += x[t_].T @ dpre
        db += dpre.sum(axis=0)
        dx[t_] = dpre @ W.T
        dhp = dhp_direct + dhp_c + dhp_g + dhp_skip
    return dx, dW, dU, db


def forward(params, char_ids, word_ids):
    """char_ids/word_ids: (T, B) int32 (PAD-padded). Returns
    (h_fwd, h_bwd, caches, x, mask)."""
    xc = params["Ec"][char_ids]  # (T,B,Cd)
    xw = params["Ew"][word_ids]
    x = np.concatenate([xc, xw], axis=2)
    mask = (char_ids != PAD).astype(np.float32)
    hf, cf = _gru_forward(x, params["Wf"], params["Uf"], params["bf"], mask)
    hb, cb = _gru_forward(
        x, params["Wb"], params["Ub"], params["bb"], mask, reverse=True
    )
    return hf, hb, (cf, cb), x, mask


def chunk_scores(params, hf, hb, slot_pos, b):
    """Boundary scores for one sentence b: (n_slots,)."""
    reps = np.concatenate([hf[slot_pos, b], hb[slot_pos, b]], axis=1)
    return (reps @ params["Wc"] + params["bc"])[:, 0]


def type_logits(params, hf, hb, b, left_pos, right_pos):
    rep = np.concatenate([hb[left_pos, b], hf[right_pos, b]], axis=0)
    hid = np.tanh(rep @ params["Wt1"] + params["bt1"])
    return hid @ params["Wt2"] + params["bt2"]


# ---------------------------------------------------------------------------
# Loss + training step (T5)
# ---------------------------------------------------------------------------

def soft_ce(logits: np.ndarray, khot: np.ndarray):
    """softCE of `object.py:16-67`: CE against the renormalized k-hot."""
    target = khot / max(khot.sum(), 1e-9)
    m = logits.max()
    logp = logits - (m + np.log(np.exp(logits - m).sum()))
    loss = -(target * logp).sum()
    dlogits = np.exp(logp) - target
    return loss, dlogits.astype(np.float32)


def bce_logits(score: float, label: float):
    p = _sigmoid(np.float32(score))
    loss = -(label * np.log(p + 1e-12) + (1 - label) * np.log(1 - p + 1e-12))
    return float(loss), float(p - label)


class Tagger:
    """Trainable numpy tagger bundling params + vocab maps (S11-style
    checkpoint: one npz holds weights and maps)."""

    def __init__(self, c_map, w_map, tl_map, **hp):
        self.c_map, self.w_map, self.tl_map = c_map, w_map, tl_map
        self.types = [t for t, _ in sorted(tl_map.items(), key=lambda kv: kv[1])]
        self.params = init_params(
            n_chars=CHAR_SPECIALS + len(c_map),
            n_words=WORD_SPECIALS + len(w_map),
            n_types=len(tl_map),
            **hp,
        )

    # -- persistence (S11) -------------------------------------------------
    def to_bytes(self) -> bytes:
        import json

        buf = io.BytesIO()
        meta = json.dumps(
            {"c_map": self.c_map, "w_map": self.w_map, "tl_map": self.tl_map}
        )
        np.savez(
            buf,
            __meta__=np.frombuffer(meta.encode(), np.uint8),
            **{k: v for k, v in self.params.items()},
        )
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "Tagger":
        import json

        with np.load(io.BytesIO(blob)) as z:
            meta = json.loads(bytes(z["__meta__"]).decode())
            obj = cls.__new__(cls)
            obj.c_map = meta["c_map"]
            obj.w_map = meta["w_map"]
            obj.tl_map = meta["tl_map"]
            obj.types = [
                t
                for t, _ in sorted(obj.tl_map.items(), key=lambda kv: kv[1])
            ]
            obj.params = {
                k: z[k] for k in z.files if k != "__meta__"
            }
        return obj

    # -- batching helpers --------------------------------------------------
    def _pad_batch(self, records):
        T = max(len(r[0]) for r in records)
        B = len(records)
        char_ids = np.full((T, B), PAD, np.int32)
        word_ids = np.full((T, B), WORD_PAD, np.int32)
        for b, rec in enumerate(records):
            char_ids[: len(rec[0]), b] = rec[0]
            word_ids[: len(rec[1]), b] = rec[1]
        return char_ids, word_ids

    # -- inference (T4 + M15) ----------------------------------------------
    def predict_batch(self, sentences: list[list[str]], threshold: float = 0.0):
        """Decode typed spans per sentence: list of (l, r, type, score)."""
        if not sentences:
            return []
        records = [
            encode_sentence(toks, self.c_map, self.w_map)
            for toks in sentences
        ]
        char_ids, word_ids = self._pad_batch(records)
        hf, hb, _, _, _ = forward(self.params, char_ids, word_ids)
        out = []
        for b, (ci, wi, slots) in enumerate(records):
            scores = chunk_scores(self.params, hf, hb, slots, b)
            # score < threshold => Break (test_partial_ner.py:91)
            breaks = [i for i, s in enumerate(scores) if s < threshold]
            if 0 not in breaks:
                breaks.insert(0, 0)
            last = len(slots) - 1
            if last not in breaks:
                breaks.append(last)
            spans = []
            for a, c in zip(breaks, breaks[1:]):
                logits = type_logits(
                    self.params, hf, hb, b, slots[a], slots[c]
                )
                ti = int(np.argmax(logits))
                ty = self.types[ti]
                if ty != NONE_TYPE:
                    spans.append((a, c, ty, float(logits[ti])))
            out.append(spans)
        return out

    # -- one SGD step on one token-budget batch (T5) -----------------------
    def train_batch(self, batch, lr: float, momentum: float = 0.9,
                    clip: float = 5.0, velocity=None):
        """batch: list of (char_ids, word_ids, slot_pos, brk, known, spans).
        Returns (loss, velocity)."""
        char_ids, word_ids = self._pad_batch(batch)
        p = self.params
        hf, hb, (cf, cb), x, mask = forward(p, char_ids, word_ids)
        T, B, H = hf.shape
        dhf = np.zeros_like(hf)
        dhb = np.zeros_like(hb)
        grads = {
            k: np.zeros_like(v)
            for k, v in p.items()
            if not k.startswith("_")
        }
        total, n_terms = 0.0, 0
        for b, rec in enumerate(batch):
            ci, wi, slots, brk, known, spans = rec
            # chunking BCE on KNOWN slots (S/D mask, encode_folder.py:74-88)
            reps = np.concatenate([hf[slots, b], hb[slots, b]], axis=1)
            scores = (reps @ p["Wc"] + p["bc"])[:, 0]
            for i in np.nonzero(known)[0]:
                # label 1 = Tie (high score), 0 = Break: score<thr => Break
                label = 0.0 if brk[i] == 1.0 else 1.0
                loss, dscore = bce_logits(scores[i], label)
                total += loss
                n_terms += 1
                drep = dscore * p["Wc"][:, 0]
                grads["Wc"][:, 0] += dscore * reps[i]
                grads["bc"][0] += dscore
                dhf[slots[i], b] += drep[:H]
                dhb[slots[i], b] += drep[H:]
            # typing softCE
            for l, r, khot in spans:
                lp, rp = slots[l], slots[r]
                rep = np.concatenate([hb[lp, b], hf[rp, b]])
                hid_in = rep @ p["Wt1"] + p["bt1"]
                hid = np.tanh(hid_in)
                logits = hid @ p["Wt2"] + p["bt2"]
                loss, dlogits = soft_ce(logits, khot)
                total += loss
                n_terms += 1
                grads["Wt2"] += np.outer(hid, dlogits)
                grads["bt2"] += dlogits
                dhid = (dlogits @ p["Wt2"].T) * (1 - hid * hid)
                grads["Wt1"] += np.outer(rep, dhid)
                grads["bt1"] += dhid
                drep = p["Wt1"] @ dhid
                dhb[lp, b] += drep[:H]
                dhf[rp, b] += drep[H:]
        # backprop through both GRUs
        dx_f, dWf, dUf, dbf = _gru_backward(
            dhf, x, p["Wf"], p["Uf"], p["bf"], mask, cf
        )
        dx_b, dWb, dUb, dbb = _gru_backward(
            dhb, x, p["Wb"], p["Ub"], p["bb"], mask, cb, reverse=True
        )
        grads["Wf"] += dWf; grads["Uf"] += dUf; grads["bf"] += dbf
        grads["Wb"] += dWb; grads["Ub"] += dUb; grads["bb"] += dbb
        dx = dx_f + dx_b
        Cd = p["Ec"].shape[1]
        np.add.at(grads["Ec"], char_ids, dx[:, :, :Cd])
        np.add.at(grads["Ew"], word_ids, dx[:, :, Cd:])
        # clip global norm at 5 (train_partial_ner.py:140)
        norm = np.sqrt(sum(float((g * g).sum()) for g in grads.values()))
        scale = min(1.0, clip / (norm + 1e-12))
        if velocity is None:
            velocity = {k: np.zeros_like(v) for k, v in grads.items()}
        for k, g in grads.items():
            velocity[k] = momentum * velocity[k] - lr * scale * g
            p[k] += velocity[k]
        return total / max(n_terms, 1), velocity


# ---------------------------------------------------------------------------
# Span-F1 evaluation (A4) — partial counts, mergeable
# ---------------------------------------------------------------------------

def span_f1_counts(gold_spans, pred_spans):
    """Per-sentence (n_gold, n_pred, n_overlap) over typed spans."""
    g = {(l, r, t) for l, r, t in gold_spans}
    p = {(l, r, t) for l, r, t, *_ in pred_spans}
    return len(g), len(p), len(g & p)


def f1_from_counts(n_gold: int, n_pred: int, n_hit: int):
    prec = n_hit / (n_pred + 1e-6)
    rec = n_hit / (n_gold + 1e-6)
    return {
        "precision": round(prec, 6),
        "recall": round(rec, 6),
        "f1": round(2 * prec * rec / (prec + rec + 1e-6), 6),
    }
