"""Corpus-trained word vectors: PPMI + truncated SVD (pure numpy).

The reference loads PRETRAINED word embeddings into the tagger
(`model_partial_ner/ner.py:96-104` load_pretrained_word_embedding;
`preprocess_partial_ner/save_emb.py` ships them) — its published
BC5CDR 84.8 F1 depends on them. This container has no network and no
external vector files, so the engine trains its own on the task corpus
with the classic count-based recipe (Levy & Goldberg 2014, "Neural Word
Embedding as Implicit Matrix Factorization"): windowed co-occurrence
counts -> positive PMI -> rank-d SVD. All dense numpy; the only
super-linear step is an eigen-decomposition of the C x C context gram
matrix (C = top frequent context words, default 1024).

At 100-TB corpus scale the co-occurrence COUNTING step is the
map/combine shape of `stages/triples.py` (per-batch partial count
dicts -> one groupby) and the factorization still runs on the
vocab-bounded matrix; here the corpus is one node's worth and a local
loop suffices.
"""

from __future__ import annotations

from collections import Counter

import numpy as np


def ppmi_svd_embeddings(
    sentences: list[list[str]],
    w_map: dict[str, int],
    dim: int = 50,
    num_context: int = 1024,
    window: int = 5,
    min_count: int = 1,
    seed: int = 19910724,
    subword: bool = False,
    subword_ngrams: tuple[int, int] = (3, 6),
    subword_min_count: int = 10,
) -> np.ndarray:
    """Return an embedding matrix aligned to ``w_map`` index space
    (rows 0..1 = specials, seeded uniform like `save_emb.py:47-53`).

    - context vocabulary = ``num_context`` most frequent words;
    - cooc[w, c] over symmetric ``window``;
    - PPMI with add-nothing smoothing, clipped at 0;
    - embeddings = U_d * sqrt(S_d) of the PPMI matrix (via eigh of the
      C x C gram — no scipy in this container).

    ``subword=True`` adds fastText-style char-n-gram back-off
    (Bojanowski et al. 2017): each n-gram (lengths in
    ``subword_ngrams``, over "<word>") gets the mean vector of the
    CONFIDENT words (corpus freq >= ``subword_min_count``) containing
    it; a rare word's vector is then blended with the mean of its
    n-gram vectors, weight sliding from pure-subword at freq 1 to
    pure-corpus at ``subword_min_count``. Biomedical morphology
    (-azole, -emia, hydroxy-) makes rare-word back-off informative.
    """
    from autoner_ray.state.tagger import WORD_SPECIALS

    freq: Counter[str] = Counter()
    for toks in sentences:
        freq.update(toks)
    context_words = [
        w for w, _ in freq.most_common(num_context) if w in w_map
    ]
    c_idx = {w: i for i, w in enumerate(context_words)}
    C = len(c_idx)
    n_rows = WORD_SPECIALS + len(w_map)
    V = len(w_map)

    cooc = np.zeros((V, C), np.float32)
    w_row = {w: i for i, w in enumerate(sorted(w_map, key=w_map.get))}
    for toks in sentences:
        ids = [w_row.get(t, -1) for t in toks]
        ctx = [c_idx.get(t, -1) for t in toks]
        n = len(toks)
        for i in range(n):
            wi = ids[i]
            if wi < 0:
                continue
            lo = max(0, i - window)
            hi = min(n, i + window + 1)
            for j in range(lo, hi):
                if j == i:
                    continue
                cj = ctx[j]
                if cj >= 0:
                    cooc[wi, cj] += 1.0

    total = cooc.sum()
    if total == 0 or C == 0:
        rng = np.random.default_rng(seed)
        bound = 2.0 * np.sqrt(3.0 / dim)
        return rng.uniform(-bound, bound, size=(n_rows, dim)).astype(
            np.float32
        )
    pw = cooc.sum(axis=1, keepdims=True) / total
    pc = cooc.sum(axis=0, keepdims=True) / total
    with np.errstate(divide="ignore", invalid="ignore"):
        pmi = np.log((cooc / total) / (pw @ pc))
    pmi[~np.isfinite(pmi)] = 0.0
    np.maximum(pmi, 0.0, out=pmi)

    # truncated SVD via eigh of the C x C gram (C ~ 1k: cheap, exact)
    gram = pmi.T @ pmi  # (C, C)
    evals, evecs = np.linalg.eigh(gram.astype(np.float64))
    order = np.argsort(evals)[::-1][:dim]
    sing = np.sqrt(np.maximum(evals[order], 1e-12))  # singular values
    Vd = evecs[:, order]  # (C, d)
    emb_words = (pmi @ Vd) / np.sqrt(sing)[None, :]  # = U_d * sqrt(S_d)
    emb_words = emb_words.astype(np.float32)
    # unit-scale rows (stabilizes the downstream LSTM input range)
    norms = np.linalg.norm(emb_words, axis=1, keepdims=True)
    emb_words = emb_words / np.maximum(norms, 1e-6)

    if subword:
        emb_words = _subword_backoff(
            emb_words, w_row, freq, subword_ngrams, subword_min_count
        )

    rng = np.random.default_rng(seed)
    bound = 2.0 * np.sqrt(3.0 / dim)
    emb = rng.uniform(-bound, bound, size=(n_rows, dim)).astype(np.float32)
    for w, row in w_row.items():
        emb[w_map[w]] = emb_words[row]
    return emb


def _word_ngrams(w: str, lo: int, hi: int) -> list[str]:
    s = f"<{w}>"
    return [
        s[i : i + n]
        for n in range(lo, hi + 1)
        for i in range(len(s) - n + 1)
        if n < len(s)  # skip the n-gram equal to the whole "<w>"
    ]


def _subword_backoff(
    emb_words: np.ndarray,
    w_row: dict[str, int],
    freq: Counter,
    ngrams: tuple[int, int],
    min_count: int,
) -> np.ndarray:
    """Blend rare-word rows of ``emb_words`` toward the mean vector of
    their char n-grams, where each n-gram vector is the mean over
    confident (freq >= min_count) words containing it."""
    lo, hi = ngrams
    dim = emb_words.shape[1]

    g_sum: dict[str, np.ndarray] = {}
    g_n: Counter[str] = Counter()
    for w, row in w_row.items():
        if freq[w] < min_count:
            continue
        v = emb_words[row]
        for g in set(_word_ngrams(w, lo, hi)):
            acc = g_sum.get(g)
            if acc is None:
                g_sum[g] = v.astype(np.float64).copy()
            else:
                acc += v
            g_n[g] += 1

    out = emb_words.copy()
    for w, row in w_row.items():
        f = freq[w]
        if f >= min_count:
            continue
        acc = np.zeros(dim, np.float64)
        k = 0
        for g in set(_word_ngrams(w, lo, hi)):
            n = g_n.get(g, 0)
            if n:
                acc += g_sum[g] / n
                k += 1
        if not k:
            continue
        sub = acc / k
        nrm = np.linalg.norm(sub)
        if nrm > 1e-6:
            sub = sub / nrm
        alpha = f / float(min_count)  # 1/min_count .. (mc-1)/mc
        blended = alpha * out[row] + (1.0 - alpha) * sub
        nrm = np.linalg.norm(blended)
        if nrm > 1e-6:
            blended = blended / nrm
        out[row] = blended.astype(np.float32)
    return out
