"""Dictionary-matching stage (T1 trie + T2 segmentDP).

Two execution shapes over the same :class:`DictMatcher` kernel:
- ``dict_match_fn(...)`` (DEFAULT): a TASK-pool function whose trie is
  built once per WORKER PROCESS and cached for the whole session —
  repeated pipelines over the same dictionaries pay zero per-run pool
  spawn or trie rebuild. Memory ≈ one trie per worker ≈ CPU-count
  copies per node.
- ``map_batches(DictMatcher, concurrency=N, ...)``: the classic FIXED
  actor pool — use when the dictionary is too large for a per-worker
  copy and must be bounded to N actors.
The trie is built ONCE per actor/worker from broadcast dictionary
lines (plain lists or ``ray.put`` handles — both accepted), then every
``__call__`` segments each sentence row independently. Embarrassingly
parallel; no shuffle (SURVEY.md §2.3 T1/T2).

Outputs (constructor ``output=``):
- ``"sentences"``: input row + ``entities: list<string>`` (sorted distinct
  canonical entities in the sentence) + ``mention_cnt: int32`` — the shape
  the triple stage consumes (pair generation must see whole sentences, so
  it happens on sentence rows, never on re-batched mention rows).
- ``"mentions"``: one row per typed mention:
  url, doc_id, sent_id, l, r, surface, types, canon
- ``"annotations"``: per-sentence Tie-or-Break projection:
  url, doc_id, sent_id, boundary list<int8>, types list<string>, ck string
- ``"pairs"``: pre-aggregated co-occurrence edge partials
  (subj, pred, obj, w) — the sentence->pair combiner fused into the
  actor so each batch of ~2k sentences leaves the pool as ~10^2 tiny
  partial rows instead of 2k sentence rows (object-store traffic drops
  ~100x and no separate task stage competes with the pool for CPUs).
- ``"pairs_ev"``: same + an associative min "url#sent_id" evidence
  pointer per edge (provenance).
- ``"typed_pairs"``: pattern-rule predicates — gap tokens between a
  positional mention pair become the predicate (see
  :meth:`DictMatcher.typed_pairs_of`).
"""

from __future__ import annotations

import pyarrow as pa

from autoner_ray.functions.ck import get_boundary, get_types, to_ck
from autoner_ray.functions.text import normalize_surface
from autoner_ray.state.trie import FILTERED_TYPE, build_trie, segment_dp


def _maybe_get(obj):
    """Accept a plain value or a ray.ObjectRef (broadcast handle)."""
    try:
        import ray

        if isinstance(obj, ray.ObjectRef):
            return ray.get(obj)
    except ImportError:
        pass
    return obj


class DictMatcher:
    def __init__(
        self,
        core_lines,
        full_lines=(),
        stopword_lines=(),
        weight: float = 1.0,
        output: str = "sentences",
    ) -> None:
        self.trie = build_trie(
            list(_maybe_get(core_lines)),
            list(_maybe_get(full_lines)),
            list(_maybe_get(stopword_lines)),
        )
        self.weight = weight
        assert output in (
            "sentences", "mentions", "annotations", "pairs", "typed_pairs",
            "pairs_ev",
        )
        self.output = output

    # -- kernels -----------------------------------------------------------
    def segments(self, tokens: list[str]):
        return segment_dp(self.trie, tokens, self.weight)

    def mentions_of(self, tokens: list[str]):
        """Typed (non-FILTERED, non-O) segments as mention tuples."""
        out = []
        for l, r, ty in self.segments(tokens):
            if ty and ty != FILTERED_TYPE:
                surface = " ".join(tokens[l:r])
                out.append((l, r, surface, ty, normalize_surface(surface)))
        return out

    # -- pattern predicates -----------------------------------------------
    MAX_PRED_GAP = 2

    def typed_pairs_of(self, tokens: list[str]):
        """North-star "pattern rule" predicates: for each POSITIONAL pair
        of mentions in the sentence (left subject, right object), the
        predicate is the joined gap tokens when the gap is 1..MAX_PRED_GAP
        plain word tokens (no separators, no other mention between);
        otherwise the pair falls back to the undirected co-occurrence
        edge. Deterministic function of the token stream."""
        from autoner_ray.functions.text import is_separator_token

        ms = self.mentions_of(tokens)
        out = []
        for i, (l1, r1, _s1, _t1, c1) in enumerate(ms):
            for l2, r2, _s2, _t2, c2 in ms[i + 1 :]:
                if c1 == c2:
                    continue
                gap = tokens[r1:l2]
                if (
                    1 <= len(gap) <= self.MAX_PRED_GAP
                    and not any(is_separator_token(t) for t in gap)
                ):
                    out.append((c1, "_".join(gap), c2))
                else:
                    a, b = sorted((c1, c2))
                    out.append((a, "cooccurs_with", b))
        return out

    # -- batch entry -------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        tokens_col = batch["tokens"].to_pylist()
        if self.output == "pairs_ev":
            # co-occurrence partials carrying PROVENANCE: per edge the
            # lexicographically-min "url#sent_id" evidence pointer. min()
            # is associative, so evidence merges exactly like the count.
            from collections import Counter
            from itertools import combinations

            from autoner_ray.stages.triples import PRED_COOCCUR

            counter: Counter[tuple[str, str]] = Counter()
            ev: dict[tuple[str, str], str] = {}
            urls = batch["url"].to_pylist()
            sids = batch["sent_id"].to_pylist()
            for url, sid, toks in zip(urls, sids, tokens_col):
                pointer = f"{url}#{sid}"
                ents = sorted({m[4] for m in self.mentions_of(toks)})
                for pair in combinations(ents, 2):
                    counter[pair] += 1
                    if pair not in ev or pointer < ev[pair]:
                        ev[pair] = pointer
            keys = list(counter.keys())
            return pa.table(
                {
                    "subj": pa.array([k[0] for k in keys], pa.string()),
                    "pred": pa.array([PRED_COOCCUR] * len(keys), pa.string()),
                    "obj": pa.array([k[1] for k in keys], pa.string()),
                    "w": pa.array([counter[k] for k in keys], pa.int64()),
                    "ev": pa.array([ev[k] for k in keys], pa.string()),
                }
            )
        if self.output == "typed_pairs":
            from collections import Counter

            counter: Counter[tuple[str, str, str]] = Counter()
            for toks in tokens_col:
                counter.update(self.typed_pairs_of(toks))
            keys = list(counter.keys())
            return pa.table(
                {
                    "subj": pa.array([k[0] for k in keys], pa.string()),
                    "pred": pa.array([k[1] for k in keys], pa.string()),
                    "obj": pa.array([k[2] for k in keys], pa.string()),
                    "w": pa.array(list(counter.values()), pa.int64()),
                }
            )
        if self.output == "pairs":
            from collections import Counter
            from itertools import combinations

            counter: Counter[tuple[str, str]] = Counter()
            for toks in tokens_col:
                ents = sorted({m[4] for m in self.mentions_of(toks)})
                for a, b in combinations(ents, 2):
                    counter[(a, b)] += 1
            from autoner_ray.stages.triples import PRED_COOCCUR

            subjs = [a for a, _ in counter]
            objs = [b for _, b in counter]
            return pa.table(
                {
                    "subj": pa.array(subjs, pa.string()),
                    "pred": pa.array([PRED_COOCCUR] * len(subjs), pa.string()),
                    "obj": pa.array(objs, pa.string()),
                    "w": pa.array(list(counter.values()), pa.int64()),
                }
            )
        if self.output == "sentences":
            ents, cnts = [], []
            for toks in tokens_col:
                ms = self.mentions_of(toks)
                ents.append(sorted({m[4] for m in ms}))
                cnts.append(len(ms))
            return pa.table(
                {
                    "url": batch["url"],
                    "doc_id": batch["doc_id"],
                    "sent_id": batch["sent_id"],
                    "entities": pa.array(ents, type=pa.list_(pa.string())),
                    "mention_cnt": pa.array(cnts, type=pa.int32()),
                }
            )
        if self.output == "mentions":
            cols = {k: [] for k in (
                "url", "doc_id", "sent_id", "l", "r", "surface", "types", "canon"
            )}
            urls = batch["url"].to_pylist()
            dids = batch["doc_id"].to_pylist()
            sids = batch["sent_id"].to_pylist()
            for url, did, sid, toks in zip(urls, dids, sids, tokens_col):
                for l, r, surface, ty, canon in self.mentions_of(toks):
                    cols["url"].append(url)
                    cols["doc_id"].append(did)
                    cols["sent_id"].append(sid)
                    cols["l"].append(l)
                    cols["r"].append(r)
                    cols["surface"].append(surface)
                    cols["types"].append(ty)
                    cols["canon"].append(canon)
            return pa.table(
                {
                    "url": pa.array(cols["url"], pa.string()),
                    "doc_id": pa.array(cols["doc_id"], pa.int64()),
                    "sent_id": pa.array(cols["sent_id"], pa.int32()),
                    "l": pa.array(cols["l"], pa.int32()),
                    "r": pa.array(cols["r"], pa.int32()),
                    "surface": pa.array(cols["surface"], pa.string()),
                    "types": pa.array(cols["types"], pa.string()),
                    "canon": pa.array(cols["canon"], pa.string()),
                }
            )
        # annotations
        bnds, typs, cks = [], [], []
        for toks in tokens_col:
            segs = self.segments(toks)
            b = get_boundary(toks, segs)
            y = get_types(toks, segs)
            bnds.append(b)
            typs.append(y)
            cks.append(to_ck(toks, segs, boundary=b, types=y))
        return pa.table(
            {
                "url": batch["url"],
                "doc_id": batch["doc_id"],
                "sent_id": batch["sent_id"],
                "boundary": pa.array(bnds, type=pa.list_(pa.int8())),
                "types": pa.array(typs, type=pa.list_(pa.string())),
                "ck": pa.array(cks, type=pa.string()),
            }
        )


# -- task-pool twin ------------------------------------------------------------

_MATCHER_CACHE: dict = {}
_MATCHER_CACHE_MAX = 8


def _cache_put(key, inst):
    """FIFO-bounded per-worker cache: a long session cycling many
    distinct dictionaries (test suites) must not accumulate tries."""
    if len(_MATCHER_CACHE) >= _MATCHER_CACHE_MAX:
        _MATCHER_CACHE.pop(next(iter(_MATCHER_CACHE)))
    _MATCHER_CACHE[key] = inst


def _content_key(lines) -> str:
    """Stable state key: ObjectRef hex (already content-addressed for the
    session) or an md5 over the lines themselves."""
    import hashlib

    try:
        import ray

        if isinstance(lines, ray.ObjectRef):
            return lines.hex()
    except ImportError:
        pass
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode() if isinstance(ln, str) else ln)
        h.update(b"\n")
    return h.hexdigest()


def dict_match_fn(core_lines, full_lines=(), stopword_lines=(),
                  weight: float = 1.0, output: str = "sentences"):
    """TASK-pool twin of the :class:`DictMatcher` actor class.

    Returns a plain function for ``map_batches`` — no actor pool. The
    trie is built once per WORKER PROCESS (module-level cache keyed by
    dictionary content + output mode) and then reused by every task of
    every query in the session: repeated pipelines over the same
    dictionaries pay the trie build once per worker instead of once per
    actor per run, and there is no per-run pool-spawn cost or
    fixed-pool CPU-budget deadlock to manage (same reasoning as the
    minhash signer, dedup.py).

    Dictionary lines are shipped as ``ray.put`` handles captured in the
    closure — tasks deserialize a tiny ref, not the dictionary.

    Memory bound: at most one trie per worker process ≈ CPU-count
    copies per node — the same count as the CPU-wide actor pool. For a
    dictionary too large for that budget, use the actor class with a
    narrower ``concurrency`` instead.
    """
    import ray

    key = (
        _content_key(core_lines),
        _content_key(full_lines),
        _content_key(stopword_lines),
        weight,
        output,
    )

    def _as_ref(lines):
        return lines if isinstance(lines, ray.ObjectRef) else ray.put(
            list(lines)
        )

    core_ref, full_ref, stop_ref = map(
        _as_ref, (core_lines, full_lines, stopword_lines)
    )

    def match_batch(batch: pa.Table) -> pa.Table:
        m = _MATCHER_CACHE.get(key)
        if m is None:
            m = DictMatcher(
                _maybe_get(core_ref),
                _maybe_get(full_ref),
                _maybe_get(stop_ref),
                weight,
                output,
            )
            _cache_put(key, m)
        return m(batch)

    return match_batch


def cached_stage_fn(cls, _cache_key_extra: str = "", **kwargs):
    """Generic task-pool wrapper for an actor-class stage: builds the
    class once per WORKER PROCESS (cache keyed by class + kwarg content)
    and reuses it for every task of every query in the session. List,
    tuple and bytes kwargs are shipped as ``ray.put`` handles so tasks
    deserialize a ref, not the payload. Same memory bound as
    :func:`dict_match_fn`: ≤ one instance per worker ≈ CPU-count copies
    per node. Use the actor class directly when the state exceeds that
    budget.

    ``_cache_key_extra``: REQUIRED whenever ``cls`` is a local class
    whose behavior depends on enclosing-scope variables (they are baked
    into the shipped class but invisible to the kwarg-content key) —
    pass their repr so differently-parameterized closures never share a
    cached instance."""
    import hashlib

    import ray

    def norm(v):
        if isinstance(v, ray.ObjectRef):
            return v.hex(), v
        if isinstance(v, (list, tuple)):
            return _content_key(v), ray.put(list(v))
        if isinstance(v, bytes):
            return hashlib.md5(v).hexdigest(), ray.put(v)
        return repr(v), v

    keyed = {k: norm(v) for k, v in sorted(kwargs.items())}
    key = (cls.__module__, cls.__qualname__, _cache_key_extra) + tuple(
        (k, h) for k, (h, _) in keyed.items()
    )
    shipped = {k: v for k, (_, v) in keyed.items()}

    def stage_batch(batch: pa.Table) -> pa.Table:
        inst = _MATCHER_CACHE.get(key)
        if inst is None:
            inst = cls(**{k: _maybe_get(v) for k, v in shipped.items()})
            _cache_put(key, inst)
        return inst(batch)

    return stage_batch
