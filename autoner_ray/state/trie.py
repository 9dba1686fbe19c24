"""Typed-surface trie + weighted-interval segmentation DP.

Re-implements the dictionary-supervision core of the reference with exact
semantic parity (including its quirks, which golden-byte tests depend on):

- trie node model / entity vs filtered states    src/annotation.h:16-45
- case-variant insertion (raw + UPPER + lower)   src/annotation.h:52-138
- core-dict load (``noLowercases`` rules)        src/annotation.h:181-208
- full-dict load reusing the LAST core row's
  type-based ``noLowercases`` flag (bug-compat)  src/annotation.h:184,196,214
- load order: KB first, stopwords second — so the stopword-membership
  check during core load (src/annotation.h:197-204) sees an EMPTY stopword
  set in the ``bin/generate`` flow (src/annotation.h:235-243); replicated.
- stopword removal of 3 case variants            src/annotation.h:220-233
- ``segmentDP``                                  src/string_match.h:21-89
  (score len² for core match, weight·len² for full-dict match, strict
  inequality tie-breaks, matches never cross the "\\n" sentinel)

The trie is plain Python dicts — it is built ONCE per DictMatcher actor in
``__init__`` from broadcast dictionary rows and then read-only.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from autoner_ray.functions.text import (
    split_by,
    strip_cpp,
    to_lower_ascii,
    to_upper_ascii,
)

FILTERED_TYPE = "__FILTERED__"


@dataclass
class _Node:
    children: dict[str, int] = field(default_factory=dict)
    types: set[str] = field(default_factory=set)


class KBTrie:
    """Token-level trie; node 0 is the root (src/annotation.h:47-50)."""

    def __init__(self) -> None:
        self.nodes: list[_Node] = [_Node()]
        self.stopword_set: set[str] = set()

    # -- construction ------------------------------------------------------
    def _descend_insert(self, tokens: list[str]) -> int:
        u = 0
        nodes = self.nodes
        for tok in tokens:
            ch = nodes[u].children
            v = ch.get(tok)
            if v is None:
                v = len(nodes)
                ch[tok] = v
                nodes.append(_Node())
            u = v
        return u

    def insert(
        self,
        tokens: list[str],
        types: list[str],
        no_lowercases: bool,
        must_exactly_same: bool = False,
    ) -> None:
        """src/annotation.h:99-138 — raw + ALL-UPPER (+ all-lower) variants."""
        u = self._descend_insert(tokens)
        self.nodes[u].types.update(types)
        if not must_exactly_same:
            u = self._descend_insert([to_upper_ascii(t) for t in tokens])
            self.nodes[u].types.update(types)
        if not no_lowercases:
            u = self._descend_insert([to_lower_ascii(t) for t in tokens])
            self.nodes[u].types.update(types)

    def mark_as_filtered(
        self,
        tokens: list[str],
        no_lowercases: bool,
        must_exactly_same: bool = False,
    ) -> None:
        """src/annotation.h:52-97 — FILTERED only lands on untyped nodes."""
        variants = [tokens]
        if not must_exactly_same:
            variants.append([to_upper_ascii(t) for t in tokens])
        if not no_lowercases:
            variants.append([to_lower_ascii(t) for t in tokens])
        for var in variants:
            u = self._descend_insert(var)
            if not self.nodes[u].types:
                self.nodes[u].types.add(FILTERED_TYPE)

    def remove(self, tokens: list[str]) -> None:
        """src/annotation.h:140-149 — clears types; keeps interior nodes."""
        u = 0
        for tok in tokens:
            v = self.nodes[u].children.get(tok)
            if v is None:
                return
            u = v
        self.nodes[u].types.clear()

    # -- queries -----------------------------------------------------------
    def get_child(self, u: int, token: str) -> int:
        """src/annotation.h:29-37."""
        if u < 0 or u >= len(self.nodes):
            return -1
        return self.nodes[u].children.get(token, -1)

    def is_entity(self, u: int) -> bool:
        """src/annotation.h:39-41."""
        if u < 0 or u >= len(self.nodes):
            return False
        t = self.nodes[u].types
        return len(t) > 0 and FILTERED_TYPE not in t

    def is_filtered(self, u: int) -> bool:
        """src/annotation.h:43-45."""
        if u < 0 or u >= len(self.nodes):
            return False
        t = self.nodes[u].types
        return len(t) == 1 and FILTERED_TYPE in t

    def get_types(self, u: int) -> set[str]:
        return self.nodes[u].types

    def in_kb(self, tokens: list[str]) -> bool:
        """src/annotation.h:151-160."""
        u = 0
        for tok in tokens:
            u = self.nodes[u].children.get(tok, -1)
            if u == -1:
                return False
        return len(self.nodes[u].types) > 0

    def get_type_from_kb(self, tokens: list[str]) -> str:
        """src/annotation.h:162-178 — comma-join in std::set (byte) order."""
        u = 0
        for tok in tokens:
            u = self.nodes[u].children.get(tok, -1)
            if u == -1:
                return ""
        return ",".join(sorted(self.nodes[u].types))


def load_kb(trie: KBTrie, core_lines: list[str], full_lines: list[str]) -> None:
    """src/annotation.h:181-218 — parse ``types<TAB>surface`` core rows then
    untyped full-dict phrases.

    Bug-compat details replicated:
    - ``noLowercasesForThisKB`` carries the type-based flag of the LAST core
      row into every full-dict insertion (src/annotation.h:184,196,214);
    - the stopword-membership escalation (src/annotation.h:197-204) consults
      ``trie.stopword_set`` which is empty when loading happens before
      :func:`clean_stopwords` (the ``bin/generate`` order).
    """
    no_lower_for_kb = False
    for raw in core_lines:
        line = raw.rstrip("\n\r")
        cols = split_by(line, "\t")
        assert len(cols) == 2, f"core dict row needs 2 tab-cols: {line!r}"
        entity_types = split_by(cols[0], ",")
        assert entity_types, line
        surface_tokens = split_by(strip_cpp(cols[1]), " ")
        no_lowercases = (
            "PER" in cols[0] or "ORG" in cols[0] or "LOC" in cols[0]
        )
        no_lower_for_kb = no_lowercases
        if not no_lowercases:
            for tok in surface_tokens:
                if to_lower_ascii(tok) in trie.stopword_set:
                    no_lowercases = True
                    break
        trie.insert(surface_tokens, entity_types, no_lowercases)
    for raw in full_lines:
        surface_tokens = split_by(strip_cpp(raw.rstrip("\n\r")), " ")
        trie.mark_as_filtered(surface_tokens, no_lower_for_kb)


def clean_stopwords(trie: KBTrie, stopword_lines: list[str]) -> None:
    """src/annotation.h:220-233 — remove lower/UPPER/Capitalized unigrams."""
    for raw in stopword_lines:
        token = strip_cpp(raw.rstrip("\n\r"))
        if not token:
            continue
        trie.stopword_set.add(to_lower_ascii(token))
        trie.remove([to_lower_ascii(token)])
        trie.remove([to_upper_ascii(token)])
        trie.remove([to_upper_ascii(token[0]) + token[1:]])


def build_trie(
    core_lines: list[str],
    full_lines: list[str],
    stopword_lines: list[str],
) -> KBTrie:
    """src/annotation.h:235-243 — KB load first, stopword cleanup second."""
    trie = KBTrie()
    load_kb(trie, core_lines, full_lines)
    clean_stopwords(trie, stopword_lines)
    return trie


def segment_dp(
    trie: KBTrie, tokens: list[str], weight: float = 1.0
) -> list[tuple[int, int, str]]:
    """src/string_match.h:21-89 — weighted interval scheduling over a sentence.

    Returns segments ``(l, r, type_str)`` tiling ``[0, len(tokens))``;
    ``type_str`` is the comma-joined sorted type set ("" for skip segments).
    Score: core match = len²; full-dict (FILTERED) match = weight·len²;
    skip = 0. Strict ``<``/``>`` comparisons reproduce the reference's
    tie-breaking (earliest-computed candidate wins). Matching never crosses
    the "\\n" sentinel (src/string_match.h:35-37).
    """
    n = len(tokens)
    NEG = float("-inf")
    f = [NEG] * (n + 1)
    f[0] = 0.0
    tb_i = [0] * (n + 1)
    tb_types: list[frozenset[str] | None] = [None] * (n + 1)
    nodes = trie.nodes
    root_children = nodes[0].children
    for i in range(n):
        if f[i] > f[i + 1]:
            f[i + 1] = f[i]
            tb_i[i + 1] = i
            tb_types[i + 1] = None
        tok = tokens[i]
        if tok == "\n":
            continue
        u = root_children.get(tok, -1)
        if u == -1:
            continue
        fi = f[i]
        delta = 0
        j = i
        while j < n:
            t = tokens[j]
            if t == "\n":
                break
            if j > i:
                u = nodes[u].children.get(t, -1)
                if u == -1:
                    break
            delta += 1
            types = nodes[u].types
            if types:
                if FILTERED_TYPE not in types:  # entity (core dict)
                    score = fi + delta * delta
                    if f[j + 1] < score:
                        f[j + 1] = score
                        tb_i[j + 1] = i
                        tb_types[j + 1] = frozenset(types)
                elif len(types) == 1:  # filtered (full dict only)
                    score = fi + weight * delta * delta
                    if f[j + 1] < score:
                        f[j + 1] = score
                        tb_i[j + 1] = i
                        tb_types[j + 1] = frozenset(types)
            j += 1
    out: list[tuple[int, int, str]] = []
    j = n
    while j > 0:
        i = tb_i[j]
        ts = tb_types[j]
        out.append((i, j, ",".join(sorted(ts)) if ts else ""))
        j = i
    out.reverse()
    return out
