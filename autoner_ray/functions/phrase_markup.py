"""M9: phrase-markup distant-supervision parser.

Alternative supervision entry of the reference
(`src/annotation.h:397-476`, ``getDistantSupervision(filename)`` — the
AutoPhrase-output path, unused by ``generate.cpp`` but kept as an
extension point): lines carry ``<phrase>tok tok</phrase>`` markup; each
marked phrase is probed against the KB —

- phrase found in the KB with entity types -> one TYPED segment over its
  tokens (types comma-joined, set-sorted, `annotation.h:440-452`);
- phrase not in the KB -> the span is marked FILTERED (unknown quality,
  `annotation.h:453-460`);
- unmarked tokens are plain (type ``""``).

Returns (tokens, segments) in the engine's segment form, directly
consumable by `functions/ck.to_ck` and the tagger's supervision
builders.
"""

from __future__ import annotations

import re

from autoner_ray.state.trie import FILTERED_TYPE, KBTrie

_MARK_RE = re.compile(r"<phrase>(.*?)</phrase>|([^<\s][^\s<]*)")


def parse_phrase_markup(line: str, trie: KBTrie):
    """One markup line -> (tokens, segments [(l, r, type)])."""
    tokens: list[str] = []
    segments: list[tuple[int, int, str]] = []
    plain_start = 0

    def flush_plain(upto: int):
        nonlocal plain_start
        for i in range(plain_start, upto):
            segments.append((i, i + 1, ""))
        plain_start = upto

    for m in _MARK_RE.finditer(line):
        phrase, word = m.group(1), m.group(2)
        if word is not None:
            tokens.append(word)
            continue
        ptoks = phrase.split()
        if not ptoks:
            continue
        flush_plain(len(tokens))
        l = len(tokens)
        tokens.extend(ptoks)
        ty = trie.get_type_from_kb(ptoks)
        entity_types = sorted(
            t for t in ty.split(",") if t and t != FILTERED_TYPE
        )
        if entity_types:
            segments.append((l, len(tokens), ",".join(entity_types)))
        else:
            segments.append((l, len(tokens), FILTERED_TYPE))
        plain_start = len(tokens)
    flush_plain(len(tokens))
    segments.sort(key=lambda s: s[0])
    return tokens, segments
