"""Tokenizer and string helpers with exact semantic parity to the reference.

Parity targets (citations into /root/reference):
- separator char class        src/utils.h:161  (whitespace + ``/.,-()!?~@#$%^&*[]\\n``)
- ``simpleTokenize``          src/utils.h:195-231 (length-preserving: every
  separator char becomes its own single-char token; runs of non-separator
  chars become one token; concatenation round-trips to the input byte string)
- ``simpleTokenizeNonSep``    src/utils.h:233-247
- ``splitBy``                 src/utils.h:72-90  (drops empty fields)
- ``strip``                   src/utils.h:109-119 (strict ``l<r`` — a string
  whose length is 1, or an all-space string, keeps its last char: quirk kept)
- ``toUpper``/``toLower``     src/utils.h:143-159 (C locale: ASCII-only case map)
- ``isSeparator(token)``      src/utils.h:174-177 (single-char separators only)
- ``isRealSeparator``         src/utils.h:179-183 (== "\\n"; code after the
  first return is dead)

These run in the hot path of the tokenize stage, so the tokenizer is
regex-based (compiled once per process) with a pure-char-loop twin used by
property tests to pin equivalence.
"""

from __future__ import annotations

import re
from functools import lru_cache

# src/utils.h:161 — plus C isspace chars (space \t \n \v \f \r)
SEPARATORS = "/.,-()!?~@#$%^&*[]\n"
_C_SPACE = " \t\n\v\f\r"
_SEP_SET = frozenset(SEPARATORS) | frozenset(_C_SPACE)

# ASCII-only case maps (C locale toupper/tolower, src/utils.h:143-159)
_LOWER_TABLE = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)
_UPPER_TABLE = str.maketrans(
    "abcdefghijklmnopqrstuvwxyz", "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
)

# one char class for the tokenizer: separator chars (regex-escaped)
_SEP_CLASS = re.escape("".join(sorted(_SEP_SET)))
_TOKEN_RE = re.compile(f"[{_SEP_CLASS}]|[^{_SEP_CLASS}]+")


def is_separator_char(ch: str) -> bool:
    """src/utils.h:163-172."""
    return ch in _SEP_SET


def is_separator_token(token: str) -> bool:
    """src/utils.h:174-177 — only single-char tokens can be separators."""
    return len(token) == 1 and token in _SEP_SET


def is_real_separator(token: str) -> bool:
    """src/utils.h:179-183 — sentence sentinel only (rest is dead code)."""
    return token == "\n"


def split_by(line: str, sep: str) -> list[str]:
    """src/utils.h:72-90 — split on a single char, dropping empty fields."""
    return [t for t in line.split(sep) if t != ""]


def strip_cpp(s: str) -> str:
    """src/utils.h:109-119 — bounds converge with strict ``l < r``.

    Quirks kept: "" -> ""; a single char is never stripped; an all-space
    string of length n>=1 returns its final space.
    """
    l, r = 0, len(s) - 1
    while l < r and s[l] in _C_SPACE:
        l += 1
    while l < r and s[r] in _C_SPACE:
        r -= 1
    return s[l : r + 1]


def to_upper_ascii(s: str) -> str:
    return s.translate(_UPPER_TABLE)


def to_lower_ascii(s: str) -> str:
    return s.translate(_LOWER_TABLE)


def is_upper_ascii(token: str) -> bool:
    """src/utils.h:185-193 — every char must satisfy C isupper."""
    return all("A" <= c <= "Z" for c in token)


def simple_tokenize(s: str) -> list[str]:
    """src/utils.h:195-231 — length-preserving split; separators kept.

    Concatenating the result reproduces ``s`` byte-for-byte (the reference
    asserts this at src/utils.h:220-227; we guarantee it by construction —
    the regex alternation covers every char exactly once).
    """
    return _TOKEN_RE.findall(s)


def simple_tokenize_slow(s: str) -> list[str]:
    """Character-loop twin of :func:`simple_tokenize` (property-test anchor)."""
    ret: list[str] = []
    token = ""
    for ch in s:
        if ch in _SEP_SET:
            if token:
                ret.append(token)
                token = ""
            ret.append(ch)
        else:
            token += ch
    if token:
        ret.append(token)
    return ret


def simple_tokenize_nonsep(s: str, keep_capital: bool = False) -> list[str]:
    """src/utils.h:233-247 — drop non-newline separators, optional lowercase."""
    out = []
    for token in simple_tokenize(s):
        if is_separator_token(token) and not is_real_separator(token):
            continue
        out.append(token if keep_capital else to_lower_ascii(token))
    return out


@lru_cache(maxsize=8)
def _ws_re() -> re.Pattern:
    return re.compile(r"\s+")


def normalize_surface(surface: str) -> str:
    """Canonicalization key (north rule J5): lower, strip, collapse spaces.

    Not in the reference — the entity-canonicalization key for the KG
    pipeline. Pure function of the surface string so canonical ids are
    deterministic and shard-order independent.
    """
    return _ws_re().sub(" ", to_lower_ascii(surface)).strip()


def simple_json_to_list(s: str) -> list[str]:
    """src/utils.h:121-141 — quoted-string extractor (no escape handling,
    toggling on every ``"``; unbalanced quotes are an error, matching the
    reference's assert)."""
    out: list[str] = []
    inside = False
    token = ""
    for ch in s:
        if ch == '"':
            inside = not inside
            if not inside:
                out.append(token)
                token = ""
        elif inside:
            token += ch
    if inside:
        raise ValueError("unbalanced quotes")
    return out


def generate_signature(s: str) -> str:
    """src/utils.h:249-257 — initials signature: C-locale lowercase of the
    first char of each whitespace-delimited token."""
    return "".join(to_lower_ascii(tok[0]) for tok in s.split())


EPS = 1e-8


def sqr(x: float) -> float:
    """src/utils.h:29-32."""
    return x * x


def sign(x: float) -> int:
    """src/utils.h:34-37 — (-1, 0, 1) with EPS dead zone."""
    return -1 if x < -EPS else int(x > EPS)
