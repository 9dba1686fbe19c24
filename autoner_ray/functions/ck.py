"""Tie-or-Break annotation projections + ``.ck`` / BIOES serialization.

Parity targets (citations into /root/reference):
- boundary projection   src/annotation.h:267-296 (``getBoundary``):
  default Break(1); entity span: l -> 1, interior -> -1; FILTERED span
  marks ``[l, r]`` INCLUSIVE — the off-by-one extends Unknown one token
  past the span end (src/annotation.h:278-280); single-char whitespace
  separator segments (non-"\\n") are skipped and keep the default.
- type projection       src/annotation.h:298-317 (``getTypes``): default
  "None"; only entity spans stamp their comma-joined type.
- ``.ck`` writer        src/annotation.h:319-351 (``toCk``): 4 columns
  ``token I/O type S/D``; sentences wrapped ``<s> O None S`` … ``<eof> I
  None S``; "-DOCSTART-" / "\\n" raw tokens are emitted literally.
- BIOES writer          src/annotation.h:353-394 (``toBIOES``).

Inputs are the ``(raw_tokens, segments)`` pair produced by
:func:`autoner_ray.state.trie.segment_dp`; segments are ``(l, r, type_str)``
with ``type_str`` "" for O and ``__FILTERED__`` for full-dict spans.
"""

from __future__ import annotations

from autoner_ray.functions.text import is_real_separator, is_separator_token
from autoner_ray.state.trie import FILTERED_TYPE

Segment = tuple[int, int, str]


def get_boundary(raw_tokens: list[str], segments: list[Segment]) -> list[int]:
    """src/annotation.h:267-296. 1=Break, -1=Tie/Connect, 0=Unknown."""
    n = len(raw_tokens)
    ret = [1] * n
    for l, r, type_str in segments:
        # fast path: single-token segments (the vast majority) need no
        # join; multi-token joins can never be single-char separators
        token = raw_tokens[l] if r - l == 1 else None
        if (
            token is not None
            and is_separator_token(token)
            and not is_real_separator(token)
        ):
            continue  # whitespace segment: keep default
        if type_str == FILTERED_TYPE:
            ret[l] = 0
            # INCLUSIVE right bound — the reference writes ret[r] too
            # (src/annotation.h:278-280). When r == n that write is past
            # the end of the C++ vector; clamp (the corpus sentinel makes
            # it unobservable in the reference flow).
            for j in range(l + 1, min(r, n - 1) + 1):
                ret[j] = 0
        elif type_str == "":
            pass  # O: default already Break
        else:
            ret[l] = 1
            for j in range(l + 1, r):
                ret[j] = -1
    return ret


def get_types(raw_tokens: list[str], segments: list[Segment]) -> list[str]:
    """src/annotation.h:298-317."""
    ret = ["None"] * len(raw_tokens)
    for l, r, type_str in segments:
        if r - l == 1:
            token = raw_tokens[l]
            if is_separator_token(token) and not is_real_separator(token):
                continue
        if type_str and type_str != FILTERED_TYPE:
            for j in range(l, r):
                ret[j] = type_str
    return ret


def to_ck(
    raw_tokens: list[str],
    segments: list[Segment],
    boundary: list[int] | None = None,
    types: list[str] | None = None,
) -> str:
    """src/annotation.h:319-351 — byte-compatible ``.ck`` serialization.

    ``boundary``/``types`` may be passed pre-computed (they are pure
    projections of ``segments``) so hot callers derive them once."""
    if boundary is None:
        boundary = get_boundary(raw_tokens, segments)
    if types is None:
        types = get_types(raw_tokens, segments)
    out: list[str] = []
    status = 0  # outside
    for i, tok in enumerate(raw_tokens):
        if tok == "-DOCSTART-" or tok == "\n":
            if status == 1:
                out.append("<eof> I None S\n")
                status = 0
            out.append(tok + "\n")
            continue
        if status != 1:
            out.append("<s> O None S\n")
            status = 1
        if boundary[i] == 0:
            assert types[i] == "None"
            out.append(f"{tok} O None D\n")
        elif boundary[i] == 1:
            out.append(f"{tok} I {types[i]} S\n")
        else:
            out.append(f"{tok} O {types[i]} S\n")
    return "".join(out)


_UNKNOWN_BIOES = (
    "B-Chemical,I-Chemical,E-Chemical,S-Chemical,"
    "B-Disease,I-Disease,E-Disease,S-Disease,O"
)


def to_bioes(raw_tokens: list[str], segments: list[Segment]) -> str:
    """src/annotation.h:353-394 — alternative BIOES sink."""
    boundary = get_boundary(raw_tokens, segments)
    types = get_types(raw_tokens, segments)
    out: list[str] = []
    n = len(raw_tokens)
    for i, tok in enumerate(raw_tokens):
        if tok == "-DOCSTART-" or tok == "\n":
            out.append("\n")
            continue
        if boundary[i] == 0:
            assert types[i] == "None"
            out.append(f"{tok} {_UNKNOWN_BIOES}\n")
        elif boundary[i] == 1:
            if types[i] == "None":
                # note the double space — the reference writes "token  O"
                # (src/annotation.h:371: ``sout << " O"`` after "token ")
                out.append(f"{tok}  O\n")
            elif i + 1 < n and boundary[i + 1] == -1:
                out.append(f"{tok} B-{types[i]}\n")
            else:
                out.append(f"{tok} S-{types[i]}\n")
        else:
            if i + 1 < n and boundary[i + 1] == -1:
                out.append(f"{tok} I-{types[i]}\n")
            else:
                out.append(f"{tok} E-{types[i]}\n")
    return "".join(out)


def parse_ck(text: str, keep_danger: bool = True):
    """Inverse reader for ``.ck`` content — the per-sentence contract of
    preprocess_partial_ner/encode_folder.py:55-104 (``read_noisy_corpus``).

    Yields ``(tokens, breaks, types, safe)`` per sentence where ``breaks``
    is the I/O column as 1/0 ints, ``types`` the third column and ``safe``
    the S/D column as True/False. ``<s>``/``<eof>`` wrappers are included
    as in the reference reader.
    """
    sentences = []
    cur_t: list[str] = []
    cur_b: list[int] = []
    cur_y: list[str] = []
    cur_s: list[bool] = []
    for line in text.split("\n"):
        if line == "" or line == "\n" or line == "-DOCSTART-":
            if cur_t:
                sentences.append((cur_t, cur_b, cur_y, cur_s))
                cur_t, cur_b, cur_y, cur_s = [], [], [], []
            continue
        cols = line.split(" ")
        if len(cols) != 4:
            continue
        tok, io, ty, sd = cols
        cur_t.append(tok)
        cur_b.append(1 if io == "I" else 0)
        cur_y.append(ty)
        cur_s.append(sd == "S")
        if tok == "<eof>":
            sentences.append((cur_t, cur_b, cur_y, cur_s))
            cur_t, cur_b, cur_y, cur_s = [], [], [], []
    if cur_t:
        sentences.append((cur_t, cur_b, cur_y, cur_s))
    return sentences


def bioes_to_ck(lines, ignore_misc: bool = False) -> str:
    """S13: re-encode gold BIOES lines to Tie-or-Break ``.ck`` (3-col).

    Line-exact port of the stateful FSM in
    `preprocess_partial_ner/bioes_chunking.py:11-82`: ``B-``/``S-`` start
    a chunk (``I`` = Break before the token), ``I-``/``E-`` continue one
    (``O`` = Tie), ``O``/MISC-ignored tokens are singletons; sentences
    are wrapped in ``<s> O None`` / ``<eof> I None``. The reference's
    ``alread_ends`` flag changes nothing observable (both branches write
    ``I None``) and is kept only as a comment, not code.
    """
    out: list[str] = []
    start = False
    for line in lines:
        if not line.strip() or line.startswith("-DOCSTART-"):
            if start:
                out.append("<eof> I None\n\n")
            else:
                out.append("\n")
            start = False
            continue
        tups = line.split()
        label = tups[-1]
        misc = ignore_misc and label.endswith("MISC")
        if not start:
            if label == "O" or misc:
                out.append(f"<s> O None\n{tups[0]} I None\n")
            else:
                out.append(
                    f"<s> O None\n{tups[0]} I {label.split('-')[-1]}\n"
                )
            start = True
        elif misc:
            out.append(f"{tups[0]} I None\n")
        elif label.startswith(("B-", "S-")):
            out.append(f"{tups[0]} I {label.split('-')[-1]}\n")
        elif label.startswith(("E-", "I-")):
            out.append(f"{tups[0]} O {label.split('-')[-1]}\n")
        else:
            out.append(f"{tups[0]} I None\n")
    if start:
        out.append("<eof> I None\n")
    else:
        out.append("\n")
    return "".join(out)
