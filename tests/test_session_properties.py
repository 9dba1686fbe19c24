"""Hypothesis property pins for this session's pure kernels (no Ray):
URL canonicalizer invariants, PPM/AIFF codec roundtrips on arbitrary
shapes, Kosaraju vs brute force on shrinkable random digraphs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from autoner_ray.stages.urltools import canonicalize_url

_scheme = st.sampled_from(["http", "https", "HTTP", "HttpS"])
_host = st.from_regex(r"[A-Za-z][A-Za-z0-9.-]{0,15}", fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~-]{0,8}){0,4}/?", fullmatch=True)
_key = st.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True)
_val = st.from_regex(r"[A-Za-z0-9_-]{0,6}", fullmatch=True)
_query = st.lists(st.tuples(_key, _val), max_size=5)


@st.composite
def _urls(draw):
    scheme = draw(_scheme)
    host = draw(_host)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(_path)
    q = draw(_query)
    qs = "&".join(f"{k}={v}" for k, v in q)
    frag = draw(st.sampled_from(["", "#top", "#a-b"]))
    return f"{scheme}://{host}{port}{path}" + (f"?{qs}" if qs else "") + frag


@settings(max_examples=200, deadline=None)
@given(_urls())
def test_canonicalize_idempotent(url):
    once = canonicalize_url(url)
    assert canonicalize_url(once) == once


@settings(max_examples=100, deadline=None)
@given(_urls())
def test_canonicalize_invariants(url):
    out = canonicalize_url(url)
    assert "#" not in out                      # fragment gone
    assert "utm_" not in out.split("?")[0]     # never invents params
    scheme = out.split("://", 1)[0]
    assert scheme == scheme.lower()
    # default ports stripped
    rest = out.split("://", 1)[1]
    host = rest.split("/", 1)[0]
    if scheme == "http":
        assert not host.endswith(":80")
    if scheme == "https":
        assert not host.endswith(":443")


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.tuples(_key, _val), min_size=1, max_size=5, unique=True)
)
def test_canonicalize_query_order_invariant(params):
    import random

    base = "https://a.b/p?"
    qs1 = "&".join(f"{k}={v}" for k, v in params)
    shuffled = params[:]
    random.Random(0).shuffle(shuffled)
    qs2 = "&".join(f"{k}={v}" for k, v in shuffled)
    assert canonicalize_url(base + qs1) == canonicalize_url(base + qs2)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 12), st.integers(1, 12),
    st.integers(0, 2**32 - 1),
)
def test_ppm_roundtrip(h, w, seed):
    from autoner_ray.stages.multimodal import decode_ppm, encode_ppm

    px = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 500), st.sampled_from([1, 2000, 44100, 96000]),
    st.integers(0, 2**32 - 1),
)
def test_aiff_roundtrip(n, rate, seed):
    from autoner_ray.stages.multimodal import decode_aiff, encode_aiff

    samples = (
        np.random.default_rng(seed).standard_normal(n) * 10000
    ).astype(np.int16)
    r, back = decode_aiff(encode_aiff(samples, rate=rate))
    assert r == rate and np.array_equal(back, samples)


@st.composite
def _digraphs(draw):
    n = draw(st.integers(2, 16))
    edges = draw(
        st.lists(
            st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
            min_size=1, max_size=40,
        )
    )
    return [(a, b) for a, b in edges if a != b]


@settings(max_examples=60, deadline=None)
@given(_digraphs())
def test_kosaraju_property(pairs):
    from autoner_ray.stages.graph import _scc_kosaraju

    if not pairs:
        return
    src = np.array([a for a, _ in pairs], np.int64)
    dst = np.array([b for _, b in pairs], np.int64)
    nodes, inv = np.unique(np.concatenate([src, dst]),
                           return_inverse=True)
    s2 = inv[: len(src)].astype(np.int64)
    d2 = inv[len(src):].astype(np.int64)
    comp = _scc_kosaraju(s2, d2)
    # validate: same label <=> mutual reachability
    n = len(nodes)
    adj = [[] for _ in range(n)]
    for a, b in zip(s2, d2):
        adj[int(a)].append(int(b))

    def reach(v):
        seen = {v}
        st_ = [v]
        while st_:
            u = st_.pop()
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    st_.append(w)
        return seen

    R = [reach(v) for v in range(n)]
    for v in range(n):
        for u in range(n):
            mutual = u in R[v] and v in R[u]
            assert (comp[v] == comp[u]) == mutual
    # label is the smallest member of the component
    for v in range(n):
        members = [u for u in range(n) if comp[u] == comp[v]]
        assert comp[v] == min(members)
