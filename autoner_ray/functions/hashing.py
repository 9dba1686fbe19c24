"""Memoized 64-bit md5 token hashing shared by the sketch kernels.

The MinHash shingle hasher, SimHash token hasher and rolling-fingerprint
token hasher all need ``int.from_bytes(md5(x).digest()[:8], "big")`` per
token/shingle. Hashing one string at a time in Python dominated those
kernels' wall time (VERDICT r2 §What's-wrong 4). Web text is Zipfian, so
a per-worker-process memo table turns the vast majority of md5 calls
into dict hits; the table is bounded and cleared (not LRU-evicted — the
refill cost is one md5 per distinct key) so a worker that streams an
unbounded vocabulary can't grow without limit.

The hash FUNCTION is unchanged — every sketch here is value-pinned by a
driver oracle or pytest, so outputs must stay bit-identical.
"""

from __future__ import annotations

import hashlib

import numpy as np

_CACHE: dict[object, int] = {}
_CACHE_MAX = 1 << 21  # ~2M distinct keys ≈ tens of MB per worker


def md5_64(key: str | bytes) -> int:
    """Big-endian first-8-bytes md5 of a token, memoized per process."""
    v = _CACHE.get(key)
    if v is None:
        if len(_CACHE) >= _CACHE_MAX:
            _CACHE.clear()
        data = key.encode() if isinstance(key, str) else key
        v = int.from_bytes(hashlib.md5(data).digest()[:8], "big")
        _CACHE[key] = v
    return v


def md5_64_array(keys) -> np.ndarray:
    """uint64 md5 prefixes for a sequence of tokens, memoized."""
    out = np.empty(len(keys), np.uint64)
    cache = _CACHE
    for i, k in enumerate(keys):
        v = cache.get(k)
        if v is None:
            if len(cache) >= _CACHE_MAX:
                cache.clear()
            data = k.encode() if isinstance(k, str) else k
            v = int.from_bytes(hashlib.md5(data).digest()[:8], "big")
            cache[k] = v
        out[i] = v
    return out
