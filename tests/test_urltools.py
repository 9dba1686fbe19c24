"""URL canonicalizer rule battery — adversarial cases the driver's
arithmetic synth never hits (the synth path is value-hashed by the
pages_url_canonical_* oracles)."""

import pyarrow as pa

from autoner_ray.stages.urltools import (
    canonicalize_batch,
    canonicalize_url,
    synth_variants_batch,
)

CASES = {
    # scheme/host case, default port, fragment
    "HTTP://WWW.Foo.COM:80/Bar?x=1#sec": "http://www.foo.com/Bar?x=1",
    # non-default port survives
    "http://a.b:8080/x/": "http://a.b:8080/x",
    # https default port
    "HTTPS://a.b:443/": "https://a.b/",
    # param sort is (key, value) — duplicate keys kept, values ordered
    "https://a.b/x?b=2&a=1&a=0": "https://a.b/x?a=0&a=1&b=2",
    # tracking params dropped, incl. every utm_*
    "https://a.b/?utm_source=s&utm_medium=m&fbclid=f&gclid=g&msclkid=k"
    "&ref=r&keep=1": "https://a.b/?keep=1",
    # all params dropped -> no '?'
    "https://a.b/p?utm_campaign=c": "https://a.b/p",
    # root slash kept; bare authority unchanged
    "https://a.b/": "https://a.b/",
    "https://a.b": "https://a.b",
    # multiple trailing slashes collapse with the path
    "https://a.b/x///": "https://a.b/x",
    # PATH case is significant per RFC 3986 — must NOT be lowered
    "https://a.b/CaseSensitive": "https://a.b/CaseSensitive",
    # blank param values survive
    "https://a.b/x?a=&b=1": "https://a.b/x?a=&b=1",
}


def test_rule_battery():
    for raw, want in CASES.items():
        assert canonicalize_url(raw) == want, raw


def test_idempotent():
    for raw in CASES:
        once = canonicalize_url(raw)
        assert canonicalize_url(once) == once


def test_batch_kernel_and_synth():
    docs = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64())})
    v = synth_variants_batch(docs)
    # 2 variants each + a third for doc_id % 3 == 0 (ids 0 and 3)
    assert len(v) == 2 * 4 + 2
    out = canonicalize_batch(v)
    canon = out["url_canon"].to_pylist()
    ids = v["doc_id"].to_pylist()
    assert canon == [
        f"https://example.org/doc/{i}?id={i}" for i in ids
    ]
    # empty-block guards
    assert len(canonicalize_batch(pa.table({}))) == 0
    assert len(synth_variants_batch(pa.table({}))) == 0
