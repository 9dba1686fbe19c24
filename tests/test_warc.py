"""WARC sink/source: byte-fidelity roundtrip and parser robustness."""

import gzip

import pyarrow as pa

from autoner_ray.sources.warc import (
    _gzip_member,
    _response_record,
    _warcinfo_record,
    parse_warc_bytes,
    read_warc,
    write_warc,
)

_TS0 = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z us


def _pages_table() -> pa.Table:
    # payload with CRLFs, blank lines and markup — framing must be
    # driven by Content-Length, not line scanning
    htmls = [
        b"<html><p>plain</p></html>",
        b"<html>\r\n\r\n<p>crlf body</p>\r\n</html>",
        b"",
    ]
    return pa.table(
        {
            "url": pa.array(
                [f"https://example.org/doc/{i}" for i in range(3)]
            ),
            "warc_ts": pa.array(
                [_TS0 + i * 1_000_000 for i in range(3)],
                pa.timestamp("us"),
            ),
            "html": pa.array(htmls, pa.binary()),
        }
    )


def test_parse_roundtrips_records_and_skips_warcinfo():
    t = _pages_table()
    raw = _gzip_member(_warcinfo_record()) + b"".join(
        _gzip_member(
            _response_record(
                t["url"][i].as_py(),
                _TS0 + i * 1_000_000,
                t["html"][i].as_py(),
            )
        )
        for i in range(len(t))
    )
    back = parse_warc_bytes(raw)
    assert back["url"].to_pylist() == t["url"].to_pylist()
    assert back["html"].to_pylist() == t["html"].to_pylist()
    assert (
        back["warc_ts"].cast(pa.int64()).to_pylist()
        == t["warc_ts"].cast(pa.int64()).to_pylist()
    )


def test_gzip_members_are_deterministic_and_concatenated():
    rec = _response_record("https://example.org/doc/1", _TS0, b"<p>x</p>")
    assert _gzip_member(rec) == _gzip_member(rec)  # mtime pinned
    two = _gzip_member(rec) + _gzip_member(rec)
    assert gzip.decompress(two) == rec + rec  # multi-member stream


def test_write_read_warc_dataset_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    t = _pages_table()
    out = str(tmp_path / "warc")
    write_warc(rd.from_arrow(t), out)
    back = (
        read_warc(out)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(back["url"]) == t["url"].to_pylist()
    assert [bytes(b) for b in back["html"]] == t["html"].to_pylist()


def test_parse_tolerates_real_crawl_shapes():
    """Responses with no Content-Length (chunked/connection-close),
    records missing mandatory headers, and envelope-less payloads must
    parse (body = remainder) or be skipped — never raise or silently
    truncate to b''."""
    from autoner_ray.sources.warc import _record

    body = b"<html>\r\n\r\n<p>no content-length</p></html>"
    http_no_cl = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    rec_no_cl = _record(
        [
            ("WARC-Type", "response"),
            ("WARC-Date", "2020-01-01T00:00:05Z"),
            ("WARC-Target-URI", "https://example.org/doc/5"),
        ],
        http_no_cl,
    )
    rec_no_uri = _record(
        [("WARC-Type", "response"), ("WARC-Date", "2020-01-01T00:00:06Z")],
        b"HTTP/1.1 200 OK\r\n\r\nx",
    )
    rec_no_envelope = _record(
        [
            ("WARC-Type", "response"),
            ("WARC-Date", "2020-01-01T00:00:07Z"),
            ("WARC-Target-URI", "https://example.org/doc/7"),
        ],
        b"no-crlfcrlf-anywhere",
    )
    out = parse_warc_bytes(rec_no_cl + rec_no_uri + rec_no_envelope)
    assert out["url"].to_pylist() == [
        "https://example.org/doc/5",
        "https://example.org/doc/7",
    ]
    assert out["html"].to_pylist() == [body, b""]
