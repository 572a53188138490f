"""Unit pins for the stress-harness parity adjudicators (no Spark).

compare_feeds decides what the GTFS sink race PUBLISHES about two
written feeds — a bug here misreports a race, so its verdict ladder
(bytes → same-order-EOL-only → same-multiset → DIFFERENT) is pinned on
crafted files, including the asymmetric-EOL and reordered cases the
64×/128× runs actually hit."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.stress_gtfs import _multiset_md5, compare_feeds  # noqa: E402


def _write(path, data: bytes):
    with open(path, "wb") as f:
        f.write(data)


def test_multiset_md5_order_insensitive_eol_insensitive(tmp_path):
    a, b, c = (str(tmp_path / n) for n in ("a.txt", "b.txt", "c.txt"))
    _write(a, b"h\r\nx,1\r\ny,2\r\n")
    _write(b, b"y,2\nh\nx,1\n")          # reordered, LF
    _write(c, b"y,2\nh\nx,3\n")          # one line differs
    assert _multiset_md5(a) == _multiset_md5(b)
    assert _multiset_md5(a) != _multiset_md5(c)


def test_multiset_md5_sees_even_duplicate_multiplicity(tmp_path):
    """An XOR-of-hashes adjudicator is blind to even multiplicities: a
    file with a line duplicated TWICE hashes equal to one missing both
    copies (each pair XORs to zero).  The sum-mod-2**128 form must
    distinguish every multiplicity."""
    a, b, c, d = (str(tmp_path / n) for n in ("a", "b", "c", "d"))
    _write(a, b"h\nx,1\nx,1\ny,2\n")   # x,1 twice
    _write(b, b"h\ny,2\n")             # x,1 zero times (XOR-equal to a)
    _write(c, b"h\nx,1\ny,2\n")        # x,1 once
    _write(d, b"h\nx,1\nx,1\nx,1\ny,2\n")  # x,1 three times
    hashes = [_multiset_md5(p) for p in (a, b, c, d)]
    assert len(set(hashes)) == 4
    # and equal multisets still match regardless of order
    e = str(tmp_path / "e")
    _write(e, b"x,1\ny,2\nh\nx,1\n")
    assert _multiset_md5(e) == hashes[0]


def test_compare_feeds_verdict_ladder(tmp_path):
    ref = tmp_path / "ref"
    got = tmp_path / "got"
    ref.mkdir(), got.mkdir()

    # bytes_identical
    _write(str(ref / "same.txt"), b"h\na,1\n")
    _write(str(got / "same.txt"), b"h\na,1\n")
    # same order, CRLF vs LF only (the reference csv module's shape)
    _write(str(ref / "eol.txt"), b"h\r\na,1\r\nb,2\r\n")
    _write(str(got / "eol.txt"), b"h\na,1\nb,2\n")
    # same multiset, different order
    _write(str(ref / "reord.txt"), b"h\na,1\nb,2\n")
    _write(str(got / "reord.txt"), b"h\nb,2\na,1\n")
    # different content
    _write(str(ref / "diff.txt"), b"h\na,1\n")
    _write(str(got / "diff.txt"), b"h\na,2\n")
    # missing on the spark side
    _write(str(ref / "missing.txt"), b"h\n")
    # prefix relationship must NOT read as same-order (zip_longest pin)
    _write(str(ref / "prefix.txt"), b"h\na,1\nb,2\n")
    _write(str(got / "prefix.txt"), b"h\na,1\n")

    out = compare_feeds(str(ref), str(got))
    assert out["same.txt"] == "bytes_identical"
    assert out["eol.txt"] == "same_lines_same_order_eol_only"
    assert out["reord.txt"] == "same_lines_different_order"
    assert out["diff.txt"] == "DIFFERENT"
    assert out["missing.txt"] == "MISSING"
    assert out["prefix.txt"] == "DIFFERENT"


def test_reference_spans_partitioned_equals_spans_sql():
    """The corpus race's reference span derivation (hash-PARTITIONED
    byte-exact gram unique — the 12.8 M memory diet) must equal the
    direct SPANS_SQL window derivation wherever the SQL can run.  The
    partition hash may only co-locate grams, never decide identity; a
    drift here silently corrupts the published parity verdicts."""
    import duckdb
    import pandas as pd

    from scripts.stress_corpus import SPANS_SQL, build_corpus, reference_spans

    pdf = build_corpus(2500)
    con = duckdb.connect()
    con.register("cur", pdf[["doc_id", "text"]])
    want = (
        con.execute(SPANS_SQL).df()
        .sort_values(["doc_id", "start_tok"]).reset_index(drop=True)
        .astype({"doc_id": "int64", "start_tok": "int64", "end_tok": "int64"})
    )
    got = (
        reference_spans(con)
        .sort_values(["doc_id", "start_tok"]).reset_index(drop=True)
        .astype({"doc_id": "int64", "start_tok": "int64", "end_tok": "int64"})
    )
    assert len(want) > 100  # the corpus must actually contain dup spans
    pd.testing.assert_frame_equal(want, got)
