"""Decoder snapshot/resume (reference immutable-decoder parity).

The reference's zl/gz decoders are immutable records: a decoder value
copied mid-stream can be resumed later, independently of the original
(`/root/reference/lib/zl.ml:146-164` "immutable style", exercised by
`/root/reference/test/test.ml:1450-1496`).  Here the equivalent is an
explicit `clone()` that memcpy-snapshots the native machine state
(bit buffer, mode, tables, 32 KiB window) plus the Python wrapper
fields.
"""

import gzip
import pathlib
import zlib

import pytest

from decompress_tpu import gz, streaming, zl

CORPUS = pathlib.Path(__file__).parent / "corpus"


def _drain(inf, feed, chunk=1):
    """Drive a decoder over `feed` in `chunk`-byte steps; returns
    (output, leftover_feed) without signalling end-of-input."""
    out = b""
    pos = 0
    while True:
        tok = inf.decode()
        if tok == "end":
            out += inf.flush()
            return out, feed[pos:], True
        if tok == "flush":
            out += inf.flush()
        elif tok == "await":
            if pos >= len(feed):
                return out, b"", False
            inf.src(feed[pos : pos + chunk])
            pos += chunk
        else:
            raise AssertionError(f"malformed: {inf.error}")


def _finish(inf, rest, chunk=257):
    out = b""
    pos = 0
    while True:
        tok = inf.decode()
        if tok == "flush":
            out += inf.flush()
        elif tok == "await":
            if pos < len(rest):
                inf.src(rest[pos : pos + chunk])
                pos += chunk
            else:
                inf.src(b"")
        elif tok == "end":
            return out + inf.flush()
        else:
            raise AssertionError(f"malformed: {inf.error}")


def test_inflate_clone_resumes_byte_split():
    """Snapshot the raw-DEFLATE decoder at every-317-byte split points;
    each clone, resumed independently, reproduces the exact tail."""
    data = (CORPUS / "paper1").read_bytes()[:40000]
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    stream = co.compress(data) + co.flush()
    # build the reference full decode
    full = streaming.Inflate()
    full_out = _finish(full, stream)
    assert full_out == data

    for split in range(300, len(stream), 317):
        inf = streaming.Inflate()
        head_out, _, ended = _drain(inf, stream[:split], chunk=split)
        assert not ended or split >= len(stream)
        snap = inf.clone()
        # run the ORIGINAL to completion first (mutating it must not
        # disturb the snapshot)
        orig_tail = _finish(inf, stream[split:])
        # now resume the clone
        clone_tail = _finish(snap, stream[split:])
        assert head_out + orig_tail == data
        assert clone_tail == orig_tail


def test_inflate_clone_is_independent():
    """Feeding the original malformed bytes after the snapshot leaves
    the clone decodable."""
    data = b"independence day " * 500
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    stream = co.compress(data) + co.flush()
    inf = streaming.Inflate()
    out0, _, _ = _drain(inf, stream[:200], chunk=200)
    snap = inf.clone()
    # poison the original
    inf.src(b"\xff" * 64)
    inf.src(b"")
    while inf.decode() not in ("end", "malformed"):
        inf.flush()
    # the clone still finishes cleanly
    tail = _finish(snap, stream[200:])
    assert out0 + tail == data


@pytest.mark.parametrize("split_frac", [0.1, 0.5, 0.9])
def test_zl_inf_clone(split_frac):
    data = (CORPUS / "progc").read_bytes()
    stream = zlib.compress(data, 6)
    split = max(1, int(len(stream) * split_frac))
    inf = zl.Inf()
    head_out, _, _ = _drain(inf, stream[:split], chunk=split)
    snap = inf.clone()
    orig_tail = _finish(inf, stream[split:])
    clone_tail = _finish(snap, stream[split:])
    assert head_out + orig_tail == data
    assert clone_tail == orig_tail


def test_zl_inf_clone_mid_header():
    """Cloning before the body decoder exists (header phase) works."""
    data = b"header-phase clone" * 100
    stream = zlib.compress(data, 6)
    inf = zl.Inf()
    inf.src(stream[:1])  # half the CMF/FLG pair
    assert inf.decode() == "await"
    snap = inf.clone()
    assert _finish(snap, stream[1:]) == data
    assert _finish(inf, stream[1:]) == data


@pytest.mark.parametrize("split_frac", [0.2, 0.7])
def test_gz_inf_clone(split_frac):
    data = (CORPUS / "progp").read_bytes()
    stream = gzip.compress(data, 6)
    split = max(12, int(len(stream) * split_frac))
    inf = gz.Inf()
    head_out, _, _ = _drain(inf, stream[:split], chunk=split)
    snap = inf.clone()
    orig_tail = _finish(inf, stream[split:])
    clone_tail = _finish(snap, stream[split:])
    assert head_out + orig_tail == data
    assert clone_tail == orig_tail
    # metadata snapshot survives on both
    if split > 10:
        assert snap.metadata is not None or inf.metadata is not None


def test_set_cursor_delta_flow():
    """Window-cursor restore (reference `unsafe_set_cursor`,
    de.ml:1826 / de.mli:669): decode a base object, reset the machine
    KEEPING the window, and decode a delta stream whose far distances
    resolve into the base — no set_dictionary copy.  Moving the cursor
    shifts how references resolve (and is the caller's risk, as in the
    reference)."""
    import zlib

    import numpy as np

    from decompress_tpu.streaming import Inflate

    rng = np.random.default_rng(23)
    base = bytes(int(b) for b in rng.integers(0, 7, 3000))
    delta_src = base[500:900] + b"-interlude-" + base[2200:2600]
    co = zlib.compressobj(6, zlib.DEFLATED, -15, 9, 0, base)
    delta = co.compress(delta_src) + co.flush()

    cb = zlib.compressobj(6, zlib.DEFLATED, -15)
    base_stream = cb.compress(base) + cb.flush()

    inf = Inflate()
    inf.src(base_stream)
    inf.src(b"")
    out = bytearray()
    while inf.decode() != "end":
        out += inf.flush()
    out += inf.flush()
    assert bytes(out) == base
    assert inf.cursor == len(base)

    # delta decode against the retained window, cursor untouched
    inf.reset_keep_window()
    inf.src(delta)
    inf.src(b"")
    out2 = bytearray()
    while inf.decode() != "end":
        out2 += inf.flush()
    out2 += inf.flush()
    assert bytes(out2) == delta_src

    # an explicitly MOVED cursor changes reference resolution: decoding
    # the same delta with the cursor shifted back cannot reproduce it
    inf2 = Inflate()
    inf2.src(base_stream)
    inf2.src(b"")
    out3 = bytearray()
    while inf2.decode() != "end":
        out3 += inf2.flush()
    out3 += inf2.flush()
    inf2.reset_keep_window()
    inf2.unsafe_set_cursor(len(base) - 64)
    assert inf2.cursor == len(base) - 64
    inf2.src(delta)
    inf2.src(b"")
    out4 = bytearray()
    while inf2.decode() not in ("end", "malformed"):
        out4 += inf2.flush()
    out4 += inf2.flush()
    assert bytes(out4) != delta_src
