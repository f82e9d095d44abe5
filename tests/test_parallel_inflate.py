"""Member-parallel device inflate tests (the decode half of config 5)."""

import gzip

import numpy as np
import pytest

from decompress_tpu import de, gz
from decompress_tpu.parallel import (
    sharded_gzip_compress,
    sharded_gzip_decompress,
)
from decompress_tpu.parallel.sharded import _read_index

MEMBER = 8192


@pytest.fixture(scope="module")
def payload():
    rng = np.random.default_rng(11)
    return (
        b"parallel inflate payload " * 1500
        + rng.integers(0, 256, 15000, np.uint8).tobytes()
        + b"\x00" * 5000
    )


def test_indexed_archive_roundtrip(payload):
    arch = sharded_gzip_compress(payload, 6, member_size=MEMBER)
    # foreign tools read the indexed archive unchanged
    assert gzip.decompress(arch) == payload
    # the index lists every member and spans the archive exactly
    sizes = _read_index(de._np_u8(arch))
    assert sizes is not None and sum(sizes) == len(arch)
    # device-parallel decode is byte-exact
    assert sharded_gzip_decompress(arch) == payload


def test_unindexed_falls_back(payload):
    arch = sharded_gzip_compress(payload, 6, member_size=MEMBER, index=False)
    assert sharded_gzip_decompress(arch) == payload


def test_parallel_decode_levels(payload):
    for level in (1, 9):
        arch = sharded_gzip_compress(payload, level, member_size=MEMBER)
        assert sharded_gzip_decompress(arch) == payload


def test_corrupted_member_detected(payload):
    arch = bytearray(sharded_gzip_compress(payload, 6, member_size=MEMBER))
    sizes = _read_index(de._np_u8(bytes(arch)))
    # flip a byte inside the second member's compressed body
    off = sizes[0] + 20
    arch[off] ^= 0x10
    with pytest.raises(de.MalformedError):
        sharded_gzip_decompress(bytes(arch))


def test_stored_members_roundtrip():
    rng = np.random.default_rng(12)
    incompressible = rng.integers(0, 256, 40000, np.uint8).tobytes()
    arch = sharded_gzip_compress(incompressible, 6, member_size=MEMBER)
    assert gzip.decompress(arch) == incompressible
    # stored members are not single huffman blocks -> serial fallback
    assert sharded_gzip_decompress(arch) == incompressible


def test_device_path_actually_runs(payload, monkeypatch):
    """Regression: a root-bits mismatch once made every member decode
    fail ok=False and silently fall back to the serial path."""
    from decompress_tpu.parallel import sharded as sh

    arch = sharded_gzip_compress(payload, 6, member_size=MEMBER)

    def _no_fallback(_buf):
        raise AssertionError("device decode fell back to the serial path")

    monkeypatch.setattr(sh.gz, "decompress", _no_fallback)
    assert sh.sharded_gzip_decompress(arch) == payload
