"""Checksum kernels vs the C zlib oracle (checkseum's role, SURVEY §2 #25)."""

import zlib

import numpy as np
import pytest

from decompress_tpu.ops import checksum


LENGTHS = [1, 2, 7, 255, 256, 257, 511, 512, 513, 4096, 100_000, 1 << 20]


@pytest.mark.parametrize("n", LENGTHS)
def test_crc32_matches_zlib(n):
    rng = np.random.default_rng(n)
    data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
    assert checksum.crc32(data) == zlib.crc32(data)


@pytest.mark.parametrize("n", LENGTHS)
def test_adler32_matches_zlib(n):
    rng = np.random.default_rng(n + 1)
    data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
    assert checksum.adler32(data) == zlib.adler32(data)


def test_running_updates():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, size=1000, dtype=np.uint8).tobytes()
    b = rng.integers(0, 256, size=3333, dtype=np.uint8).tobytes()
    assert checksum.crc32(b, checksum.crc32(a)) == zlib.crc32(b, zlib.crc32(a))
    assert checksum.adler32(b, checksum.adler32(a)) == zlib.adler32(b, zlib.adler32(a))


def test_combines():
    rng = np.random.default_rng(8)
    a = rng.integers(0, 256, size=5000, dtype=np.uint8).tobytes()
    b = rng.integers(0, 256, size=12345, dtype=np.uint8).tobytes()
    c_a, c_b = zlib.crc32(a), zlib.crc32(b)
    assert checksum.crc32_combine(c_a, c_b, len(b)) == zlib.crc32(a + b)
    ad_a, ad_b = zlib.adler32(a), zlib.adler32(b)
    assert checksum.adler32_combine(ad_a, ad_b, len(b)) == zlib.adler32(a + b)


def test_empty_and_all_zero():
    assert checksum.crc32(b"") == zlib.crc32(b"")
    assert checksum.adler32(b"") == zlib.adler32(b"")
    z = bytes(10000)
    assert checksum.crc32(z) == zlib.crc32(z)
    assert checksum.adler32(z) == zlib.adler32(z)


def test_pallas_crc_kernel_interpret():
    """The Pallas MXU GF(2) matmul kernel, run in interpret mode (the
    kernel sanitizer harness): must agree with the XLA dot path and
    with the zlib oracle."""
    import zlib

    import jax.numpy as jnp
    import numpy as np

    from decompress_tpu.ops import checksum as cks

    rng = np.random.default_rng(42)
    data = rng.integers(0, 256, 3 * cks.CRC_CHUNK * 128, np.uint8)
    # direct kernel-vs-dot comparison on the same bits
    h = np.asarray(cks._crc_chunk_matrix(), np.float32)
    chunks = data.reshape(-1, cks.CRC_CHUNK).astype(np.int32)
    bits = ((chunks[:, :, None] >> np.arange(8)[None, None, :]) & 1)
    bits = bits.reshape(chunks.shape[0], -1).astype(np.float32)
    got = np.asarray(cks._crc_matmul_pallas(jnp.asarray(bits), jnp.asarray(h),
                                            interpret=True))
    want = (bits @ h).astype(np.int64) & 1
    assert (got == want).all()

    # end to end through the register path with the kernel forced on
    old = cks._PALLAS_MODE
    cks._PALLAS_MODE = "interpret"
    try:
        assert cks.crc32(data) == zlib.crc32(bytes(data))
        assert cks.crc32(data[: cks.CRC_CHUNK + 7]) == zlib.crc32(
            bytes(data[: cks.CRC_CHUNK + 7]))
    finally:
        cks._PALLAS_MODE = old
