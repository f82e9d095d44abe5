"""LZO1X cross-checks against the independent minilzo-2.10 oracle.

Both of our LZO implementations (lzo.py and the native fast path in
tpuz.cpp) share an author, so self-cross-checks could miss a shared
misreading of the format.  minilzo is the format author's own code —
the reference uses it exactly this way (fuzz/fuzz_lzo.ml:19–39,
SURVEY §2 native-components item 2).  Directions covered:

* ours-compress  → minilzo-decompress  (our streams are valid LZO1X)
* minilzo-compress → ours-decompress   (we accept canonical streams)
* both on the Calgary corpus files and seeded random patterns
"""

import pathlib

import numpy as np
import pytest

from decompress_tpu import lzo

import minilzo_oracle

pytestmark = pytest.mark.skipif(
    minilzo_oracle.load() is None, reason="no C compiler for minilzo oracle")

CORPUS = pathlib.Path(__file__).parent / "corpus"


def _patterns():
    rng = np.random.default_rng(0xC0DEC)
    yield b""
    yield b"\x00"
    yield b"a" * 5000
    yield bytes(range(256)) * 40
    yield rng.integers(0, 256, 10000, np.uint8).tobytes()          # incompressible
    yield rng.integers(0, 4, 20000, np.uint8).tobytes()            # tiny alphabet
    base = rng.integers(0, 256, 512, np.uint8).tobytes()
    yield base * 64                                                # long periods
    yield b"".join(base[: int(k)] for k in rng.integers(1, 512, 200))
    yield b"\x00" * 70000                                          # >48 KiB block loop
    yield (b"abc" * 30000)[:65536]


@pytest.mark.parametrize("idx", range(10))
def test_cross_patterns(idx):
    data = list(_patterns())[idx]
    # ours -> minilzo
    comp = lzo.compress(data)
    assert minilzo_oracle.decompress(comp, len(data) + 16) == data
    # minilzo -> ours
    mcomp = minilzo_oracle.compress(data)
    assert lzo.uncompress(mcomp, max_size=max(len(data), 1) + 16) == data
    # and the growable-buffer entry point
    assert lzo.uncompress_with_buffer(mcomp) == data


@pytest.mark.parametrize("name", ["paper1", "progc", "obj1"])
def test_cross_corpus(name):
    data = (CORPUS / name).read_bytes()
    comp = lzo.compress(data)
    assert minilzo_oracle.decompress(comp, len(data) + 16) == data
    mcomp = minilzo_oracle.compress(data)
    assert lzo.uncompress(mcomp, max_size=len(data) + 16) == data


def test_native_fast_path_against_minilzo():
    """The C++ decoder (tpuz.cpp LZO fast path) must also accept
    canonical minilzo streams."""
    from decompress_tpu import native

    if not native.available():
        pytest.skip("libtpuz unavailable")
    data = (CORPUS / "paper2").read_bytes()
    mcomp = minilzo_oracle.compress(data)
    out = native.lzo1x_decompress(mcomp, len(data))
    assert out == data


def test_minilzo_rejects_truncated_ours():
    data = b"the reference fuzzes both directions " * 100
    comp = lzo.compress(data)
    with pytest.raises(ValueError):
        minilzo_oracle.decompress(comp[: len(comp) // 2], len(data) + 16)
