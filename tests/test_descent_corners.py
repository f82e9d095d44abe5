"""Compact-descent hardening sweep (needy-fraction corners).

checkify cannot instrument the compacted LCP descent's batched loop
(vmap-of-while, scatter prims), so its index safety is asserted here by
behavioral equivalence instead: on adversarial needy-fraction corners
— empty compacted subset, every-lane-needy, dist-1 full-runs (excluded
from compaction), and compaction boundaries — the compact and full
descent must produce bit-identical analyze results.  (On collision-free
inputs the two modes are exactly equal; compact may differ only by
AVOIDING fingerprint-collision fallbacks, which these crafted inputs
never trigger.)

Reference anchor: the descent replaces the match-extension loop of
de.ml:1054–1261 at the performance level.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from decompress_tpu.ops import lz77

SEG = 4352  # a seg_len traced nowhere else: the descent knob is read
# at TRACE time, so these signatures must be private to this module


def _corner_payloads() -> dict[str, bytes]:
    rng = np.random.default_rng(11)
    phrase = rng.integers(0, 256, 64, np.uint8).tobytes()
    rnd = rng.integers(0, 256, SEG, np.uint8).tobytes()
    return {
        # no matches anywhere -> compacted subset count == 0
        "count_zero": rnd,
        # every position inside a long-period repeat -> floor>=16 on
        # (almost) every lane, count ~= seg_len, dist=64 (not dist-1)
        "all_needy": (phrase * ((SEG // len(phrase)) + 1))[:SEG],
        # dist-1 full-runs are excluded from compaction by design
        "dist1_runs": b"\x00" * SEG,
        # hard compaction boundary: needy half then empty half
        "boundary": (phrase * 40)[: SEG // 2] + rnd[: SEG - SEG // 2],
        # alternating blocks exercise ragged compaction batches
        "mixed": b"".join(
            (phrase * 4)[:256] if i % 2 else rnd[i * 256 : (i + 1) * 256]
            for i in range(SEG // 256)
        ),
    }


def _analyze(data: bytes, level: int):
    seg = np.zeros((1, lz77.HIST + SEG), np.uint8)
    seg[0, lz77.HIST : lz77.HIST + len(data)] = np.frombuffer(data, np.uint8)
    res = lz77.lz77_analyze(
        jnp.asarray(seg),
        jnp.asarray([len(data)], jnp.int32),
        jnp.asarray([0], jnp.int32),
        level=level,
        seg_len=SEG,
    )
    return {k: np.asarray(v) for k, v in res.items()}


@pytest.mark.parametrize("level", [6, 9])
def test_compact_descent_equals_full_on_corners(level, monkeypatch):
    payloads = _corner_payloads()
    results = {}
    # "rec" (exact tail compare) differs from the span walks only on
    # descent-fingerprint collisions, which these crafted inputs never
    # trigger — so all three modes must agree bit-for-bit here.
    for mode in ("compact", "full", "rec"):
        monkeypatch.setenv("DECOMPRESS_TPU_DESCENT", mode)
        # the knob is trace-time: drop every cached trace so this mode
        # actually compiles (disk cache keeps the retrace cheap)
        jax.clear_caches()
        results[mode] = {name: _analyze(d, level)
                         for name, d in payloads.items()}
    for name in payloads:
        full = results["full"][name]
        for mode in ("compact", "rec"):
            comp = results[mode][name]
            assert full.keys() == comp.keys()
            for key in full:
                assert np.array_equal(full[key], comp[key]), (
                    f"{name}: field {key!r} differs between descent "
                    f"modes full/{mode}")
        # sanity: the needy corners actually matched something
        if name != "count_zero":
            assert int(results["compact"][name]["on_path"].sum()) > 0
