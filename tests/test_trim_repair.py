"""Trim-and-reparse repair of fingerprint overestimates (round 4).

The old retry re-ran the whole analysis with exact linear extension
(~65 full-domain gather pairs); the repair now trims the offending
candidate to its proven-equal prefix and re-parses.  These tests drive
the repair pieces directly with a synthetically corrupted candidate
(real collisions are ~2^-32 per compare since the fingerprint premix).

Parity anchor: the reference's matcher never overestimates (byte-serial
exact extension, de.ml:1690-1760), so repair must restore exactness.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from decompress_tpu.ops import lz77  # noqa: E402

SEG = 4096


def _segment():
    rng = np.random.default_rng(7)
    base = bytes(rng.integers(32, 96, 700, dtype=np.uint8))
    data = (base + b"abcdefgh" * 40 + base[:500] + b"abcdefgi" * 40
            + base) * 3
    arr = np.zeros((1, SEG), np.uint8)
    payload = np.frombuffer(data[:SEG], np.uint8)
    arr[0, : payload.size] = payload
    return arr, payload.size


def test_trim_candidates_cuts_overestimate_to_true_prefix():
    arr, n = _segment()
    d = jnp.asarray(arr)
    nv = jnp.asarray(np.array([n], np.int32))
    hl = jnp.asarray(np.zeros(1, np.int32))
    res = lz77.lz77_analyze(d, nv, hl, level=6, seg_len=SEG, hist=0)
    assert bool(np.asarray(res["exact"]).all())

    is_m = np.asarray(res["is_match"])[0]
    ln = np.asarray(res["length"])[0].copy()
    dist = np.asarray(res["dist"])[0]
    cl = np.asarray(res["cand_length"])[0].copy()
    cd = np.asarray(res["cand_dist"])[0]

    # pick a selected match with room to overestimate and a mismatched
    # continuation byte
    cands = [
        s for s in np.nonzero(is_m)[0]
        if 16 <= ln[s] < 200 and s + ln[s] + 8 < n
        and arr[0, s + ln[s]] != arr[0, s + ln[s] - dist[s]]
    ]
    assert cands, "no suitable match in the synthetic segment"
    s = int(cands[0])
    true_len = int(ln[s])
    cl[s] = true_len + 5  # pretend the descent overestimated

    # the parse over the corrupted candidates selects the overestimate
    # (exactly what a real collision produces) and verify flags it
    res_bad = lz77.lz77_reparse_greedy(
        d, jnp.asarray(cl[None]), jnp.asarray(cd[None]), nv,
        seg_len=SEG, hist=0, lazy=True)
    assert not bool(np.asarray(res_bad["exact"]).all())
    assert bool(np.asarray(res_bad["is_match"])[0, s])

    cl2 = np.asarray(lz77.lz77_trim_candidates(
        d, res_bad["is_match"], res_bad["length"], res_bad["dist"],
        jnp.asarray(cl[None]), jnp.asarray(cd[None]), nv,
        seg_len=SEG, hist=0))[0]
    assert cl2[s] == true_len

    # reparse over the trimmed candidates is exact again
    res2 = lz77.lz77_reparse_greedy(
        d, jnp.asarray(cl2[None]), jnp.asarray(cd[None]), nv,
        seg_len=SEG, hist=0, lazy=True)
    assert bool(np.asarray(res2["exact"]).all())


def test_trim_drops_candidate_below_min_match():
    arr, n = _segment()
    d = jnp.asarray(arr)
    nv = jnp.asarray(np.array([n], np.int32))
    seg_len = SEG
    # synthetic: one selected "match" of length 10 at position 100
    # whose bytes mismatch immediately (true prefix 0 -> candidate dies)
    is_m = np.zeros(seg_len, bool)
    ln = np.zeros(seg_len, np.int32)
    dist = np.zeros(seg_len, np.int32)
    is_m[100] = True
    ln[100] = 10
    dist[100] = 50
    if arr[0, 100] == arr[0, 50]:
        arr[0, 50] ^= 0xFF
        d = jnp.asarray(arr)
    cl = ln.copy()
    cd = dist.copy()
    cl2 = np.asarray(lz77.lz77_trim_candidates(
        d, jnp.asarray(is_m[None]), jnp.asarray(ln[None]),
        jnp.asarray(dist[None]), jnp.asarray(cl[None]),
        jnp.asarray(cd[None]), nv, seg_len=seg_len, hist=0))[0]
    assert cl2[100] == 0


def test_hot_dists_ignore_overflow_bin():
    counts = np.zeros((1, lz77.HOT_DIST_BINS), np.int32)
    counts[0, lz77.HOT_DIST_BINS - 1] = 10_000  # clipped >=4095 traffic
    counts[0, 1000] = 500
    hot = lz77._hot_dists_host(counts)
    assert lz77.HOT_DIST_BINS - 1 not in hot[0]
    assert 1000 in hot[0]


def test_fingerprint_premix_breaks_rot13_cancellation():
    # the collision class found in the wild: two byte diffs exactly 13
    # bit positions apart cancelled in (a ^ rotl13(b)) over RAW words
    a = np.zeros(64, np.uint8)
    b = np.zeros(64, np.uint8)
    a[:32] = np.frombuffer(b"EEE Trans Computers\n%V C-33\n%N 9", np.uint8)
    b[:32] = np.frombuffer(b"EEE Trans Computers\n%V C-23\n%N 1", np.uint8)
    fa = lz77._fingerprints(lz77._u32_words(jnp.asarray(a)))
    fb = lz77._fingerprints(lz77._u32_words(jnp.asarray(b)))
    assert int(np.asarray(fa[32])[0]) != int(np.asarray(fb[32])[0])
