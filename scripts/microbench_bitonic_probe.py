"""Probe: can Mosaic express the bitonic network's compare-exchange
primitives on a VMEM-resident [1024, 128] int32 block?

The lz77 candidate stage's two packed sorts are the last XLA-bound
~15 ms/MB of round A (PERF round-5 attribution).  A fully in-kernel
bitonic sort needs, per stage, the XOR-stride partner exchange:

  * stride < 128  -> LANE permutation: take_along_axis(x, perm, axis=1)
                     with a static per-row index — the proven
                     ~0.1 ns/elem lane-gather primitive;
  * stride >= 128 -> ROW permutation: x.reshape(R//2s, 2, s, 128) with
                     the middle 2-axis flipped — legal iff Mosaic
                     lowers middle-axis flips of sublane-factored
                     reshapes (THE question this probe answers).

Run:  PYTHONPATH=/root/repo:/root/.axon_site \
          python scripts/microbench_bitonic_probe.py [--interpret]
Prints PASS/FAIL per primitive, then (if both pass) times a full
bitonic sort of 131072 keys x 8 members against jnp.sort.
"""
import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

R, L = 1024, 128
N = R * L


def _lane_perm(x, s):
    """Partner values for lane-stride s (< L): static XOR permutation."""
    import jax.numpy as jnp

    perm = (jnp.arange(L, dtype=jnp.int32) ^ s)[None, :]
    return jnp.take_along_axis(x, jnp.broadcast_to(perm, x.shape), axis=1)


def _row_perm(x, sr):
    """Partner values for row-stride sr (in rows): reshape + flip."""
    import jax.numpy as jnp

    y = x.reshape(R // (2 * sr), 2, sr, L)
    # length-2 axis flip WITHOUT the `rev` primitive (Mosaic doesn't
    # lower it): two static slices + concat
    y = jnp.concatenate([y[:, 1:2], y[:, 0:1]], axis=1)
    return y.reshape(R, L)


def _bitonic_kernel_body(x):
    """Full bitonic sort of the row-major linearization of [R, L]."""
    import jax.numpy as jnp

    lin = (jnp.arange(R, dtype=jnp.int32)[:, None] * L
           + jnp.arange(L, dtype=jnp.int32)[None, :])
    k = 2
    while k <= N:
        s = k // 2
        while s >= 1:
            part = _lane_perm(x, s) if s < L else _row_perm(x, s // L)
            up = (lin & k) == 0
            lower = (lin & s) == 0
            mn = jnp.minimum(x, part)
            mx = jnp.maximum(x, part)
            x = jnp.where(lower == up, mn, mx)
            s //= 2
        k *= 2
    return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--members", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(0)
    x_np = rng.integers(0, 1 << 31, (R, L), dtype=np.int64).astype(np.int32)
    x = jnp.asarray(x_np)

    # --- primitive probes (separate tiny kernels) ---------------------
    def probe(name, body):
        try:
            out = pl.pallas_call(
                lambda x_ref, o_ref: o_ref.__setitem__(
                    (...,), body(x_ref[...])),
                out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
                interpret=args.interpret,
            )(x)
            got = np.asarray(out)
            want = np.asarray(body(x))
            ok = np.array_equal(got, want)
            print(f"{name:<44} {'PASS' if ok else 'FAIL (wrong values)'}",
                  flush=True)
            return ok
        except Exception as e:  # noqa: BLE001 — probing for lowering errors
            print(f"{name:<44} FAIL ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)
            return False

    ok = probe("lane perm (s=16) in-kernel", lambda v: _lane_perm(v, 16))
    ok &= probe("row perm (sr=4) reshape+flip in-kernel",
                lambda v: _row_perm(v, 4))
    ok &= probe("row perm (sr=512) reshape+flip in-kernel",
                lambda v: _row_perm(v, 512))
    if not ok:
        print("# blocker recorded: full in-kernel bitonic not attempted")
        return 1

    # --- full sort kernel, correctness + timing -----------------------
    def sort_kernel(x_ref, o_ref):
        o_ref[0, ...] = _bitonic_kernel_body(x_ref[0, ...])

    b = args.members
    xb = jnp.asarray(
        rng.integers(0, 1 << 31, (b, R, L), dtype=np.int64).astype(np.int32))
    call = pl.pallas_call(
        sort_kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, R, L), lambda g: (g, 0, 0))],
        out_specs=pl.BlockSpec((1, R, L), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, R, L), jnp.int32),
        interpret=args.interpret,
    )
    t0 = time.time()
    got = np.asarray(call(xb))
    print(f"# bitonic kernel compile+run {time.time()-t0:.1f}s", flush=True)
    want = np.sort(np.asarray(xb).reshape(b, N), axis=1).reshape(b, R, L)
    print(f"bitonic sort == np.sort: "
          f"{'PASS' if np.array_equal(got, want) else 'FAIL'}", flush=True)

    def fetch1(a):
        # fetch a single element's slice, NOT the whole array — a full
        # [8,1024,128] fetch is ~4 MB over the ~20 MB/s tunnel (~200 ms)
        # and would dominate both timings
        return int(np.asarray(a[0, 0, 0:1])[0])

    for name, fn in [
        ("pallas bitonic", lambda: fetch1(call(xb))),
        ("jnp.sort (XLA)", lambda: fetch1(
            jnp.sort(xb.reshape(b, N), axis=1).reshape(b, R, L))),
    ]:
        fn()
        ts = []
        for _ in range(3):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        med = sorted(ts)[1]
        print(f"{name:<20} {med*1e3:8.1f} ms for {b}x{N} keys "
              f"({b*N/med/1e6:.0f} M keys/s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
