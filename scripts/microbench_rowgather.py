"""Row-gather vs element-gather: can the 9 probe pre-gathers of the
LZ77 candidate stage (ops/lz77.py `_match_candidates`) become ONE
gather of 9-word records?

XLA's elementwise gather costs ~7 ns/element on this chip (PERF.md),
but gathers whose slices are CONTIGUOUS RUNS lower to row copies
(cf. `inflate_pl._build_slab`, near-memcpy).  If gathering [T, R]
records by a [T] permutation costs ~a row each instead of ~R elements,
the probe stage's 9 separate sorted-order gathers (measured ~65 ms/MB)
collapse into one.

Method: marginal cost between CHAINED dependent gathers at two
fori_loop trip counts (cancels dispatch/transfer exactly — the
round-4 microbench discipline, scripts/microbench_lookup_marginal.py).

    PYTHONPATH=/root/repo:/root/.axon_site python \
        scripts/microbench_rowgather.py
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    t_len = 1 << 20
    rng = np.random.default_rng(0)
    perm = rng.permutation(t_len).astype(np.int32)
    base = rng.integers(0, 1 << 30, size=t_len, dtype=np.int32)

    def timed(f, *a):
        _ = int(f(*a))  # warm/compile; fetch = the only true sync here
        ts = []
        for _ in range(3):
            t0 = time.time()
            _ = int(f(*a))
            ts.append(time.time() - t0)
        return sorted(ts)[1]

    d_perm = jnp.asarray(perm)
    d_base = jnp.asarray(base)

    # --- A: 9 separate [T] gathers, chained so steps depend -----------
    import functools

    @functools.partial(jax.jit, static_argnames=("steps", "nargs"))
    def many_elem(p, b, steps, nargs):
        arrs = [b + i for i in range(nargs)]

        def body(i, carry):
            idx = (p + carry) % t_len
            s = carry
            for a in arrs:
                g = a[idx]
                s = s + g[0]
            return s % 7

        return jax.lax.fori_loop(0, steps, body, jnp.int32(0))

    # --- B: one [T, R] record row-gather -------------------------------
    @functools.partial(jax.jit, static_argnames=("steps", "nargs"))
    def one_rows(p, b, steps, nargs):
        rec = jnp.stack([b + i for i in range(nargs)], axis=1)  # [T, R]

        def body(i, carry):
            idx = (p + carry) % t_len
            g = rec[idx]          # [T, R] row gather
            return (carry + g[0, 0] + g[0, nargs - 1]) % 7

        return jax.lax.fori_loop(0, steps, body, jnp.int32(0))

    # --- C: one [T, R] record gather via take(axis=0) on padded width --
    @functools.partial(jax.jit, static_argnames=("steps", "nargs", "pad"))
    def one_rows_pad(p, b, steps, nargs, pad):
        rec = jnp.stack(
            [b + i for i in range(nargs)]
            + [b * 0 for _ in range(pad - nargs)], axis=1)

        def body(i, carry):
            idx = (p + carry) % t_len
            g = jnp.take(rec, idx, axis=0)
            return (carry + g[0, 0] + g[0, nargs - 1]) % 7

        return jax.lax.fori_loop(0, steps, body, jnp.int32(0))

    # --- D: flat 1-D contiguous-run gather (the _build_slab idiom) -----
    @functools.partial(jax.jit, static_argnames=("steps", "nargs", "pad"))
    def flat_runs(p, b, steps, nargs, pad):
        rec = jnp.stack(
            [b + i for i in range(nargs)]
            + [b * 0 for _ in range(pad - nargs)], axis=1).reshape(-1)

        def body(i, carry):
            idx = (p + carry) % t_len
            g = jax.vmap(
                lambda s: jax.lax.dynamic_slice(rec, (s * pad,), (pad,))
            )(idx)
            return (carry + g[0, 0] + g[0, nargs - 1]) % 7

        return jax.lax.fori_loop(0, steps, body, jnp.int32(0))

    for label, fn, kw in [
        ("9 x elementwise [T] gathers", many_elem, dict(nargs=9)),
        ("1 x [T,9] row gather", one_rows, dict(nargs=9)),
        ("1 x [T,16]-padded row gather", one_rows_pad,
         dict(nargs=9, pad=16)),
        ("1 x [T,128]-padded row gather", one_rows_pad,
         dict(nargs=9, pad=128)),
        ("flat 16-word contiguous runs", flat_runs, dict(nargs=9, pad=16)),
    ]:
        try:
            t_lo = timed(lambda: fn(d_perm, d_base, steps=4, **kw))
            t_hi = timed(lambda: fn(d_perm, d_base, steps=20, **kw))
            marg = (t_hi - t_lo) / 16
            per_elem = marg / t_len * 1e9
            print(f"{label:<34} marginal {marg*1e3:8.2f} ms/step  "
                  f"{per_elem:6.2f} ns/row", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label:<34} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    sys.exit(main())
