"""TPU micro-bench: per-row table lookup styles for the lockstep decoder.

A: take_along_axis gather [B, T] with per-row index (current decode_symbols)
B: one-hot multiply-reduce (VPU-friendly, no gather)
C: full-batch width sensitivity (B=128 vs 1024)

In-jit fori_loop repetition amortizes dispatch (memory/tpu-perf-facts).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = int(__import__("os").environ.get("REPS", "5000"))


def bench(f, *args):
    # block_until_ready is a no-op through the tunnel: force the
    # compile+first-run with a real FETCH, then time a second fetch
    int(jnp.sum(f(*args)))
    t0 = time.time()
    r = int(jnp.sum(f(*args)))
    dt = time.time() - t0
    return dt, r


def make_gather(b, t):
    @jax.jit
    def run(tab, idx0):
        def step(i, idx):
            e = jnp.take_along_axis(tab, idx[:, None], axis=1)[:, 0]
            return (idx + e) & (t - 1)
        return jax.lax.fori_loop(0, REPS, step, idx0)
    return run


def make_onehot(b, t):
    iota = jnp.arange(t, dtype=jnp.int32)

    @jax.jit
    def run(tab, idx0):
        def step(i, idx):
            oh = (iota[None, :] == idx[:, None]).astype(jnp.int32)
            e = jnp.sum(tab * oh, axis=1)
            return (idx + e) & (t - 1)
        return jax.lax.fori_loop(0, REPS, step, idx0)
    return run


def main():
    rng = np.random.default_rng(0)
    for b in (128, 1024):
        for t in (2048, 8192):
            tab = jnp.asarray(rng.integers(0, t, (b, t)), jnp.int32)
            idx0 = jnp.asarray(rng.integers(0, t, b), jnp.int32)
            for name, mk in (("gather", make_gather), ("onehot", make_onehot)):
                f = mk(b, t)
                dt, r = bench(f, tab, idx0)
                print(f"B={b:<5} T={t:<5} {name}: {dt/REPS*1e6:8.2f} us/lookup  (chk {r & 0xffff})",
                      flush=True)


if __name__ == "__main__":
    main()
