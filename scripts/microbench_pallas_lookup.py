"""Pallas/Mosaic table-lookup probes (VERDICT r3 item 1b).

Round 2 established that Mosaic rejects *vector* gathers ("Cannot do
int indexing").  This measures the remaining in-kernel escape hatches
for resolving table[idx] with per-lane 15-bit indices:

  a) pl_vector_gather — table_ref[idx_vec] inside the kernel body,
     everything in VMEM.  Expected to FAIL to lower; the exact Mosaic
     error is recorded.
  b) pl_scalar_rows — whole table resident in VMEM as [256, 128];
     nested fori_loops walk lanes, each lane dynamic-slicing one
     (1, 128) row at a scalar sublane index (supported per the Pallas
     TPU guide) and reducing it against a one-hot column mask; results
     accumulate into (1, 128) rows (Mosaic cannot store scalars).
     This is the "scalar-prefetch / dynamic_slice" design: correct,
     but serial per lane — the measurement tells us ns/lookup.

Reference points at the same shapes (microbench_lookup_marginal, on
chip): XLA gather ~3.4-6 ns/lookup; shared-table MXU one-hot ~1.6.

Run on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_pallas_lookup.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TBITS = 15
TSIZE = 1 << TBITS
ROWS, COLS = TSIZE // 128, 128


def try_vector_gather(table, idx):
    """(a) the forbidden fruit: per-lane vector indexing in-kernel."""

    def kernel(tab_ref, idx_ref, out_ref):
        t = tab_ref[:].reshape(-1)
        out_ref[:] = t[idx_ref[:]]

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return np.asarray(jax.jit(f)(table, idx))


def scalar_rows_lookup(table2d, idx2d):
    """(b) serial scalar-row lookup: one dynamic (1,128) row slice per
    lane + one-hot column reduce; row-granular result stores.
    table2d int32[256,128], idx2d int32[NR,128] -> int32[NR,128]."""
    nr = idx2d.shape[0]

    def kernel(tab_ref, idx_ref, out_ref):
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, COLS), 1)

        def outer(r, _):
            def inner(c, row):
                ix = idx_ref[r, c]
                trow = tab_ref[pl.ds(ix >> 7, 1), :]      # (1, 128)
                v = jnp.sum(jnp.where(cols == (ix & 127), trow, 0))
                return row | jnp.where(cols == c, v, 0)

            row = jax.lax.fori_loop(
                0, COLS, inner, jnp.zeros((1, COLS), jnp.int32))
            out_ref[pl.ds(r, 1), :] = row
            return 0

        jax.lax.fori_loop(0, nr, outer, 0)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nr, COLS), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.jit(f)(table2d, idx2d)


def main() -> None:
    rng = np.random.default_rng(7)
    table = rng.integers(0, 1 << 24, TSIZE, dtype=np.int32)
    n = 1024
    idx = rng.integers(0, TSIZE, n).astype(np.int32)
    tj = jnp.asarray(table)
    t2 = jnp.asarray(table.reshape(ROWS, COLS))
    ij = jnp.asarray(idx)

    print("(a) pl vector gather:", flush=True)
    try:
        out = try_vector_gather(tj, ij)
        ok = np.array_equal(out, table[idx])
        print(f"    COMPILED AND RAN, exact={ok}", flush=True)
    except Exception as e:  # noqa: BLE001 - we want the lowering error
        msg = str(e).splitlines()
        print("    FAILED: " + (msg[0] if msg else repr(e)), flush=True)

    print("(b) pl scalar dynamic-row loop:", flush=True)
    try:
        i2 = np.asarray(idx).reshape(-1, COLS)
        out = np.asarray(scalar_rows_lookup(t2, jnp.asarray(i2)))
        ok = np.array_equal(out.reshape(-1), table[idx])
        res = {}
        for reps in (1, 4):
            big = np.tile(i2, (reps * 4, 1))
            bj = jnp.asarray(big)
            np.asarray(scalar_rows_lookup(t2, bj))  # warm
            ts = []
            for _ in range(3):
                t0 = time.time()
                np.asarray(scalar_rows_lookup(t2, bj))
                ts.append(time.time() - t0)
            res[reps] = sorted(ts)[1]
            print(f"    n={big.size:>6}: {res[reps]*1e3:8.2f} ms "
                  f"(exact={ok})", flush=True)
        marg = (res[4] - res[1]) / (3 * 4 * n)
        print(f"    marginal {marg*1e9:8.2f} ns/lookup", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()
        print("    FAILED: " + (msg[0] if msg else repr(e)), flush=True)


if __name__ == "__main__":
    main()
