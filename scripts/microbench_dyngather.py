"""Mosaic `tpu.dynamic_gather` probe: in-kernel vector table lookups.

Discovery (round 4): Mosaic DOES lower `jnp.take_along_axis(x2d, idx2d,
axis=0|1)` to `tpu.dynamic_gather` (jax/_src/pallas/mosaic/lowering.py
_gather_lowering_rule) — operand, indices, and output must share one 2D
shape.  With a COLUMN-REPLICATED operand (table entry t[k] stored at
x[k, j] for every lane j), an axis-0 gather computes
out[i, j] = t[idx[i, j]]: a pure vector lookup of R*128 indices into an
R-entry table, per op.  Round 2/3 only ever tried 1-D gathers ("Cannot
do int indexing") and wrote the whole in-kernel route off.

This measures the marginal in-kernel cost per lookup: a fori_loop of S
CHAINED dependent lookups (decode-loop shape: table values feed the
next index).  Two S values difference out call overhead.  If an
(R=512/1024)-row gather runs at VPU-ish speed (<1 ns/lookup), the
device inflate loop can move into Pallas with root-9/10 decode tables
and escape XLA's ~6 ns/element gather wall (PERF.md speed-of-light).

Run on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_dyngather.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
S_LO, S_HI = 64, 512
REPS = 3


def chained_kernel(rows: int, axis: int, steps: int):
    """Build a pallas_call doing `steps` chained lookups into a
    replicated (rows, 128) table; indices/out are (rows, 128)."""

    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]
        n = rows * LANES if axis == 0 else LANES

        def body(_, idx):
            v = jnp.take_along_axis(tab, idx, axis=axis)
            return (v * 5 + 1) % (rows if axis == 0 else LANES)

        idx = jax.lax.fori_loop(0, steps, body, idx_ref[:])
        out_ref[:] = idx

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def run_case(rows: int, axis: int) -> None:
    rng = np.random.default_rng(11)
    space = rows if axis == 0 else LANES
    # column-replicated (axis 0) or row-replicated (axis 1) table
    t = rng.permutation(space).astype(np.int32)
    tab = (np.tile(t[:, None], (1, LANES)) if axis == 0
           else np.tile(t[None, :], (rows, 1)))
    idx = rng.integers(0, space, (rows, LANES)).astype(np.int32)
    tj, ij = jnp.asarray(tab), jnp.asarray(idx)

    # correctness: one step == numpy lookup
    f1 = jax.jit(chained_kernel(rows, axis, 1))
    try:
        got = np.asarray(f1(tj, ij))
    except Exception as e:  # noqa: BLE001 - record the lowering error
        msg = str(e).splitlines()
        print(f"  rows={rows:>5} axis={axis}: FAILED: "
              + (msg[0] if msg else repr(e)), flush=True)
        return
    want = (t[idx] * 5 + 1) % space
    ok = np.array_equal(got, want)

    ts = {}
    for steps in (S_LO, S_HI):
        f = jax.jit(chained_kernel(rows, axis, steps))
        np.asarray(f(tj, ij))  # warm
        tt = []
        for _ in range(REPS):
            t0 = time.time()
            np.asarray(f(tj, ij))
            tt.append(time.time() - t0)
        ts[steps] = sorted(tt)[len(tt) // 2]
    marg = (ts[S_HI] - ts[S_LO]) / ((S_HI - S_LO) * rows * LANES)
    print(f"  rows={rows:>5} axis={axis}: lo {ts[S_LO]*1e3:7.2f} ms  "
          f"hi {ts[S_HI]*1e3:7.2f} ms  marginal {marg*1e9:7.3f} ns/lookup"
          f"  exact={ok}", flush=True)


def main() -> None:
    print(f"chained in-kernel dynamic_gather, steps {S_LO}->{S_HI}",
          flush=True)
    print("axis=0 (sublane gather; R-entry replicated table):", flush=True)
    for rows in (8, 64, 256, 512, 1024):
        run_case(rows, axis=0)
    print("axis=1 (lane gather; 128-entry replicated table):", flush=True)
    for rows in (8, 256, 1024):
        run_case(rows, axis=1)


if __name__ == "__main__":
    main()
