"""Width scaling of Mosaic in-kernel lane gather (take_along_axis axis=1).

microbench_dyngather.py measured ~0.35 ns/lookup for (256,128) and
noise-level for (1024,128) row gathers into 128-entry tables.  The
decode kernel wants 512-1024-entry root tables (root-9/10 covers the
8-11-bit codes dynamic blocks actually emit), so: does lane gather
lower for row widths > 128 (cross-vreg selects), and at what marginal
cost per lookup?  Also: int8 vs int32 operands, and a select-tree
synthesis (k 128-wide gathers + where-chain) as the fallback design.

Run on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_dyngather_width.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S_LO, S_HI = 64, 512
REPS = 3
ROWS = 256


def native_kernel(rows: int, width: int, steps: int, dtype):
    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]

        def body(_, idx):
            v = jnp.take_along_axis(tab, idx, axis=1)
            return (v.astype(jnp.int32) * 5 + 1) % width

        idx = jax.lax.fori_loop(0, steps, body, idx_ref[:])
        out_ref[:] = idx

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, width), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def selecttree_kernel(rows: int, width: int, steps: int):
    """width-entry lookup synthesized from width//128 native 128-wide
    lane gathers + a where-chain on the index high bits.  Table layout:
    (rows, width) reshaped to blocks of 128 columns."""
    nblk = width // 128

    def kernel(tab_ref, idx_ref, out_ref):
        blocks = [tab_ref[:, 128 * k:128 * (k + 1)] for k in range(nblk)]

        def body(_, idx):
            lo = idx % 128
            hi = idx // 128
            v = None
            for k in range(nblk):
                g = jnp.take_along_axis(blocks[k], lo, axis=1)
                v = g if v is None else jnp.where(hi == k, g, v)
            return (v * 5 + 1) % width

        # idx block is (rows, 128): one lookup slot per lane
        idx = jax.lax.fori_loop(0, steps, body, idx_ref[:])
        out_ref[:] = idx

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def time_fn(f, *args):
    np.asarray(f(*args))  # warm
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        np.asarray(f(*args))
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def run_native(width: int, dtype) -> None:
    rng = np.random.default_rng(11)
    t = rng.permutation(width).astype(np.int32)
    tab = np.tile(t[None, :], (ROWS, 1)).astype(dtype)
    idx = rng.integers(0, width, (ROWS, width)).astype(np.int32)
    tj, ij = jnp.asarray(tab), jnp.asarray(idx)
    try:
        f1 = jax.jit(native_kernel(ROWS, width, 1, dtype))
        got = np.asarray(f1(tj, ij))
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()
        print(f"  native w={width:>5} {np.dtype(dtype).name:>5}: FAILED: "
              + (msg[0] if msg else repr(e)), flush=True)
        return
    ok = np.array_equal(got, (t[idx].astype(np.int64) * 5 + 1) % width)
    tlo = time_fn(jax.jit(native_kernel(ROWS, width, S_LO, dtype)), tj, ij)
    thi = time_fn(jax.jit(native_kernel(ROWS, width, S_HI, dtype)), tj, ij)
    marg = (thi - tlo) / ((S_HI - S_LO) * ROWS * width)
    print(f"  native w={width:>5} {np.dtype(dtype).name:>5}: "
          f"marginal {marg*1e9:7.3f} ns/lookup  "
          f"({marg*width*1e9:7.2f} ns per 1 useful lane-slot if padded)"
          f"  exact={ok}", flush=True)


def run_selecttree(width: int) -> None:
    rng = np.random.default_rng(11)
    t = rng.permutation(width).astype(np.int32)
    tab = np.tile(t[None, :], (ROWS, 1))
    idx = rng.integers(0, width, (ROWS, 128)).astype(np.int32)
    tj, ij = jnp.asarray(tab), jnp.asarray(idx)
    try:
        f1 = jax.jit(selecttree_kernel(ROWS, width, 1))
        got = np.asarray(f1(tj, ij))
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()
        print(f"  seltree w={width:>5}: FAILED: "
              + (msg[0] if msg else repr(e)), flush=True)
        return
    ok = np.array_equal(got, (t[idx].astype(np.int64) * 5 + 1) % width)
    tlo = time_fn(jax.jit(selecttree_kernel(ROWS, width, S_LO)), tj, ij)
    thi = time_fn(jax.jit(selecttree_kernel(ROWS, width, S_HI)), tj, ij)
    marg = (thi - tlo) / ((S_HI - S_LO) * ROWS * 128)
    print(f"  seltree w={width:>5}: marginal {marg*1e9:7.3f} ns/lookup"
          f"  exact={ok}", flush=True)


def main() -> None:
    print(f"rows={ROWS}, steps {S_LO}->{S_HI}", flush=True)
    print("native take_along_axis(axis=1) at width:", flush=True)
    for w in (128, 256, 512, 1024):
        run_native(w, np.int32)
    run_native(128, np.int8)
    print("select-tree synthesis (128-wide gathers + where chain):",
          flush=True)
    for w in (256, 512, 1024, 2048):
        run_selecttree(w)


if __name__ == "__main__":
    main()
