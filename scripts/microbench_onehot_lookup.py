"""Microbench: two-level one-hot MXU lookup vs XLA flat gather.

The speed-of-light analysis (PERF.md) pins every codec kernel to XLA's
~140 M gathered elements/s shuffle path.  This measures the escape
hatch: resolve table[idx] for per-lane 15-bit indices WITHOUT a gather,
as (a) a hi-7-bit one-hot [B,128] @ table.reshape(128, 256*P) MXU
matmul selecting a 256-entry block per lane, then (b) a lo-8-bit
one-hot elementwise multiply+reduce over the block (VPU).  Entries are
split into P exact bf16 byte planes (integers <= 255 are exact in
bf16; one-hot rows have a single nonzero so f32 accumulation is
exact), recombined in int32.

Per-member tables (the decode batch has up to 64 members) ride a
batched dot_general: lanes are grouped by member — exactly the decode
kernel's row layout (each member contributes its splits as a
contiguous row block) — so the contraction is [M, B/M, 128] @
[M, 128, P*256] and the MAC count per lookup is unchanged.

Run on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_onehot_lookup.py

Timings fetch the result (block_until_ready is a no-op through the
axon tunnel); the loop body chains iterations through the index vector
so XLA cannot batch the dependent lookups.
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

TBITS = 15
TSIZE = 1 << TBITS
HI, LO = 128, 256  # 7 + 8 bits
PLANES = 3         # 24-bit entries (the fused dist-table width)
STEPS = 64         # chained dependent lookups per timed call


def _planes(table: np.ndarray) -> np.ndarray:
    """int32[M, 32768] -> bf16[M, 128, PLANES*256] exact byte planes."""
    m = table.shape[0]
    t = table.reshape(m, HI, LO, 1)
    shifts = (8 * np.arange(PLANES)).reshape(1, 1, 1, PLANES)
    # layout [M, HI, PLANES, LO] -> flatten last two: plane-major blocks
    p = ((t >> shifts) & 0xFF).transpose(0, 1, 3, 2)
    return p.reshape(m, HI, PLANES * LO).astype(jnp.bfloat16)


def onehot_lookup(tab_planes, idx):
    """tab_planes bf16[M, 128, P*256]; idx int32[M, G] in [0, 32768)
    -> int32[M, G] == table[m, idx[m, g]], gather-free."""
    m, g = idx.shape
    hi = idx >> 8
    lo = idx & 0xFF
    oh_hi = (hi[:, :, None] == jnp.arange(HI)[None, None, :]).astype(jnp.bfloat16)
    block = jax.lax.dot_general(
        oh_hi, tab_planes,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # [M, G, P*256]
    block = block.reshape(m, g, PLANES, LO)
    oh_lo = (lo[:, :, None] == jnp.arange(LO)[None, None, :]).astype(jnp.float32)
    bytes_f = jnp.sum(block * oh_lo[:, :, None, :], axis=3)  # [M, G, P]
    bytes_i = bytes_f.astype(jnp.int32)
    out = jnp.zeros((m, g), jnp.int32)
    for p in range(PLANES):
        out = out | (bytes_i[:, :, p] << (8 * p))
    return out


@functools.partial(jax.jit, static_argnames=("steps", "mode"))
def chain(table_i32, tab_planes, idx0, steps: int, mode: str):
    """Chase `steps` dependent lookups: idx <- f(table[idx]) so XLA
    cannot parallelize across iterations (decode-loop shape).
    idx0: int32[M, G] (lanes grouped by member)."""
    m, g = idx0.shape
    tflat = table_i32.reshape(-1)
    member = (jnp.arange(m, dtype=jnp.int32)[:, None]
              * TSIZE).astype(jnp.int32)  # [M, 1] row base

    def body(i, carry):
        idx, acc = carry
        if mode == "gather":
            e = tflat[(member + idx).reshape(-1)].reshape(m, g)
        else:
            e = onehot_lookup(tab_planes, idx)
        acc = acc + e
        idx = (idx * 1103515245 + e) & (TSIZE - 1)
        return idx, acc

    idx, acc = jax.lax.fori_loop(0, steps, body, (idx0, jnp.zeros_like(idx0)))
    return acc


def main() -> None:
    rng = np.random.default_rng(7)
    for m, b in ((1, 1024), (1, 4096), (1, 16384), (64, 1024), (64, 4096)):
        g = b // m
        table = rng.integers(0, 1 << 24, (m, TSIZE), dtype=np.int32)
        idx0 = rng.integers(0, TSIZE, (m, g)).astype(np.int32)
        tj = jnp.asarray(table)
        tp = jnp.asarray(_planes(table))
        ij = jnp.asarray(idx0)
        res = {}
        for mode in ("gather", "onehot"):
            acc = np.asarray(chain(tj, tp, ij, STEPS, mode))  # warm
            t0 = time.time()
            acc2 = np.asarray(chain(tj, tp, ij, STEPS, mode))
            dt = time.time() - t0
            assert (acc == acc2).all()
            res[mode] = dt / (STEPS * b)  # seconds per lookup
        same = np.array_equal(
            np.asarray(chain(tj, tp, ij, STEPS, "gather")),
            np.asarray(chain(tj, tp, ij, STEPS, "onehot")))
        print(f"M={m:>3} B={b:>5}: gather {res['gather']*1e9:8.2f} ns/lookup"
              f"   onehot {res['onehot']*1e9:8.2f} ns/lookup"
              f"   speedup {res['gather']/res['onehot']:6.2f}x"
              f"   exact={same}", flush=True)


if __name__ == "__main__":
    main()
