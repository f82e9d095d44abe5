"""Marginal-cost microbench: XLA flat gather vs two-level one-hot MXU
lookup for the decode-table resolve (table[idx], 15-bit indices).

Round 3's `microbench_onehot_lookup.py` timed one 64-step dispatch per
shape; every row's total was 28-37 ms == the ~36 ms tunnel dispatch
floor, so it measured the floor five times, not the kernels.  This
version passes the step count as a TRACED fori_loop bound (one compile
per mode/shape) and reports the MARGINAL cost between a short and a
long chain:

    ns/lookup = (t(steps_hi) - t(steps_lo)) / ((steps_hi-steps_lo) * B)

which cancels dispatch, transfer, and loop-entry overhead exactly.  A
`noop` mode (same chain arithmetic, no lookup) bounds loop overhead.

Decode-kernel relevance: the device inflate kernel resolves ~2 fused
table entries per symbol via flat gathers into per-member 32768-entry
rows (ops/inflate.py `_decode_symbols`); lanes = members x splits
(<= 4096 today).  If the one-hot MXU path's marginal cost beats the
gather's by >= 2x at those shapes, the kernel's table resolves move to
the MXU (the window gathers stay).

Run on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_lookup_marginal.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

TBITS = 15
TSIZE = 1 << TBITS
HI, LO = 128, 256  # 7 + 8 bits
PLANES = 3         # 24-bit entries (fused dist-table width)

STEPS_LO = 128
STEPS_HI = 1024
REPS = 3


def _planes(table: np.ndarray) -> np.ndarray:
    """int32[M, 32768] -> bf16[M, 128, PLANES*256] exact byte planes."""
    m = table.shape[0]
    t = table.reshape(m, HI, LO, 1)
    shifts = (8 * np.arange(PLANES)).reshape(1, 1, 1, PLANES)
    p = ((t >> shifts) & 0xFF).transpose(0, 1, 3, 2)
    return p.reshape(m, HI, PLANES * LO).astype(jnp.bfloat16)


def onehot_lookup(tab_planes, idx):
    """tab_planes bf16[M, 128, P*256]; idx int32[M, G] in [0, 32768)
    -> int32[M, G] == table[m, idx[m, g]], gather-free (MXU + VPU)."""
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


@functools.partial(jax.jit, static_argnames=("mode",))
def chain(table_i32, tab_planes, idx0, steps, mode: str):
    """Chase `steps` (TRACED) dependent lookups so XLA cannot batch
    across iterations (decode-loop shape).  idx0 int32[M, G]."""
    m, g = idx0.shape
    tflat = table_i32.reshape(-1)
    member = (jnp.arange(m, dtype=jnp.int32)[:, None] * TSIZE).astype(jnp.int32)

    def body(i, carry):
        idx, acc = carry
        if mode == "gather":
            e = tflat[(member + idx).reshape(-1)].reshape(m, g)
        elif mode == "onehot":
            e = onehot_lookup(tab_planes, idx)
        else:  # noop: same chain arithmetic, no table access
            e = idx ^ (idx >> 3)
        acc = acc + e
        idx = (idx * 1103515245 + e) & (TSIZE - 1)
        return idx, acc

    idx, acc = jax.lax.fori_loop(0, steps, body, (idx0, jnp.zeros_like(idx0)))
    return acc


def timed(tj, tp, ij, steps, mode):
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        np.asarray(chain(tj, tp, ij, jnp.int32(steps), mode))
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main() -> None:
    rng = np.random.default_rng(7)
    print(f"marginal over steps {STEPS_LO}->{STEPS_HI}, median of {REPS}",
          flush=True)
    for m, b in ((1, 1024), (1, 4096), (64, 4096)):
        g = b // m
        table = rng.integers(0, 1 << 24, (m, TSIZE), dtype=np.int32)
        idx0 = rng.integers(0, TSIZE, (m, g)).astype(np.int32)
        tj = jnp.asarray(table)
        tp = jnp.asarray(_planes(table))
        ij = jnp.asarray(idx0)
        res = {}
        for mode in ("noop", "gather", "onehot"):
            np.asarray(chain(tj, tp, ij, jnp.int32(STEPS_LO), mode))  # warm
            t_lo = timed(tj, tp, ij, STEPS_LO, mode)
            t_hi = timed(tj, tp, ij, STEPS_HI, mode)
            res[mode] = (t_hi - t_lo) / ((STEPS_HI - STEPS_LO) * b)
            print(f"  M={m:>3} B={b:>5} {mode:>7}: lo {t_lo*1e3:7.2f} ms  "
                  f"hi {t_hi*1e3:7.2f} ms  marginal {res[mode]*1e9:7.2f} "
                  f"ns/lookup", flush=True)
        g_net = res["gather"] - res["noop"]
        o_net = res["onehot"] - res["noop"]
        print(f"  M={m:>3} B={b:>5}: net gather {g_net*1e9:7.2f}  net onehot "
              f"{o_net*1e9:7.2f}  speedup {g_net/max(o_net,1e-12):5.2f}x",
              flush=True)
        # exactness check (once per shape)
        a = np.asarray(chain(tj, tp, ij, jnp.int32(64), "gather"))
        b_ = np.asarray(chain(tj, tp, ij, jnp.int32(64), "onehot"))
        assert np.array_equal(a, b_), "onehot != gather"
    print("exactness: onehot == gather on all shapes", flush=True)


if __name__ == "__main__":
    main()
