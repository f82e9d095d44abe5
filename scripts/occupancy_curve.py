"""Members-per-dispatch occupancy curve for lz77_analyze (VERDICT r3
item 2).

The "x N chips" scaling story assumes one chip's analyze step time is
~linear in members per dispatch (i.e. the kernel is throughput-bound,
not occupancy-starved, at the production batch).  This measures it:
time the full level-6 analyze graph at B = 1, 2, 4, 8 (and 16 with
--wide) members of SEGMENT_SIZE each, warm, median of reps, and report
ms/MB alongside the raw step time.  Flat ms/MB ==> batch is already
past the saturation knee and "more members per chip" only helps until
MAX_DEVICE_BATCH; rising step time at ~constant ms/MB ==> linear
scaling with members holds and the per-chip rate quoted in PERF.md is
the honest per-chip rate.

Decode-side occupancy is already published: the PL inflate table in
PERF.md (2 MB -> 128 MB, latency-floor to ~16 MB then 1.3 GB/s
marginal) IS that curve.

Timing discipline per memory/tpu-perf-facts: block_until_ready is a
no-op through the tunnel; force work by fetching one scalar.  Each B
is a fresh jit shape (compiles cache on disk).
"""
import argparse
import os
import pathlib
import time

import numpy as np
import jax
import jax.numpy as jnp

from decompress_tpu.ops import lz77
from decompress_tpu import de

LEVEL = int(os.environ.get("LEVEL", "6"))


def time_batch(b: int, reps: int, raw: bytes):
    seg = de.SEGMENT_SIZE
    t = lz77.HIST + seg
    data = np.zeros((b, t), np.uint8)
    for i in range(b):
        data[i, lz77.HIST:] = np.frombuffer(
            raw[i * seg: (i + 1) * seg], np.uint8)
    d = jnp.asarray(data)
    n = jnp.asarray(np.full(b, seg, np.int32))
    h = jnp.asarray(np.zeros(b, np.int32))
    sel = lz77.mark_sel_for(d)

    @jax.jit
    def run(dd, nn, hh):
        res = lz77.lz77_analyze(dd, nn, hh, level=LEVEL, seg_len=seg,
                                mark_sel=sel)
        return (jnp.sum(res["on_path"]) + jnp.sum(res["length"])
                + jnp.sum(res["dist"]) + jnp.sum(res["hist_lit"])
                + jnp.sum(res["hist_dist"]) + jnp.sum(res["exact"]))

    t0 = time.time()
    int(run(d, n, h))  # warm/compile
    tc = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        int(run(d, n, h))
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    mb = b * seg / 1e6
    return med, mb, tc, sel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--wide", action="store_true",
                    help="add B=16 (beyond MAX_DEVICE_BATCH)")
    args = ap.parse_args()

    corpus = pathlib.Path(__file__).parent.parent / "tests" / "corpus"
    raw = b"".join(p.read_bytes() for p in sorted(corpus.iterdir()))
    batches = [1, 2, 4, 8] + ([16] if args.wide else [])
    raw = (raw * max(2, -(-(max(batches) * de.SEGMENT_SIZE)
                          // len(raw))))[: max(batches) * de.SEGMENT_SIZE]

    print(f"level={LEVEL} seg={de.SEGMENT_SIZE} reps={args.reps}")
    print(f"{'B':>3} {'MB':>6} {'step ms':>9} {'ms/MB':>8} "
          f"{'compile s':>9}  sel")
    rows = []
    for b in batches:
        med, mb, tc, sel = time_batch(b, args.reps, raw)
        rows.append((b, mb, med * 1e3, med * 1e3 / mb))
        print(f"{b:>3} {mb:>6.2f} {med*1e3:>9.1f} {med*1e3/mb:>8.1f} "
              f"{tc:>9.1f}  {sel}", flush=True)

    # knee summary: ratio of per-MB cost at B=1 vs the largest batch
    small, large = rows[0], rows[-1]
    print(f"\nms/MB B=1 {small[3]:.1f} -> B={large[0]} {large[3]:.1f} "
          f"({small[3]/max(large[3],1e-9):.2f}x amortization)")


if __name__ == "__main__":
    main()
