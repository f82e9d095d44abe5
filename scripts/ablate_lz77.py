"""TPU timing of the fused lz77_analyze graph, with optional ablation.

Run in separate processes:
    python scripts/ablate_lz77.py            # full graph
    DECOMPRESS_TPU_LZ77_ABLATE=parse python scripts/ablate_lz77.py
    DECOMPRESS_TPU_LZ77_ABLATE=cand  python scripts/ablate_lz77.py

Timing discipline per memory/tpu-perf-facts: block_until_ready is a
no-op through the tunnel; force work by fetching one scalar that
depends on every output.
"""
import os
import pathlib
import time

import numpy as np
import jax
import jax.numpy as jnp

from decompress_tpu.ops import lz77
from decompress_tpu import de

LEVEL = int(os.environ.get("LEVEL", "6"))


def main():
    seg = de.SEGMENT_SIZE
    b = de.MAX_DEVICE_BATCH
    t = lz77.HIST + seg
    corpus = pathlib.Path(__file__).parent.parent / "tests" / "corpus"
    raw = b"".join(p.read_bytes() for p in sorted(corpus.iterdir()))
    raw = (raw * 2)[: b * seg]
    data = np.zeros((b, t), np.uint8)
    for i in range(b):
        data[i, lz77.HIST:] = np.frombuffer(raw[i * seg : (i + 1) * seg], np.uint8)
    n_valid = np.full(b, seg, np.int32)
    hist_len = np.zeros(b, np.int32)

    d = jnp.asarray(data)
    sel = lz77.mark_sel_for(d)
    print(f"mark_sel={sel}", flush=True)

    @jax.jit
    def run(d, n, h):
        res = lz77.lz77_analyze(d, n, h, level=LEVEL, seg_len=seg,
                                mark_sel=sel)
        return (
            jnp.sum(res["on_path"]) + jnp.sum(res["length"]) + jnp.sum(res["dist"])
            + jnp.sum(res["hist_lit"]) + jnp.sum(res["hist_dist"])
            + jnp.sum(res["exact"])
        )

    n = jnp.asarray(n_valid)
    h = jnp.asarray(hist_len)
    t0 = time.time()
    s = int(run(d, n, h))
    print(f"ablate={os.environ.get('DECOMPRESS_TPU_LZ77_ABLATE','')!r} "
          f"compile+first: {time.time()-t0:.1f}s  checksum={s}")
    times = []
    for _ in range(3):
        t0 = time.time()
        s = int(run(d, n, h))
        times.append(time.time() - t0)
    mb = b * seg / 1e6
    med = sorted(times)[1]
    print(f"median of 3: {med:.3f}s for {mb:.2f} MB -> {med/mb*1000:.0f} ms/MB")


if __name__ == "__main__":
    main()
