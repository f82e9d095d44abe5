"""On-chip integration sweep: sharded gzip compress at irregular sizes
and levels, stdlib-decoded and device-decoded back, byte-compared."""
import pathlib, sys, time, gzip
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

corpus = pathlib.Path(__file__).parent.parent / "tests" / "corpus"
base = b"".join(p.read_bytes() for p in sorted(corpus.iterdir()))

from decompress_tpu.parallel import sharded
import jax
print("devices:", jax.devices(), flush=True)

cases = [
    (300_000, 6),     # B=3 tail batch only
    (1_500_000, 6),   # B=8 + B=4 tail
    (390_000, 1),     # greedy level, B=3
    (700_000, 9),     # two-round + mine + deep K, B=6
]
fails = 0
for size, level in cases:
    data = (base * max(1, -(-size // len(base))))[:size]
    t0 = time.time()
    arch = sharded.sharded_gzip_compress(data, level)
    tc = time.time() - t0
    out = gzip.decompress(arch)
    ok1 = out == data
    t0 = time.time()
    out2 = sharded.sharded_gzip_decompress(arch)
    td = time.time() - t0
    ok2 = out2 == data
    status = "PASS" if (ok1 and ok2) else "FAIL"
    if status == "FAIL":
        fails += 1
    print(f"size={size:>9} level={level} ratio={len(arch)/size:.4f} "
          f"compress={tc:.1f}s decode={td:.1f}s stdlib={ok1} device={ok2} "
          f"{status}", flush=True)
print("RESULT:", "ALL PASS" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
