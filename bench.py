"""Benchmark harness: end-to-end codec throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline targets (BASELINE.md): deflate >= 0.5 GB/s/chip,
inflate >= 1 GB/s/chip.  The headline metric is the geometric mean of
(deflate/0.5, inflate/1.0) once both paths exist; currently deflate.

Methodology mirrors the reference bench (bench/b.ml:11–24): median of
N repetitions, corpus = Calgary + rfc5322 replicated to steady-state
size, byte-exact verification against the stdlib oracle each run.
"""

import argparse
import gzip as _gzip
import json
import pathlib
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size-mb", type=int, default=4)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--level", type=int, default=6)
    ap.add_argument("--member-kb", type=int, default=128)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    corpus_dir = pathlib.Path(__file__).parent / "tests" / "corpus"
    base = b"".join(p.read_bytes() for p in sorted(corpus_dir.iterdir()))
    reps_needed = max(1, (args.size_mb * (1 << 20)) // len(base))
    data = (base * reps_needed)[: args.size_mb << 20]

    from decompress_tpu.parallel import sharded_gzip_compress

    member = args.member_kb << 10

    # warmup / compile
    t0 = time.time()
    comp = sharded_gzip_compress(data, args.level, member_size=member)
    warm = time.time() - t0
    assert _gzip.decompress(comp) == data, "roundtrip mismatch"

    times = []
    for _ in range(args.reps):
        t0 = time.time()
        comp = sharded_gzip_compress(data, args.level, member_size=member)
        times.append(time.time() - t0)
    times.sort()
    med = times[len(times) // 2]
    gbps = len(data) / med / 1e9
    ratio = len(comp) / len(data)

    if args.verbose:
        print(
            f"# warmup {warm:.1f}s, times {['%.3f' % t for t in times]}, "
            f"ratio {ratio:.4f}, {len(data)} -> {len(comp)} bytes",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "gzip_deflate_throughput",
                "value": round(gbps, 4),
                "unit": "GB/s/chip",
                "vs_baseline": round(gbps / 0.5, 4),
                "extra": {
                    "ratio": round(ratio, 4),
                    "level": args.level,
                    "size_mb": args.size_mb,
                    "median_s": round(med, 4),
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
