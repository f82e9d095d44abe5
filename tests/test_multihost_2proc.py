"""Two-process `jax.distributed` archive test (BASELINE config 5).

Round-1 review flagged that the multi-process gather branch
(parallel/multihost.py) had never executed.  This test launches two
real OS processes with a loopback coordinator; each runs
``sharded_gzip_compress_multihost`` on the CPU backend, and both
results must be byte-identical to each other AND to the single-process
archive (order-preserving gather + rebuilt FEXTRA index).
"""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
import jax

coord, pid, outpath = sys.argv[1], int(sys.argv[2]), sys.argv[3]
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
from decompress_tpu.parallel import multihost

data = (b"two-process multihost determinism " * 4000)[:100000]
arch = multihost.sharded_gzip_compress_multihost(data, 6, member_size=16384)
with open(outpath, "wb") as f:
    f.write(arch)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_multihost_archive(tmp_path):
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # no virtual-device split inside workers
    env["JAX_PLATFORMS"] = "cpu"
    coord = f"127.0.0.1:{_free_port()}"
    outs = [tmp_path / "arch0.bin", tmp_path / "arch1.bin"]
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(i), str(outs[i])],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        logs.append(err.decode(errors="replace"))
        assert p.returncode == 0, logs
    arch0 = outs[0].read_bytes()
    arch1 = outs[1].read_bytes()
    assert arch0 == arch1, "hosts disagree on archive bytes"

    # equal to the single-process archive, and decodable
    import gzip

    from decompress_tpu.parallel import sharded

    data = (b"two-process multihost determinism " * 4000)[:100000]
    single = sharded.sharded_gzip_compress(data, 6, member_size=16384)
    assert arch0 == single, "2-process archive differs from single-process"
    assert gzip.decompress(arch0) == data
    assert sharded.sharded_gzip_decompress(arch0) == data
