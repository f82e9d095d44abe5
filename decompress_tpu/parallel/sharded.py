"""Sharded compression over a JAX device mesh.

Design (BASELINE north star; SURVEY §2 parallelism table):

* **Data-parallel members**: the input is split into independent
  members (gzip allows multi-member concatenation, RFC 1952 §2.2), one
  batch row per member, the batch axis sharded over the ``dp`` mesh
  axis.  No communication is needed during compression — the layout
  makes XLA partition the codec kernels trivially.
* **Order-preserving gather**: compressed members are assembled by
  member index, never by arrival order, so the archive is byte-identical
  for any mesh size (1 chip == N chips).
* **Checksum combine**: the zlib mode compresses one *single* stream
  whose Adler-32 is folded across shards with the associative
  ``adler32_combine`` (ops/checksum.py) — the reduction the reference
  computes serially in its window (de.ml:453–455).
* **Multi-host**: under `jax.distributed`, each host feeds its local
  members and the final archive assembly uses a process-level
  all-gather; combine order is fixed by shard index.
"""

from __future__ import annotations

import functools

import numpy as np

from .. import de, gz, zl
from ..core import bitstream
from ..ops import checksum, lz77


def make_mesh(n_devices: int | None = None, axis: str = "dp"):
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices is not None and len(devs) < n_devices:
        # dryrun harnesses force extra virtual CPU devices
        devs = jax.devices("cpu")
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _batched_members(arr: np.ndarray, member_size: int, hist: int):
    n = arr.size
    m = max(1, (n + member_size - 1) // member_size)
    data = np.zeros((m, hist + member_size), dtype=np.uint8)
    n_valid = np.zeros(m, dtype=np.int32)
    for i in range(m):
        lo = i * member_size
        hi = min(lo + member_size, n)
        n_valid[i] = hi - lo
        data[i, hist : hist + hi - lo] = arr[lo:hi]
    return data, n_valid


def _shard_batch(x, mesh):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is None:
        return jax.numpy.asarray(x)
    spec = P("dp", *([None] * (x.ndim - 1)))
    # pad batch to a multiple of the mesh size
    d = mesh.devices.size
    pad = -x.shape[0] % d
    if pad:
        x = np.concatenate([x, np.zeros((pad, *x.shape[1:]), x.dtype)])
    return jax.device_put(x, NamedSharding(mesh, spec))


def _compress_members(arr, level, member_size, mesh, final_flags=None, want_crc=True):
    """Device-parallel member compression.

    Returns (parts, n_valid, crcs) where parts[i] is either
    ("stored", payload_u8) or ("packed", packed_u8, total_bits).
    Members are processed in fixed-shape chunks (a small set of
    compiled variants; each mesh device gets MAX_DEVICE_BATCH members
    per call).
    """
    hist = lz77.HIST
    data, n_valid = _batched_members(arr, member_size, hist)
    m = data.shape[0]
    if final_flags is None:
        final_flags = np.ones(m, bool)

    d = mesh.devices.size if mesh is not None else 1
    chunk = de.MAX_DEVICE_BATCH * d
    out_words = (9 * member_size) // 32 + 2 * de._HDR_PAD

    parts: list = []
    crcs_all: list = []
    for lo in range(0, m, chunk):
        hi = min(lo + chunk, m)
        b = hi - lo
        cdata = np.zeros((chunk, data.shape[1]), dtype=np.uint8)
        cdata[:b] = data[lo:hi]
        cnv = np.zeros(chunk, np.int32)
        cnv[:b] = n_valid[lo:hi]
        chl = np.zeros(chunk, np.int32)

        d_data = _shard_batch(cdata, mesh)
        d_nv = _shard_batch(cnv, mesh)
        d_hl = _shard_batch(chl, mesh)

        res = lz77.lz77_analyze(d_data, d_nv, d_hl, level=level, seg_len=member_size)
        hist_lit = np.asarray(res["hist_lit"])[:b]
        hist_dist = np.asarray(res["hist_dist"])[:b]

        hdr, tabs, kinds = de.plan_blocks(
            hist_lit, hist_dist, cnv[:b], final_flags[lo:hi], pad_to=chunk
        )
        words, totals = de._pack_segments(
            res, _shard_batch(cdata[:, hist:].astype(np.int32), mesh),
            *[_shard_batch(t, mesh) for t in (hdr[0], hdr[1], *tabs)],
            out_words,
        )
        words = np.asarray(words)[:b]
        totals = np.asarray(totals)[:b]
        if want_crc:
            crcs_all.extend(checksum.crc32_batch(cdata[:b, hist:], cnv[:b]))

        for i in range(b):
            if kinds[i] == "stored":
                parts.append(("stored", cdata[i, hist : hist + cnv[i]]))
            else:
                packed = np.frombuffer(words[i].astype("<u4").tobytes(), dtype=np.uint8)
                parts.append(("packed", packed, int(totals[i])))
    return parts, n_valid, (np.array(crcs_all) if want_crc else None)


def sharded_gzip_compress(
    data,
    level: int = 6,
    *,
    member_size: int = 1 << 17,
    mesh=None,
    mtime: int = 0,
    os=gz.OS.default(),
) -> bytes:
    """Multi-member gzip archive, members compressed data-parallel.

    Byte-identical output for any mesh size; decodable by any gzip
    (including the reference `decompress -fgzip -d`).
    """
    arr = de._np_u8(data)
    if arr.size == 0:
        return gz.compress(b"", level)
    parts, n_valid, crcs = _compress_members(arr, level, member_size, mesh)
    out = []
    head = b"\x1f\x8b\x08\x00" + (mtime & 0xFFFFFFFF).to_bytes(4, "little") \
        + bytes([gz._xfl(level), int(os)])
    for i, part in enumerate(parts):  # order-preserving: by member index
        out.append(head)
        w = bitstream.BitWriter()
        if part[0] == "stored":
            de._emit_stored(w, part[1], final=True)
        else:
            w.write_packed(part[1], part[2])
        out.append(w.getvalue())
        out.append(int(crcs[i]).to_bytes(4, "little"))
        out.append(int(int(n_valid[i]) & 0xFFFFFFFF).to_bytes(4, "little"))
    return b"".join(out)


def sharded_zlib_compress(
    data,
    level: int = 6,
    *,
    member_size: int = 1 << 17,
    mesh=None,
) -> bytes:
    """One zlib stream compressed data-parallel.

    Member blocks are chained with BFINAL=0 (window reset at boundaries
    is encoder-legal) and the stream Adler-32 is folded across shards
    with the associative combine — no shard ever sees the whole input.
    """
    arr = de._np_u8(data)
    if arr.size == 0:
        return zl.deflate(b"", level)
    m = max(1, (arr.size + member_size - 1) // member_size)
    final_flags = np.zeros(m, bool)
    final_flags[-1] = True
    parts, n_valid, _ = _compress_members(
        arr, level, member_size, mesh, final_flags=final_flags, want_crc=False
    )
    # per-shard adler, folded in shard order (associative combine)
    adler = 1
    for i in range(m):
        lo = i * member_size
        part = checksum.adler32(arr[lo : lo + int(n_valid[i])])
        adler = checksum.adler32_combine(adler, part, int(n_valid[i]))

    cmf = 0x78
    flg = zl._flevel(level) << 6
    rem = (cmf * 256 + flg) % 31
    if rem:
        flg += 31 - rem
    w = bitstream.BitWriter()
    w.write_bytes(bytes([cmf, flg]))
    for i, part in enumerate(parts):
        final = i == m - 1
        if part[0] == "stored":
            de._emit_stored(w, part[1], final=final)
        else:
            w.write_packed(part[1], part[2])
            if not final:
                # Z_SYNC_FLUSH: empty stored block realigns to a byte
                # boundary so the next member's bits concatenate cleanly
                w.write(0, 3)
                w.align_to_byte()
                w.write(0, 16)
                w.write(0xFFFF, 16)
    out = w.getvalue()
    return out + int(adler).to_bytes(4, "big")


# ---------------------------------------------------------------------------
# shard_map step with explicit collectives (the dryrun/multi-chip path).
# ---------------------------------------------------------------------------


def compress_step_sharded(mesh, data, n_valid, hist_len, bfinal, *, level=6, seg_len=4096):
    """One sharded compression step with explicit collectives.

    shard_map over the ``dp`` axis: each shard runs the full on-device
    fixed-Huffman deflate for its members, then sizes are all-gathered
    (the order-preserving gather's size exchange) and total output bits
    are psum'd (scaling stats).  Returns (words, sizes_all, total_bits).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from ..ops import pipeline

    def step(d, nv, hl, bf):
        words, totals = pipeline.fixed_deflate_segments(
            d, nv, hl, bf, level=level, seg_len=seg_len
        )
        sizes_all = jax.lax.all_gather(totals, "dp")  # [ndev, m_local]
        total_bits = jax.lax.psum(jnp.sum(totals), "dp")
        return words, sizes_all, total_bits

    specs = P("dp")
    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P("dp", None), specs, specs, specs),
        out_specs=(P("dp", None), P(None, "dp"), P()),
    )
    return jax.jit(fn)(data, n_valid, hist_len, bfinal)
