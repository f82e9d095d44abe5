"""Device bit packer: the DEFLATE entropy-emission hot loop, TPU-style.

The reference emits bits symbol-by-symbol through a 16-bit hold
(`c_bits`/`write`, de.ml:2529–2541, 2708–2897).  On TPU the same job is
a *two-pass data-parallel* transform (SURVEY §3 "bit packer becomes a
two-pass emit"):

  1. every element's bit length → exclusive scan → absolute bit offset;
  2. each element's masked code lands in at most two 32-bit words, and
     contributions are bit-disjoint by construction, so scatter-add is
     scatter-OR.

Elements with ``nbits == 0`` are no-ops, which lets callers keep dense
masked command arrays (no compaction needed).  Little-endian uint32
words viewed as bytes are exactly the LSB-first DEFLATE bit stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_words",))
def pack_bits_device(values: jnp.ndarray, nbits: jnp.ndarray, out_words: int):
    """Pack ``values`` (low ``nbits`` each, 0..31) LSB-first.

    values: uint32[..., N]; nbits: int32[..., N].  Returns
    ``(words uint32[..., out_words], total_bits int32[...])``.  Any
    element of <= 31 bits at offset r spans at most two 32-bit words
    (r%32 + 31 < 64), so the disjoint two-word scatter-OR covers all
    cases.  Elements whose cumulative offset exceeds ``32*out_words``
    are dropped (callers size ``out_words`` so this only happens when a
    stored block would win anyway).  Batched dims map over leading axes.
    """

    def one(v, nb):
        offsets = jnp.cumsum(nb) - nb
        total = offsets[-1] + nb[-1]
        nb_u = nb.astype(jnp.uint32)
        masked = v & ((jnp.uint32(1) << nb_u) - jnp.uint32(1))
        widx = offsets >> 5
        r = (offsets & 31).astype(jnp.uint32)
        lo = masked << r
        # (masked >> (32-r)) with the r==0 case masked out (shift-by-32 UB)
        hi = jnp.where(r == jnp.uint32(0), jnp.uint32(0), masked >> ((jnp.uint32(32) - r) & jnp.uint32(31)))
        words = jnp.zeros(out_words, dtype=jnp.uint32)
        words = words.at[widx].add(lo, mode="drop")
        words = words.at[widx + 1].add(hi, mode="drop")
        return words, total

    fn = one
    for _ in range(values.ndim - 1):
        fn = jax.vmap(fn)
    return fn(values, nbits)


def words_to_bytes(words, total_bits: int) -> bytes:
    """uint32 words -> the first ceil(total_bits/8) stream bytes (host)."""
    import numpy as np

    b = np.asarray(words, dtype="<u4").view(np.uint8)
    return b[: (int(total_bits) + 7) // 8].tobytes()
