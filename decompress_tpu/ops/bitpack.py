"""Device bit packer: the DEFLATE entropy-emission hot loop, TPU-style.

The reference emits bits symbol-by-symbol through a 16-bit hold
(`c_bits`/`write`, de.ml:2529–2541, 2708–2897).  On TPU the same job is
a *two-pass data-parallel* transform (SURVEY §3 "bit packer becomes a
two-pass emit"):

  1. every element's bit length → exclusive scan → absolute bit offset;
  2. each element's masked code lands in at most two 32-bit words, and
     contributions are bit-disjoint by construction, so per-word sums
     equal per-word ORs.

The word assembly INVERTS the scatter: within-word contributions are
bit-disjoint, so their true sum fits 32 bits and each output word is a
difference of a running (mod 2^32) prefix sum of element
contributions — out[w] = E[F[w+1]] - E[F[w]], where F (the first
element landing at or beyond each word) comes from one scatter-min +
reverse cummin over the monotone word indices.  That is one
scatter-min pass instead of the two scatter-OR passes of the direct
form (XLA scatters measure ~141 M elem/s on this chip — the pack
kernel's dominant term — while cumsums run ~1.5 G elem/s; PERF.md).

Elements with ``nbits == 0`` are no-ops, which lets callers keep dense
masked command arrays (no compaction needed).  Little-endian uint32
words viewed as bytes are exactly the LSB-first DEFLATE bit stream
(the reference's c_bits/write hold, de.ml:2529–2541, emitted here as
one data-parallel transform).
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
        n = v.shape[0]
        offsets = jnp.cumsum(nb) - nb
        total = offsets[-1] + nb[-1]
        nb_u = nb.astype(jnp.uint32)
        masked = v & ((jnp.uint32(1) << nb_u) - jnp.uint32(1))
        widx = offsets >> 5
        r = (offsets & 31).astype(jnp.uint32)
        lo = masked << r
        # (masked >> (32-r)) with the r==0 case masked out (shift-by-32 UB)
        hi = jnp.where(r == jnp.uint32(0), jnp.uint32(0), masked >> ((jnp.uint32(32) - r) & jnp.uint32(31)))
        # F[w] = first element whose word index reaches w (monotone widx
        # -> scatter-min of element ranks + reverse cummin fills empty
        # words); elements past the last word clamp into F[out_words].
        f0 = jnp.full(out_words + 1, n, jnp.int32).at[
            jnp.minimum(widx, out_words)
        ].min(jnp.arange(n, dtype=jnp.int32))
        f = jax.lax.cummin(f0, reverse=True)
        # prefix sums of the two contribution streams (exclusive, with
        # the grand total appended); uint32 wraparound cancels in the
        # differences because true within-word sums are bit-disjoint
        el = jnp.concatenate([jnp.zeros(1, jnp.uint32), jnp.cumsum(lo)])
        eh = jnp.concatenate([jnp.zeros(1, jnp.uint32), jnp.cumsum(hi)])
        out_lo = el[f[1:]] - el[f[:-1]]
        # hi parts land one word later: word w collects hi of elements
        # whose widx == w-1
        dh = eh[f[1:]] - eh[f[:-1]]
        out_hi = jnp.concatenate([jnp.zeros(1, jnp.uint32), dh[:-1]])
        return out_lo + out_hi, total

    fn = one
    for _ in range(values.ndim - 1):
        fn = jax.vmap(fn)
    return fn(values, nbits)


def words_to_bytes(words, total_bits: int) -> bytes:
    """uint32 words -> the first ceil(total_bits/8) stream bytes (host)."""
    import numpy as np

    b = np.asarray(words, dtype="<u4").view(np.uint8)
    return b[: (int(total_bits) + 7) // 8].tobytes()
