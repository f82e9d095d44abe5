"""Device kernels (jnp/Pallas): checksums, LZ77, bit packing, inflate."""

from . import checksum  # noqa: F401
