"""Device kernels (jnp/Pallas): checksums, LZ77, bit packing, inflate."""

from ..utils import enable_compile_cache as _enable_cache

_enable_cache()

from . import checksum  # noqa: F401,E402
