"""Core constants and host-side Huffman/bitstream machinery."""

from . import bitstream, huffman, tables  # noqa: F401
