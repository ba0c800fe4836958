from . import bitpack, canonical, histogram, huffman

__all__ = ["bitpack", "canonical", "histogram", "huffman"]
