"""Deterministic test corpora (SURVEY.md §4: text, binary, adversarial)."""

import numpy as np


def english_like(n: int, seed: int = 0) -> bytes:
    """Markov-ish pseudo-English with strong first-order structure."""
    rng = np.random.default_rng(seed)
    words = [b"the", b"quick", b"brown", b"fox", b"jumps", b"over", b"lazy",
             b"dog", b"compression", b"entropy", b"huffman", b"markov",
             b"context", b"table", b"canonical", b"of", b"and", b"a", b"in"]
    out = bytearray()
    while len(out) < n:
        out += words[rng.integers(len(words))]
        out += b" " if rng.random() < 0.85 else b".\n"
    return bytes(out[:n])


def mixed_binary(n: int, seed: int = 1) -> bytes:
    """Half structured binary (little-endian counters), half text."""
    rng = np.random.default_rng(seed)
    counters = np.arange(n // 8, dtype="<u4").tobytes()
    text = english_like(n // 2, seed)
    noise = rng.integers(0, 256, n // 4, dtype=np.uint8).tobytes()
    blob = (counters + text + noise) * 2
    return blob[:n]


ADVERSARIAL = {
    "empty": b"",
    "one_byte": b"Q",
    "two_bytes": b"QQ",
    "all_same": b"\x00" * 4096,
    "all_bytes": bytes(range(256)) * 16,
    "run_then_noise": b"A" * 2048 + bytes(np.random.default_rng(2).integers(0, 256, 2048, dtype=np.uint8)),
    "random": bytes(np.random.default_rng(3).integers(0, 256, 8192, dtype=np.uint8)),
    "block_boundary": b"xy" * (64 * 1024),  # exact multiple of block size
}
