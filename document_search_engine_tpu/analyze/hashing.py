"""Stable 64-bit term hashing (FNV-1a).

"the analyzer emits hashed term ids" (BASELINE.json:5): term ids are
64-bit FNV-1a hashes of the token's UTF-8 bytes, stable across processes,
segments, and shards — so no coordinated vocabulary is ever needed.
Collision probability at 10M unique terms is ~3e-6 (birthday bound), and
the parity oracle uses the same ids, so collisions cannot break parity.
"""
from __future__ import annotations

import numpy as np

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK = 0xFFFFFFFFFFFFFFFF


def fnv1a64(token: str) -> int:
    """FNV-1a 64-bit hash of the token's UTF-8 bytes (python int)."""
    h = _FNV_OFFSET
    for byte in token.encode("utf-8"):
        h = ((h ^ byte) * _FNV_PRIME) & _MASK
    return h


class TermHasher:
    """Memoizing token -> uint64 id mapper.

    The cache makes hashing O(1) per token occurrence after the first
    sighting of each unique term — the corpus has far fewer unique terms
    than token occurrences.
    """

    def __init__(self):
        self._cache: dict = {}

    def __call__(self, token: str) -> int:
        h = self._cache.get(token)
        if h is None:
            h = fnv1a64(token)
            self._cache[token] = h
        return h

    def hash_tokens(self, tokens: list) -> np.ndarray:
        """Vector of uint64 ids for a token list (order preserved)."""
        c = self._cache
        out = np.empty(len(tokens), dtype=np.uint64)
        for i, t in enumerate(tokens):
            h = c.get(t)
            if h is None:
                h = fnv1a64(t)
                c[t] = h
            out[i] = h
        return out
