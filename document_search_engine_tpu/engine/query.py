"""Host query frontend: analyze queries into padded slot arrays.

Produces, per query, up to `max_query_terms` slots (unique terms sorted by
hash ascending) with the per-slot coefficient A_s from oracle/spec.py —
identical f32 bits to the oracle's own query weighting, so the device only
multiplies and sums (DESIGN.md §3).
"""
from __future__ import annotations

from collections import Counter

import numpy as np

from ..analyze.hashing import TermHasher
from ..analyze.tokenizer import Tokenizer
from ..config import IndexConfig
from ..index.csr import GlobalStats
from ..oracle import spec

F32 = np.float32


class QueryFrontend:
    def __init__(self, config: IndexConfig):
        self.config = config
        self.tokenizer = Tokenizer(config.analyzer)
        self.hasher = TermHasher()

    def analyze(self, queries, stats: GlobalStats):
        """(slot_hashes (nq,S) uint64, coeff (nq,S) f32). Empty slots have
        hash 0 and coeff 0 (contribute nothing in any segment)."""
        s = self.config.max_query_terms
        nq = len(queries)
        out_h = np.zeros((nq, s), dtype=np.uint64)
        out_a = np.zeros((nq, s), dtype=F32)
        kind = self.config.scoring.kind
        for i, q in enumerate(queries):
            toks = self.tokenizer(q)
            if not toks:
                continue
            counts = Counter(self.hasher.hash_tokens(toks).tolist())
            hashes = np.array(sorted(counts), dtype=np.uint64)
            qtf = np.array(
                [counts[h] for h in hashes.tolist()], dtype=np.int32
            )
            dfs = stats.df_of(hashes)
            idf_s = spec.idf_of(kind, stats.n_alive, dfs)
            hashes, qtf, idf_s = spec.select_query_slots(
                hashes, qtf, idf_s, s
            )
            a = spec.query_coeffs(kind, qtf, idf_s)
            out_h[i, : len(hashes)] = hashes
            out_a[i, : len(hashes)] = a
        return out_h, out_a


def segment_rows(term_hash: np.ndarray, slot_hashes: np.ndarray):
    """Map slot hashes to CSR rows of one segment; (rows i32, found bool)."""
    if len(term_hash) == 0:
        z = np.zeros(slot_hashes.shape, dtype=np.int32)
        return z, np.zeros(slot_hashes.shape, dtype=bool)
    idx = np.searchsorted(term_hash, slot_hashes)
    idx_c = np.minimum(idx, len(term_hash) - 1)
    found = term_hash[idx_c] == slot_hashes
    return np.where(found, idx_c, 0).astype(np.int32), found
