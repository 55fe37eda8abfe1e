"""ctypes bindings for the native analyzer (native/analyzer.cpp).

The batch tokenize+hash loop is the host hot path of index build (the
tracked "index build docs/sec" metric, BASELINE.json:2). The C path
handles ASCII documents — byte-for-byte the same contract as the Python
tokenizer+hasher for the default AnalyzerConfig — and the wrapper routes
non-ASCII docs through the Python reference path, so the combined result
is bit-identical (tests/test_native_analyzer.py). Falls back silently to
pure Python when the shared library hasn't been built
(`make -C native`).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

from ..config import AnalyzerConfig

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    candidates = [
        os.environ.get("DSE_NATIVE_LIB", ""),
        # installed wheel: the .so ships inside the package
        os.path.join(pkg, "_native", "libdse_native.so"),
        # git checkout: built by `make -C native` at the repo root
        os.path.join(os.path.dirname(pkg), "native", "libdse_native.so"),
    ]
    lib = None
    for so in candidates:
        if not so:
            continue
        try:
            lib = ctypes.CDLL(so)
            break
        except OSError:
            continue
    if lib is None:
        return None
    lib.dse_count_tokens.restype = ctypes.c_int64
    lib.dse_count_tokens.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.dse_hash_tokens.restype = None
    lib.dse_hash_tokens.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.dse_analyze_docs.restype = ctypes.c_int64
    lib.dse_analyze_docs.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    if hasattr(lib, "dse_lookup_sorted"):  # older committed .so builds
        lib.dse_lookup_sorted.restype = None
        lib.dse_lookup_sorted.argtypes = [
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
    if hasattr(lib, "dse_query_slots"):  # older committed .so builds
        lib.dse_query_slots.restype = None
        lib.dse_query_slots.argtypes = [
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
        ]
    if hasattr(lib, "dse_analyze_queries"):
        lib.dse_analyze_queries.restype = None
        lib.dse_analyze_queries.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
        ]
    if hasattr(lib, "dse_hash_build"):
        lib.dse_hash_build.restype = None
        lib.dse_hash_build.argtypes = [
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.c_void_p,
        ]
        lib.dse_analyze_docs_mt.restype = ctypes.c_int64
        lib.dse_analyze_docs_mt.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.dse_query_slots_hash.restype = None
        lib.dse_query_slots_hash.argtypes = [
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.dse_hash_unique.restype = ctypes.c_int64
        lib.dse_hash_unique.argtypes = [
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.dse_hash_lookup.restype = None
        lib.dse_hash_lookup.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),  # df accumulator or None
        ]
        lib.dse_analyze_queries_hash.restype = None
        lib.dse_analyze_queries_hash.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
        ]
    _LIB = lib
    return lib


def lookup_available() -> bool:
    lib = _lib()
    return lib is not None and hasattr(lib, "dse_lookup_sorted")


def lookup_sorted_prefixed(
    vocab: np.ndarray,  # (T,) uint64 ascending
    prefix_start: np.ndarray,  # (2^bits + 1,) int64 bucket starts
    prefix_bits: int,
    needles: np.ndarray,  # (n,) uint64
) -> np.ndarray:
    """np.searchsorted(vocab, needles) via the native prefix-table
    binary search (see analyzer.cpp dse_lookup_sorted)."""
    lib = _lib()
    needles = np.ascontiguousarray(needles, dtype=np.uint64)
    out = np.empty(len(needles), np.int64)
    lib.dse_lookup_sorted(
        vocab.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        len(vocab),
        prefix_start.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        prefix_bits,
        needles.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        len(needles),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out


def slots_available() -> bool:
    lib = _lib()
    return lib is not None and hasattr(lib, "dse_query_slots")


def query_slots(
    hashes: np.ndarray,  # (nnz,) uint64 — AnalyzedDocs layout
    tfs: np.ndarray,  # (nnz,) int32
    doc_ptr: np.ndarray,  # (nq+1,) int64
    vocab: np.ndarray,  # (T,) uint64 ascending (contiguous)
    prefix_start: np.ndarray,  # (2^bits + 1,) int64
    prefix_bits: int,
    idf_by_row: np.ndarray,  # (T,) f32 — numpy-precomputed idf per row
    s: int,
    kind: str,
):
    """One C pass per batch: vocab lookup + slot assembly + query-side
    f32 coefficients (analyzer.cpp dse_query_slots — spec.py operation
    order, contraction off). Returns (out_h, out_a, out_r, out_f,
    overflow); overflow rows are untouched zeros for the caller's
    per-query slot-selection path."""
    lib = _lib()
    nq = len(doc_ptr) - 1
    hashes = np.ascontiguousarray(hashes, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int32)
    doc_ptr = np.ascontiguousarray(doc_ptr, dtype=np.int64)
    out_h = np.zeros((nq, s), np.uint64)
    out_a = np.zeros((nq, s), np.float32)
    out_r = np.zeros((nq, s), np.int32)
    out_f = np.zeros((nq, s), np.uint8)
    overflow = np.zeros(nq, np.uint8)
    lib.dse_query_slots(
        hashes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        tfs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        doc_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        nq,
        vocab.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        len(vocab),
        prefix_start.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        prefix_bits,
        idf_by_row.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s,
        0 if kind == "bm25" else 1,
        out_h.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        overflow.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out_h, out_a, out_r, out_f.view(bool), overflow


def analyze_queries_available() -> bool:
    lib = _lib()
    return lib is not None and hasattr(lib, "dse_analyze_queries")


def analyze_queries(
    texts,  # list[str], MUST be all-ASCII (caller checks)
    config: AnalyzerConfig,
    vocab: np.ndarray,
    prefix_start: np.ndarray,
    prefix_bits: int,
    idf_by_row: np.ndarray,
    s: int,
    kind: str,
):
    """Raw query text -> slot arrays in ONE C pass (analyzer.cpp
    dse_analyze_queries: tokenize + hash + sort/uniq + lookup + f32
    coeffs). Returns (out_h, out_a, out_r, out_f, overflow)."""
    lib = _lib()
    nq = len(texts)
    buf, offs = _buf_offs(texts)
    out_h = np.zeros((nq, s), np.uint64)
    out_a = np.zeros((nq, s), np.float32)
    out_r = np.zeros((nq, s), np.int32)
    out_f = np.zeros((nq, s), np.uint8)
    overflow = np.zeros(nq, np.uint8)
    lib.dse_analyze_queries(
        buf,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        nq,
        config.min_token_len,
        config.max_token_len,
        vocab.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        len(vocab),
        prefix_start.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        prefix_bits,
        idf_by_row.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s,
        0 if kind == "bm25" else 1,
        out_h.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        overflow.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out_h, out_a, out_r, out_f.view(bool), overflow


def hash_lookup_available() -> bool:
    lib = _lib()
    return lib is not None and hasattr(lib, "dse_hash_build")


# one VocabEntry per 16 bytes: {u64 key, i32 row, f32 idf} (analyzer.cpp)
VOCAB_ENTRY_DTYPE = np.dtype(
    [("key", "<u8"), ("row", "<i4"), ("idf", "<f4")]
)


def hash_build(vocab: np.ndarray, idf_by_row: np.ndarray):
    """Flat open-addressing vocab table (analyzer.cpp dse_hash_build):
    one 16-byte entry holds (hash, row, idf), linear probing at load
    factor <= 0.5. Returns (table, log2n). Built once per stats refresh;
    the serving frontend's lookup+idf gather is then ONE expected cache
    miss per token instead of the prefix-table path's ~3 dependent
    ones."""
    lib = _lib()
    n_vocab = len(vocab)
    log2n = max(4, int(np.ceil(np.log2(max(n_vocab, 1) * 2))))
    table = np.empty(1 << log2n, VOCAB_ENTRY_DTYPE)
    vocab = np.ascontiguousarray(vocab, dtype=np.uint64)
    idf_by_row = np.ascontiguousarray(idf_by_row, dtype=np.float32)
    lib.dse_hash_build(
        vocab.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n_vocab,
        idf_by_row.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        log2n,
        table.ctypes.data,
    )
    return table, log2n


def unique_inverse(values: np.ndarray, counts: bool = False):
    """np.unique(values, return_inverse=True) for uint64 arrays via the
    flat hash table: one O(n) insert pass emits the unique keys (sorted
    host-side — they are few), then dse_hash_build + a prefetch-
    pipelined bulk lookup produce each value's sorted-vocab row. ~20x
    over numpy's argsort-based unique at index-build sizes (millions of
    postings hashes, ~1 expected cache miss per value per pass).
    Returns (vocab uint64 ascending, rows int32), plus per-row
    occurrence counts int32 (== np.bincount(rows)) when counts=True —
    accumulated inside the same lookup pass."""
    lib = _lib()
    n = len(values)
    values = np.ascontiguousarray(values, dtype=np.uint64)
    # start sized for the typical vocab << postings ratio; grow on the
    # rare half-full signal (-1)
    log2n = max(10, int(np.ceil(np.log2(max(n // 8, 2)))))
    while True:
        table = np.empty(1 << log2n, VOCAB_ENTRY_DTYPE)
        uniq = np.empty(1 << (log2n - 1), np.uint64)
        cnt = lib.dse_hash_unique(
            values.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            n,
            log2n,
            table.ctypes.data,
            uniq.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        )
        if cnt >= 0:
            break
        log2n += 1
    vocab = np.sort(uniq[:cnt])
    zeros = np.zeros(cnt, np.float32)
    lib.dse_hash_build(
        vocab.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        cnt,
        zeros.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        log2n,
        table.ctypes.data,
    )
    rows = np.empty(n, np.int32)
    df = np.zeros(cnt, np.int32) if counts else None
    lib.dse_hash_lookup(
        table.ctypes.data,
        log2n,
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        df.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        if counts
        else None,
    )
    if counts:
        return vocab, rows, df
    return vocab, rows


def query_slots_hash(
    hashes: np.ndarray,  # (nnz,) uint64 — AnalyzedDocs layout
    tfs: np.ndarray,  # (nnz,) int32
    doc_ptr: np.ndarray,  # (nq+1,) int64
    table: np.ndarray,  # from hash_build
    log2n: int,
    s: int,
    kind: str,
):
    """query_slots with the flat hash-table lookup — identical output
    bits (the two-call path's twin of analyze_queries_hash, used for
    mixed/non-ASCII batches)."""
    lib = _lib()
    nq = len(doc_ptr) - 1
    hashes = np.ascontiguousarray(hashes, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int32)
    doc_ptr = np.ascontiguousarray(doc_ptr, dtype=np.int64)
    out_h = np.zeros((nq, s), np.uint64)
    out_a = np.zeros((nq, s), np.float32)
    out_r = np.zeros((nq, s), np.int32)
    out_f = np.zeros((nq, s), np.uint8)
    overflow = np.zeros(nq, np.uint8)
    lib.dse_query_slots_hash(
        hashes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        tfs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        doc_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        nq,
        table.ctypes.data,
        log2n,
        s,
        0 if kind == "bm25" else 1,
        out_h.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        overflow.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out_h, out_a, out_r, out_f.view(bool), overflow


def analyze_queries_hash(
    texts,  # list[str], MUST be all-ASCII (caller checks)
    config: AnalyzerConfig,
    table: np.ndarray,  # from hash_build
    log2n: int,
    s: int,
    kind: str,
):
    """analyze_queries with the flat hash-table lookup — identical
    output bits (same tokenizer/slot order/f32 operation order; idf
    gathered from the same numpy-precomputed values, stored in the
    table)."""
    lib = _lib()
    nq = len(texts)
    buf, offs = _buf_offs(texts)
    out_h = np.zeros((nq, s), np.uint64)
    out_a = np.zeros((nq, s), np.float32)
    out_r = np.zeros((nq, s), np.int32)
    out_f = np.zeros((nq, s), np.uint8)
    overflow = np.zeros(nq, np.uint8)
    lib.dse_analyze_queries_hash(
        buf,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        nq,
        config.min_token_len,
        config.max_token_len,
        table.ctypes.data,
        log2n,
        s,
        0 if kind == "bm25" else 1,
        out_h.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        overflow.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out_h, out_a, out_r, out_f.view(bool), overflow


def available() -> bool:
    return _lib() is not None


def config_supported(config: AnalyzerConfig) -> bool:
    return (
        config.lowercase
        and config.token_pattern == r"[0-9a-z]+"
        and not config.stopwords
    )


def hash_batch_ascii(texts, config: AnalyzerConfig):
    """(hashes uint64, doc_idx int32, dl int64) for ASCII-only texts,
    token-order preserved within each doc."""
    lib = _lib()
    n = len(texts)
    buf, offs = _buf_offs(texts)
    dl = np.zeros(n, np.int64)
    c_offs = offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    total = lib.dse_count_tokens(
        buf,
        c_offs,
        n,
        config.min_token_len,
        config.max_token_len,
        dl.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    hashes = np.zeros(int(total), np.uint64)
    doc_idx = np.zeros(int(total), np.int32)
    lib.dse_hash_tokens(
        buf,
        c_offs,
        n,
        config.min_token_len,
        config.max_token_len,
        hashes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        doc_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return hashes, doc_idx, dl


def _buf_offs(texts):
    """Concatenated \\x00-separated ASCII buffer + per-doc byte offsets;
    doc i scans [offs[i], offs[i+1]) — the trailing separator inside the
    range is a non-token byte and just terminates the last run."""
    n = len(texts)
    buf = ("\x00".join(texts)).encode("ascii")
    offs = np.empty(n + 1, np.int64)
    offs[0] = 0
    # vectorized byte-length cumsum (a Python per-string loop costs
    # ~1 ms per 8k queries on the serving path)
    np.cumsum(
        np.fromiter(map(len, texts), np.int64, count=n) + 1, out=offs[1:]
    )
    offs[n] = len(buf)
    return buf, offs


def analyze_batch_ascii(texts, config: AnalyzerConfig):
    """Fully-native per-doc analysis for ASCII texts: returns
    (hashes uint64, tfs int32, doc_ptr int64, dl int64) in the
    AnalyzedDocs layout (per-doc hash-ascending unique runs)."""
    lib = _lib()
    n = len(texts)
    buf, offs = _buf_offs(texts)
    c_offs = offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    dl_tmp = np.zeros(n, np.int64)
    total = lib.dse_count_tokens(
        buf, c_offs, n, config.min_token_len, config.max_token_len,
        dl_tmp.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    hashes = np.zeros(int(total), np.uint64)
    tfs = np.zeros(int(total), np.int32)
    n_terms = np.zeros(n, np.int64)
    dl = np.zeros(n, np.int64)
    if hasattr(lib, "dse_analyze_docs_mt"):
        # threaded over token-balanced doc ranges (DSE_NATIVE_THREADS /
        # hardware_concurrency; identical output to the serial path,
        # tested). tok_ptr reuses pass 1's per-doc token counts.
        tok_ptr = np.zeros(n + 1, np.int64)
        np.cumsum(dl_tmp, out=tok_ptr[1:])
        w = lib.dse_analyze_docs_mt(
            buf, c_offs, n, config.min_token_len, config.max_token_len,
            tok_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            hashes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            tfs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n_terms.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            dl.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
    else:
        w = lib.dse_analyze_docs(
            buf, c_offs, n, config.min_token_len, config.max_token_len,
            hashes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            tfs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n_terms.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            dl.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
    doc_ptr = np.zeros(n + 1, np.int64)
    np.cumsum(n_terms, out=doc_ptr[1:])
    return hashes[: int(w)], tfs[: int(w)], doc_ptr, dl
