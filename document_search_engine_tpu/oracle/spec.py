"""FROZEN numeric spec for weighting and quantization (DESIGN.md §2-§3).

This module is the authoritative definition of every scalar float computed
by the retrieval stack. It is pure numpy float32 with *defined operation
order*. Both the CPU oracle (oracle.py) and the engine's host frontend call
these helpers; the device path only performs IEEE-exact f32 multiplies,
round-half-even quantization, and integer sums — so engine and oracle agree
bit-for-bit (the BASELINE.json:5 parity gate).

Do not "optimize" the arithmetic here: changing operation order changes
bits and breaks the gate's meaning.
"""
from __future__ import annotations

import numpy as np

F32 = np.float32


def idf_table(kind: str, n_docs: int, max_df: int) -> np.ndarray:
    """f32 idf indexed by df in [0, max_df]; df=0 slot is 0 (unused).

    tfidf: idf = ln(N / df)
    bm25:  idf = ln(1 + (N - df + 0.5) / (df + 0.5))
    """
    df = np.arange(max_df + 1, dtype=F32)
    n = F32(n_docs)
    with np.errstate(divide="ignore", invalid="ignore"):
        if kind == "tfidf":
            t = np.log(n / df, dtype=F32).astype(F32)
        elif kind == "bm25":
            half = F32(0.5)
            t = np.log(
                F32(1.0) + (n - df + half) / (df + half), dtype=F32
            ).astype(F32)
        else:
            raise ValueError(kind)
    t[0] = F32(0.0)
    return t


def idf_of(kind: str, n_docs: int, df: np.ndarray) -> np.ndarray:
    """Elementwise idf for an array of df values; 0 where df == 0.

    Bit-identical to `idf_table(kind, n_docs, m)[df]` (same f32 formula on
    the same f32 inputs), without materializing the table.
    """
    df = np.asarray(df, dtype=F32)
    n = F32(n_docs)
    with np.errstate(divide="ignore", invalid="ignore"):
        if kind == "tfidf":
            t = np.log(n / df, dtype=F32).astype(F32)
        elif kind == "bm25":
            half = F32(0.5)
            t = np.log(
                F32(1.0) + (n - df + half) / (df + half), dtype=F32
            ).astype(F32)
        else:
            raise ValueError(kind)
    return np.where(df == F32(0.0), F32(0.0), t).astype(F32)


def seq_sumsq(values: np.ndarray, axis: int = -1) -> np.ndarray:
    """Sequential f32 sum of squares along `axis`, in the given order.

    Vectorized across the other axes, *sequential* along `axis` — the
    defined reduction order for doc/query norms (DESIGN.md §3).
    """
    v = np.asarray(values, dtype=F32)
    v = np.moveaxis(v, axis, -1)
    acc = np.zeros(v.shape[:-1], dtype=F32)
    for i in range(v.shape[-1]):
        w = v[..., i]
        acc = acc + w * w
    return acc


def inv_norm_from_sumsq(sumsq: np.ndarray) -> np.ndarray:
    """inv_norm = 1/sqrt(sumsq) in f32; 0 where sumsq == 0."""
    sumsq = np.asarray(sumsq, dtype=F32)
    with np.errstate(divide="ignore"):
        out = (F32(1.0) / np.sqrt(sumsq)).astype(F32)
    return np.where(sumsq == F32(0.0), F32(0.0), out)


def doc_weights_tfidf(tf: np.ndarray, idf: np.ndarray) -> np.ndarray:
    """Per-term doc weight w = f32(tf) * idf (elementwise, order-free)."""
    return (tf.astype(F32) * idf.astype(F32)).astype(F32)


def val_tfidf(tf: np.ndarray, inv_norm_doc: np.ndarray) -> np.ndarray:
    """Materialized tfidf posting value: val = f32(tf) * inv_norm[doc].

    The doc-side idf lives in A_s (query side) so postings stay immutable
    under idf refresh (DESIGN.md §4).
    """
    return (tf.astype(F32) * inv_norm_doc.astype(F32)).astype(F32)


def bm25_len_coeffs(k1: float, b: float, avgdl: np.float32):
    """c0, c1 with K(dl) = c0 + c1*dl (host-side f32)."""
    k1f, bf = F32(k1), F32(b)
    c0 = k1f * (F32(1.0) - bf)
    c1 = (k1f * bf) / F32(avgdl)
    return c0, c1


def val_bm25(
    tf: np.ndarray, dl_doc: np.ndarray, k1: float, b: float, avgdl
) -> np.ndarray:
    """Materialized bm25 posting value (one host-side f32 division):

    val = (tf*(k1+1)) / (tf + c0 + c1*dl[doc])
    """
    c0, c1 = bm25_len_coeffs(k1, b, F32(avgdl))
    tff = tf.astype(F32)
    num = tff * F32(k1 + 1.0)
    den = tff + (c0 + c1 * dl_doc.astype(F32))
    return (num / den).astype(F32)


def avgdl_of(total_len: int, n_docs: int) -> np.float32:
    return (F32(total_len) / F32(n_docs)) if n_docs else F32(0.0)


def query_coeffs(
    kind: str, qtf: np.ndarray, idf_s: np.ndarray
) -> np.ndarray:
    """Per-slot query coefficient A_s (DESIGN.md §3).

    tfidf: qw_s = f32(qtf)*idf_s ; qnorm = sqrt(seq_sumsq(qw)) ;
           A_s = (qw_s / qnorm) * idf_s
    bm25:  A_s = f32(qtf) * idf_s
    Slots with idf == 0 (unknown terms) get A_s = 0.
    """
    qtff = qtf.astype(F32)
    idf_s = idf_s.astype(F32)
    if kind == "tfidf":
        qw = (qtff * idf_s).astype(F32)
        qnorm = np.sqrt(seq_sumsq(qw)).astype(F32)
        if qnorm == F32(0.0):
            return np.zeros_like(qw)
        a = ((qw / qnorm) * idf_s).astype(F32)
    elif kind == "bm25":
        a = (qtff * idf_s).astype(F32)
    else:
        raise ValueError(kind)
    return np.where(idf_s == F32(0.0), F32(0.0), a).astype(F32)


def quant_clip_max(max_query_terms: int) -> np.int32:
    """Per-contribution clip so S_max contributions can't overflow int32.

    Rounded down to a multiple of 4 so the value is exactly representable
    in float32 (clip values live in [2^25, 2^26) where the f32 ulp is 4):
    the device clips in f32 before the int cast, and a non-representable
    clip would round up there and break bit parity with the host's integer
    clip at the saturation boundary.
    """
    return np.int32(((2**31 - 1) // (max_query_terms + 1)) & ~3)


def quantize_contrib(
    c: np.ndarray, scale_bits: int, max_query_terms: int
) -> np.ndarray:
    """ci = clip(rne(c * 2^scale_bits), 0, clip_max) as int32 (DESIGN.md §2).

    np.rint rounds half-to-even — matching XLA's round_nearest_even — and
    c is a product of f32s, identical bits on host and device, so ci is
    identical on both sides regardless of where it is computed.
    """
    scaled = (np.asarray(c, dtype=F32) * F32(float(2.0**scale_bits)))
    ci = np.rint(scaled).astype(np.int64)
    return np.clip(ci, 0, int(quant_clip_max(max_query_terms))).astype(
        np.int32
    )


def select_query_slots(
    hashes: np.ndarray, qtf: np.ndarray, idf_s: np.ndarray, max_slots: int
):
    """Slot selection when a query has more unique terms than slots:

    keep the `max_slots` terms with the largest idf (ties -> smaller hash),
    then re-sort the kept terms by hash ascending (DESIGN.md §3).
    Inputs must already be sorted by hash ascending.
    """
    n = len(hashes)
    if n <= max_slots:
        return hashes, qtf, idf_s
    # Order by (-idf, hash): stable lexsort, last key primary.
    order = np.lexsort((hashes, -idf_s.astype(np.float64)))[:max_slots]
    keep = np.sort(order)
    return hashes[keep], qtf[keep], idf_s[keep]
