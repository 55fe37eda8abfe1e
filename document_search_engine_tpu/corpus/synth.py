"""Deterministic synthetic corpora (no network egress in this environment).

Stands in for the toy ~1k plain-text corpus of BASELINE.json:7 and for
scale tests (BASELINE.json:9-10). A Zipf-ish vocabulary over pronounceable
pseudo-words gives realistic df skew (stopword-like heads, rare tails).
"""
from __future__ import annotations

import numpy as np

_SYL = [
    "ba", "be", "bi", "bo", "bu", "da", "de", "di", "do", "du",
    "ka", "ke", "ki", "ko", "ku", "la", "le", "li", "lo", "lu",
    "ma", "me", "mi", "mo", "mu", "na", "ne", "ni", "no", "nu",
    "ra", "re", "ri", "ro", "ru", "sa", "se", "si", "so", "su",
    "ta", "te", "ti", "to", "tu", "za", "ze", "zi", "zo", "zu",
]


def make_vocab(size: int, seed: int = 0) -> list:
    rng = np.random.default_rng(seed)
    vocab, seen = [], set()
    while len(vocab) < size:
        n_syl = int(rng.integers(2, 5))
        w = "".join(_SYL[i] for i in rng.integers(0, len(_SYL), n_syl))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


def synth_corpus(
    n_docs: int = 1000,
    vocab_size: int = 5000,
    mean_len: int = 120,
    seed: int = 0,
) -> list:
    """List of document text strings with Zipf term distribution."""
    rng = np.random.default_rng(seed)
    vocab = np.array(make_vocab(vocab_size, seed=seed + 1))
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = 1.0 / ranks
    probs /= probs.sum()
    docs = []
    lens = np.maximum(5, rng.poisson(mean_len, size=n_docs))
    for i in range(n_docs):
        idx = rng.choice(vocab_size, size=int(lens[i]), p=probs)
        docs.append(" ".join(vocab[idx]))
    return docs


def synth_queries(
    docs, n_queries: int = 64, terms_per_query: int = 4, seed: int = 100
) -> list:
    """Queries sampled from document content (so they have matches)."""
    rng = np.random.default_rng(seed)
    queries = []
    for _ in range(n_queries):
        doc = docs[int(rng.integers(0, len(docs)))]
        toks = doc.split()
        n = min(terms_per_query, len(toks))
        pick = rng.choice(len(toks), size=n, replace=False)
        queries.append(" ".join(toks[p] for p in pick))
    return queries
