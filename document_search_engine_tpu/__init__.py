"""document_search_engine_tpu — a TPU-native lexical retrieval stack.

Brand-new framework with the capabilities of the small Python full-text
search engine `CodeOptimist/document-search-engine` (BASELINE.json:5),
re-designed TPU-first: hashed-term analyzer, document-sharded CSR
term–document matrix in HBM, Pallas TF-IDF/BM25 scoring over batched
queries, per-shard top-k + all-gather merge over ICI. See DESIGN.md.
"""
from .config import AnalyzerConfig, IndexConfig, ScoringConfig

__version__ = "0.1.0"

__all__ = [
    "AnalyzerConfig",
    "IndexConfig",
    "ScoringConfig",
    "__version__",
]
