"""Host-side tokenizer/analyzer.

The normalization contract (DESIGN.md §1/§3): lowercase, extract runs of
`[0-9a-z]+`, drop tokens outside [min_token_len, max_token_len] and
stopwords. This is the single normalization used by the oracle, the engine
build frontend, and the query frontend — parity depends on them agreeing.
"""
from __future__ import annotations

import re
from functools import lru_cache

from ..config import AnalyzerConfig


class Tokenizer:
    def __init__(self, config: AnalyzerConfig | None = None):
        self.config = config or AnalyzerConfig()
        self._pattern = re.compile(self.config.token_pattern)
        self._stop = frozenset(self.config.stopwords)

    def __call__(self, text: str) -> list:
        cfg = self.config
        if cfg.lowercase:
            text = text.lower()
        toks = self._pattern.findall(text)
        lo, hi = cfg.min_token_len, cfg.max_token_len
        toks = [
            t for t in toks if lo <= len(t) <= hi and t not in self._stop
        ]
        return toks


@lru_cache(maxsize=8)
def _default_tokenizer() -> Tokenizer:
    return Tokenizer(AnalyzerConfig())


def tokenize(text: str) -> list:
    """Tokenize with the default AnalyzerConfig."""
    return _default_tokenizer()(text)
