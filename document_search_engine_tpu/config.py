"""Frozen configuration dataclasses.

One self-describing config rides inside every index checkpoint so an index
can be reopened without out-of-band knowledge (SURVEY.md §5 "Config/flags").
Spec source: BASELINE.json:5 (north star), DESIGN.md §3 (weighting).
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class AnalyzerConfig:
    """Host-side analyzer: normalize, split, hash (DESIGN.md §1)."""

    lowercase: bool = True
    token_pattern: str = r"[0-9a-z]+"
    stopwords: tuple = ()
    min_token_len: int = 1
    max_token_len: int = 64


@dataclass(frozen=True)
class ScoringConfig:
    """Scoring function spec (DESIGN.md §3).

    kind: "tfidf" (cosine-normalized tf-idf) or "bm25".
    scale_bits: fixed-point quantization scale for deterministic scoring
      (DESIGN.md §2). Defaults: 25 for tfidf (scores <= 1; per-contribution
      overflow clip sits at ~2.0, above any cosine contribution), 16 for
      bm25 (clip ~993, above any realistic idf*(k1+1)*qtf).
    """

    kind: str = "tfidf"
    k1: float = 0.9
    b: float = 0.4
    scale_bits: int = -1  # -1 -> kind default

    def __post_init__(self):
        if self.kind not in ("tfidf", "bm25"):
            raise ValueError(f"unknown scoring kind: {self.kind!r}")
        if self.scale_bits == -1:
            object.__setattr__(
                self, "scale_bits", 25 if self.kind == "tfidf" else 16
            )


@dataclass(frozen=True)
class IndexConfig:
    """Everything that defines index + query semantics."""

    analyzer: AnalyzerConfig = field(default_factory=AnalyzerConfig)
    scoring: ScoringConfig = field(default_factory=ScoringConfig)
    max_query_terms: int = 32
    # Device padding granularity for postings / docs (static shapes for jit).
    nnz_pad_to: int = 1024
    docs_pad_to: int = 128

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "IndexConfig":
        d = json.loads(s)
        d["analyzer"] = AnalyzerConfig(
            **{**d["analyzer"], "stopwords": tuple(d["analyzer"]["stopwords"])}
        )
        d["scoring"] = ScoringConfig(**d["scoring"])
        return IndexConfig(**d)
