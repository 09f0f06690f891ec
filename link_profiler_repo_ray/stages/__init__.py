from .stages import (
    CanonicalizeStage,
    ExtractTextStage,
    ExtractLinksStage,
    SeoStage,
    QualityStage,
    CorpusReplayFetcher,
)

__all__ = [
    "CanonicalizeStage",
    "ExtractTextStage",
    "ExtractLinksStage",
    "SeoStage",
    "QualityStage",
    "CorpusReplayFetcher",
]
