from .stages import (
    CanonicalizeStage,
    ExtractTextStage,
    ExtractLinksStage,
    SeoStage,
    QualityStage,
    AIScoreStage,
    CorpusReplayFetcher,
)

__all__ = [
    "CanonicalizeStage",
    "ExtractTextStage",
    "ExtractLinksStage",
    "SeoStage",
    "QualityStage",
    "AIScoreStage",
    "CorpusReplayFetcher",
]
