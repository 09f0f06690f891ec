from .stages import (
    CanonicalizeStage,
    ExtractTextStage,
    ExtractLinksStage,
    SeoStage,
    QualityStage,
    AIScoreStage,
    AlertStage,
    CRAWL_ALERT_RULES,
    ALERT_SCHEMA,
    CorpusReplayFetcher,
)

__all__ = [
    "CanonicalizeStage",
    "ExtractTextStage",
    "ExtractLinksStage",
    "SeoStage",
    "QualityStage",
    "AIScoreStage",
    "AlertStage",
    "CRAWL_ALERT_RULES",
    "ALERT_SCHEMA",
    "CorpusReplayFetcher",
]
