"""Content-quality scoring (M6) and bot-block detection (M7).

Pure per-document kernels mirroring
Link_Profiler/utils/content_validator.py:
- Flesch reading ease 206.835 - 1.015*(words/sentences) - 84.6*(syll/words),
  clamped to 0-100 (content_validator.py:103-118)
- vowel-group syllable counting with silent-e adjustment (:120-150)
- spam keyword score with 3 risk tiers + caps/punct-ratio penalties (:152-176)
- 3-word-phrase duplication score (:178-203)
- overall quality score blend (:205-230)
- bot-detection phrase list (:30-35, :275-302)
- MD5 content hash (:83)
"""

from __future__ import annotations

import hashlib
import re

__all__ = ["quality_metrics", "readability", "spam_score", "duplicate_score", "bot_indicators"]

SPAM_KEYWORDS = {
    3: ("buy now", "act fast", "limited time", "click here", "free money"),
    2: ("discount", "sale", "offer", "deal", "bonus"),
    1: ("cheap", "best", "top", "amazing", "incredible"),
}

BOT_PHRASES = (
    "access denied",
    "you have been blocked",
    "captcha",
    "robot check",
    "rate limit exceeded",
    "please verify you are human",
    "403 forbidden",
    "too many requests",
    "cloudflare",
)

_SENT_RE = re.compile(r"[.!?]+")
_NON_ALPHA_RE = re.compile(r"[^a-z]")
_VOWELS = frozenset("aeiouy")
_VOWEL_GROUP_RE = re.compile(r"[aeiouy]+")
# every byte except ASCII A-Z, for a C-level uppercase count on ASCII text
_NON_UPPER_BYTES = bytes(b for b in range(256) if not (65 <= b <= 90))


def _syllables(text: str) -> int:
    # per-word logic identical to the reference
    # (content_validator.py:120-150): count vowel groups in the
    # lowercased alpha-only word, silent-e adjustment, floor 1.  The
    # group count is a C-level regex findall instead of a per-char
    # Python loop (same result: runs of consecutive vowels).
    total = 0
    findall = _VOWEL_GROUP_RE.findall
    sub = _NON_ALPHA_RE.sub
    for word in text.lower().split():
        word = sub("", word)
        if not word:
            continue
        n = len(findall(word))
        if n > 1 and word[-1] == "e":
            n -= 1
        total += n if n > 0 else 1
    return total


def readability(text: str) -> float:
    sentences = len(_SENT_RE.findall(text))
    words = len(text.split())
    if sentences == 0 or words == 0:
        return 0.0
    score = 206.835 - 1.015 * (words / sentences) - 84.6 * (_syllables(text) / words)
    return max(0.0, min(100.0, score))


def spam_score(text: str) -> float:
    low = text.lower()
    score = 0.0
    for mult, kws in SPAM_KEYWORDS.items():
        for kw in kws:
            score += low.count(kw) * mult
    n = len(text)
    if n:
        if text.isascii():
            # C-level: delete every non-A-Z byte, count what remains
            # (str.isupper() is true for exactly A-Z within ASCII)
            upper = len(text.encode().translate(None, delete=_NON_UPPER_BYTES))
        else:
            upper = sum(1 for c in text if c.isupper())
        if upper / n > 0.3:
            score += 10
        if (text.count("!") + text.count("?")) / n > 0.05:
            score += 5
    return min(100.0, score)


def duplicate_score(text: str) -> float:
    words = text.split()
    if len(words) < 10:
        return 0.0
    # tuple keys over pre-lowered words: identical distinct-phrase
    # semantics as joined lowercase strings (words cannot contain
    # whitespace), without a join+lower per trigram
    wl = [w.lower() for w in words]
    counts: dict[tuple, int] = {}
    get = counts.get
    for p in zip(wl, wl[1:], wl[2:]):
        counts[p] = get(p, 0) + 1
    total = len(counts)
    if not total:
        return 0.0
    return sum(1 for c in counts.values() if c > 1) / total * 100.0


def bot_indicators(html_content: str) -> list[str]:
    low = html_content.lower()
    return [p for p in BOT_PHRASES if p in low]


def quality_metrics(clean_text: str) -> dict:
    """Full quality struct for one already-extracted text."""
    word_count = len(clean_text.split())
    read = readability(clean_text)
    spam = spam_score(clean_text)
    dup = duplicate_score(clean_text)

    if word_count < 50:
        length_score = 0
    elif word_count < 200:
        length_score = 30
    elif word_count < 500:
        length_score = 60
    elif word_count < 1000:
        length_score = 80
    else:
        length_score = 100
    quality = (
        (length_score * 0.4)
        + ((read / 100.0) * 40.0 * 0.6)
        - (spam / 100.0) * 30.0
        - (dup / 100.0) * 20.0
    )
    return {
        "word_count": word_count,
        "readability_score": read,
        "spam_score": spam,
        "duplicate_score": dup,
        "quality_score": max(0.0, min(100.0, quality)),
        "content_hash": hashlib.md5(clean_text.encode()).hexdigest(),
    }
