"""Text-analysis kernels for the training-data pipeline ops.

Beyond the reference's own operators: language-ID (character n-gram /
stopword heuristic), token counting (whitespace + BPE-ish regex),
quality ratios, and rolling-hash document fingerprinting.  All pure,
batch-oriented, deterministic.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = [
    "token_count",
    "bpe_ish_tokens",
    "text_stats",
    "lang_id",
    "fingerprint64",
]

# GPT-2-style pretokenizer shape without \p classes (stdlib re).
_BPE_RE = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+")

_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "that", "it", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"},
    "de": {"der", "die", "das", "und", "ist", "von", "den", "mit", "ein", "eine"},
}


def token_count(text: str) -> int:
    """Whitespace token count."""
    return len(text.split())


def bpe_ish_tokens(text: str) -> int:
    """Approximate BPE token count via a GPT-2-style pretokenizer regex."""
    return len(_BPE_RE.findall(text))


def text_stats(text: str) -> dict:
    """Quality-scoring ratios: lengths, punctuation/upper/stopword ratios."""
    n_chars = len(text)
    toks = text.split()
    n_tokens = len(toks)
    n_distinct = len(set(toks))
    n_punct = sum(1 for c in text if not c.isalnum() and not c.isspace())
    n_upper = sum(1 for c in text if c.isupper())
    en_stop = _STOPWORDS["en"]
    n_stop = sum(1 for t in toks if t.lower() in en_stop)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_distinct_tokens": n_distinct,
        "punct_ratio": n_punct / n_chars if n_chars else 0.0,
        "upper_ratio": n_upper / n_chars if n_chars else 0.0,
        "stopword_ratio": n_stop / n_tokens if n_tokens else 0.0,
        "mean_token_len": (sum(len(t) for t in toks) / n_tokens) if n_tokens else 0.0,
    }


def lang_id(text: str) -> str:
    """Tiny heuristic language ID.

    CJK codepoint density → "zh"; else the stopword table with the most
    hits; ties/no-hits → "en".  A deterministic, dependency-free stand-in
    for fastText-style LID; the actor-pool plumbing is identical.
    """
    if not text:
        return "und"
    cjk = sum(1 for c in text[:400] if "一" <= c <= "鿿")
    if cjk > len(text[:400]) * 0.2:
        return "zh"
    toks = [t.lower() for t in text.split()]
    best_lang, best_hits = "en", 0
    for lang_code, stops in _STOPWORDS.items():
        hits = sum(1 for t in toks if t in stops)
        if hits > best_hits:
            best_lang, best_hits = lang_code, hits
    return best_lang


def fingerprint64(text: str, k: int = 8) -> np.uint64:
    """Rolling Karp-Rabin fingerprint: min over word k-gram hashes.

    A winnowing-style document fingerprint; identical documents (and
    documents sharing their minimal k-gram) collide, enabling cheap
    candidate generation before exact comparison.
    """
    words = text.split()
    base = np.uint64(1099511628211)
    mask = np.uint64(0xFFFFFFFFFFFFFFFF)
    if not words:
        return np.uint64(0)
    hashes = []
    with np.errstate(over="ignore"):
        h = np.uint64(1469598103934665603)
        window: list[np.uint64] = []
        for w in words:
            hw = np.uint64(0)
            for ch in w:
                hw = (hw * base + np.uint64(ord(ch))) & mask
            window.append(hw)
            if len(window) >= k or len(window) == len(words):
                h = np.uint64(1469598103934665603)
                for x in window[-k:]:
                    h = ((h ^ x) * base) & mask
                hashes.append(h)
    return min(hashes) if hashes else np.uint64(0)
