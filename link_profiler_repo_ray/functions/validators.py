"""Small validator predicates (M10/M12) — url_validator.py semantics."""

from __future__ import annotations

import re

from .canonical import host_of

__all__ = ["is_valid_url", "is_valid_email", "is_domain_allowed"]

_EMAIL_RE = re.compile(r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$")


def is_valid_url(url: str) -> bool:
    """Scheme + netloc present (url_validator.py:20-26)."""
    from urllib.parse import urlsplit

    try:
        p = urlsplit(url)
    except ValueError:
        return False
    return bool(p.scheme) and bool(p.netloc)


def is_valid_email(email: str) -> bool:
    """Regex format check (url_validator.py:82-85)."""
    return _EMAIL_RE.match(email) is not None


def is_domain_allowed(url: str, allowed_domains: set[str]) -> bool:
    """Empty set ⇒ allow all, else host (or parent domain) membership

    (core/models.py:118-121)."""
    if not allowed_domains:
        return True
    h = host_of(url)
    if h in allowed_domains:
        return True
    return any(h.endswith("." + d) for d in allowed_domains)
