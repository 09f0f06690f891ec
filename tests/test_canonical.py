"""M1 canonicalization unit tests (reference: link_extractor.py:81-92,

url_validator.py:20-33; canonical form per BASELINE.json)."""

import numpy as np

from link_profiler_repo_ray.functions.canonical import (
    canonicalize,
    host_of,
    is_internal_url,
    resolve_batch,
    url_hash64,
)


def test_lowercases_scheme_and_host():
    assert canonicalize("HTTPS://ExAmPlE.CoM/Path") == "https://example.com/Path"


def test_strips_default_ports():
    assert canonicalize("http://a.com:80/x") == "http://a.com/x"
    assert canonicalize("https://a.com:443/x") == "https://a.com/x"
    assert canonicalize("https://a.com:8443/x") == "https://a.com:8443/x"


def test_strips_fragment_and_utm():
    assert (
        canonicalize("https://a.com/p?utm_source=x&q=1&UTM_CAMPAIGN=y#top")
        == "https://a.com/p?q=1"
    )
    assert canonicalize("https://a.com/p?utm_source=x") == "https://a.com/p"


def test_percent_decodes():
    assert canonicalize("https://a.com/%64oc/5") == "https://a.com/doc/5"


def test_empty_path_becomes_slash():
    assert canonicalize("https://a.com") == "https://a.com/"


def test_non_web_schemes_dropped():
    for u in ("mailto:x@y.z", "tel:+1555", "javascript:void(0)", "ftp://files.a.com"):
        assert canonicalize(u) is None


def test_resolve_batch_relative_and_schemes():
    base = "https://example.com/dir/page.html"
    out = resolve_batch(
        [base] * 5,
        ["/abs", "rel.html", "../up.html", "mailto:x@y.z", "HTTPS://OTHER.COM/A"],
    )
    assert out == [
        "https://example.com/abs",
        "https://example.com/dir/rel.html",
        "https://example.com/up.html",
        None,
        "https://other.com/A",
    ]


def test_host_and_internal():
    assert host_of("https://Sub.Example.COM/x") == "sub.example.com"
    assert is_internal_url("https://sub.example.com/x", "example.com")
    assert not is_internal_url("https://examplexcom.org/x", "example.com")


def test_url_hash64_deterministic():
    a = url_hash64(["https://a.com/", "https://b.com/"])
    b = url_hash64(["https://a.com/", "https://b.com/"])
    assert a.dtype == np.uint64
    assert (a == b).all()
    assert a[0] != a[1]
