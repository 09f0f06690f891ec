"""Synthetic corpus invariants: the text column IS the reference

extraction of the html column (byte-identical), and the embedded link
structure matches the closed-form ground truth."""

import glob
import os

import pyarrow.parquet as pq

from link_profiler_repo_ray.functions.htmlx import extract_links, extract_text
from link_profiler_repo_ray.sources import corpus

SF = "/root/testdata/sf0.001"


def _pages():
    d = corpus.corpus_dir(SF)
    files = sorted(glob.glob(os.path.join(d, "pages_*.parquet")))
    return pq.read_table(files)


def test_text_column_byte_identical_to_extraction():
    t = _pages()
    htmls = t.column("html").to_pylist()
    texts = t.column("text").to_pylist()
    for h, expected in zip(htmls, texts):
        assert extract_text(h.decode("utf-8")) == expected


def test_links_match_ground_truth():
    t = _pages()
    n = t.num_rows
    for i in range(0, n, 29):
        url = t.column("url")[i].as_py()
        got = [
            (l["target_url"], l["anchor_text"], l["link_type"])
            for l in extract_links(url, t.column("html")[i].as_py().decode())
        ]
        exp = [
            (l["target_url"], l["anchor_text"], l["link_type"])
            for l in corpus.expected_links(i, n)
        ]
        assert got == exp, f"doc {i}"


def test_generation_is_deterministic_and_cached():
    d1 = corpus.corpus_dir(SF)
    d2 = corpus.corpus_dir(SF)
    assert d1 == d2
    assert os.path.exists(os.path.join(d1, "_MANIFEST.json"))


def test_seed_and_robots_shapes():
    n = corpus.corpus_n_docs(SF)
    seeds = corpus.seed_rows(n)
    assert seeds[-2]["url"].startswith("https://h0.example.com/doc/9")
    assert len([s for s in seeds if s["priority"] == 1]) > 0
    robots = corpus.robots_map(n)
    assert any("Disallow: /doc/" in v for v in robots.values())
    assert any("Crawl-delay: 2" in v for v in robots.values())
