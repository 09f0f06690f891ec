"""End-to-end curation pipeline (pipelines/curate.py): dedup/gate
semantics vs a polars replay oracle, persisted-artifact layout, and
manifest-counter consistency."""

import os

import polars as pl
import pyarrow as pa
import pytest
import ray

from link_profiler_repo_ray.pipelines import curate, textdata

SF = "/root/testdata/sf0.001"


def _collect(ds) -> pl.DataFrame:
    return pl.from_arrow(
        pa.concat_tables(
            [ray.get(r) for r in ds.to_arrow_refs()], promote_options="permissive"
        )
    )


def _oracle_curated() -> pl.DataFrame:
    """Polars replay of clean → gates → dedup → scrub.

    Returns (curated_df, n_gated) — n_gated is the pre-dedup survivor
    count so the test can assert dedup removed something.
    """
    df = pl.read_parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text", "n_chars"
    )
    df = (
        df.with_columns(
            pl.col("text")
            .str.to_lowercase()
            .str.replace_all(textdata.ASCII_WS, " ")
            .str.strip_chars(" ")
            .str.split(" ")
            .alias("ws")
        )
        .with_columns(
            pl.col("ws")
            .list.eval(
                pl.element().filter(
                    (pl.element() != pl.element().shift(1)).fill_null(True)
                )
            )
            .alias("kept")
        )
        .with_columns(
            pl.col("kept").list.len().cast(pl.Int64).alias("n_tokens"),
            (pl.col("kept").list.n_unique() / pl.col("kept").list.len()).alias("u"),
            pl.col("kept").list.join(" ").alias("text_clean"),
        )
        .filter(
            (pl.col("n_chars") >= curate.MIN_CHARS)
            & (pl.col("n_tokens") >= curate.MIN_TOKENS)
            & (pl.col("u") >= curate.MIN_UNIQUE_RATIO)
        )
    )
    n_gated = df.height
    df = df.filter(pl.col("doc_id") == pl.col("doc_id").min().over("text_clean"))
    red = pl.col("text_clean")
    for tag, pat in textdata._PII_PATTERNS:
        red = red.str.replace_all(pat, f"[{tag}]")
    return df.select("doc_id", "source", "n_tokens", red.alias("text_curated")), n_gated


@pytest.mark.usefixtures("ray_session")
def test_curated_documents_matches_replay_oracle():
    got = _collect(curate.curated_documents(SF)).sort("doc_id")
    want, _ = _oracle_curated()
    want = want.sort("doc_id")
    assert got.height == want.height > 0
    for col in ("doc_id", "source", "n_tokens", "text_curated"):
        assert got[col].to_list() == want[col].to_list(), col


@pytest.mark.usefixtures("ray_session")
def test_curate_dedup_collapses_planted_clones(tmp_path):
    """The sf corpus has no post-clean exact dups, so plant some:
    docs 1/2/3 differ only in case + whitespace (identical after
    cleaning — min doc_id survives), doc 4 is distinct."""
    import pyarrow.parquet as pq

    base = " ".join(f"tok{i}" for i in range(60))  # clears every gate
    rows = [
        {"doc_id": 1, "source": "a", "text": base, "n_chars": len(base)},
        {"doc_id": 2, "source": "a", "text": base.upper(), "n_chars": len(base)},
        {"doc_id": 3, "source": "b", "text": "  " + base.replace(" ", "\t\t") + " ", "n_chars": len(base)},
        {"doc_id": 4, "source": "b", "text": base + "epsilon zeta", "n_chars": len(base) + 12},
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    got = _collect(curate.curated_documents(str(tmp_path))).sort("doc_id")
    assert got["doc_id"].to_list() == [1, 4]


@pytest.mark.usefixtures("ray_session")
def test_curate_corpus_artifacts(tmp_path):
    out = str(tmp_path / "curated")
    manifest = curate.curate_corpus(SF, out, budget=256)

    # partitioned layout: one directory per source under corpus/
    part_dirs = sorted(os.listdir(manifest["corpus_dir"]))
    assert part_dirs and all(d.startswith("source=") for d in part_dirs)

    corpus = pl.read_parquet(os.path.join(manifest["corpus_dir"], "**/*.parquet"))
    bins = pl.read_parquet(os.path.join(manifest["bins_dir"], "*.parquet"))

    # manifest counters agree with the persisted artifacts
    assert manifest["n_docs_curated"] == corpus.height == bins.height
    assert manifest["n_bins"] == bins["bin_id"].n_unique()
    per_bin = bins.unique(subset="bin_id")
    assert manifest["total_tokens"] == per_bin["bin_tokens"].sum()

    # every curated doc packed exactly once, bins respect the budget
    assert set(bins["doc_id"].to_list()) == set(corpus["doc_id"].to_list())
    fat = bins.group_by("bin_id").agg(
        pl.col("n_tokens").sum().alias("s"), pl.len().alias("n")
    )
    assert fat.filter((pl.col("s") > 256) & (pl.col("n") > 1)).height == 0

    # scrubbed corpus text matches the registry-surface pipeline
    reg = _collect(curate.curated_documents(SF)).sort("doc_id")
    assert (
        corpus.sort("doc_id")["text_curated"].to_list()
        == reg["text_curated"].to_list()
    )


@pytest.mark.usefixtures("ray_session")
def test_curate_pages_adapter_dedups_mirror_urls():
    """Same text served from two urls (the crawl-corpus mirror case)
    collapses to one survivor; doc_id is the url hash, source the host."""
    import ray.data as rd

    body = " ".join(f"w{i}" for i in range(60))
    pages = rd.from_items(
        [
            {"url": "https://a.example.com/x", "text": body},
            {"url": "https://b.example.com/mirror-of-x", "text": body},
            {"url": "https://b.example.com/y", "text": body + " unique tail"},
        ]
    )
    got = _collect(curate.curate_pages(pages))
    assert got.height == 2
    # the mirror pair kept exactly one row; the distinct text survived
    assert got.filter(pl.col("text_curated") == body).height == 1
    assert got.filter(pl.col("text_curated") == body + " unique tail").height == 1
    assert set(got["source"].to_list()) <= {"a.example.com", "b.example.com"}
