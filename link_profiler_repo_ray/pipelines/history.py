"""Historical snapshot analytics — the Ray analogue of the
reference's historical-data service (services/historical_data_service.py:
stores per-crawl snapshots and answers "what changed between runs")
and its redirect handling (crawlers/web_crawler.py follows 3xx chains
to a final URL before dedup/indexing).

Two operator classes live here, both absent elsewhere in the engine:

``snapshot_diff``
    Full-outer diff of two crawl snapshots by content hash — the
    added/removed/changed/unchanged classification every recrawl
    scheduler needs.  Only (doc_id, md5) pairs cross the exchange;
    document text is hashed inside the scan block and never shipped.

``redirect_chains``
    Resolve multi-hop redirect chains to their final destination by
    POINTER DOUBLING (path halving): each iteration joins the current
    mapping with itself, squaring the distance covered, so a chain of
    length L resolves in ceil(log2 L) partitioned exchanges instead of
    L sequential lookups.  This is the classic parallel
    pointer-jumping technique (Wyllie '79 / Shiloach-Vishkin) — the
    right shape for 10^10-row redirect tables where per-row chasing
    would need L full passes.
"""

from __future__ import annotations

import hashlib
import os

import polars as pl
import pyarrow as pa
import ray.data as rd

from .. import ops
from ..ops import hash_group_apply, tagged_union_join

__all__ = ["snapshot_diff", "redirect_chains", "profiles_incremental"]


def _documents(sf_dir: str, columns=None) -> rd.Dataset:
    return ops.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _md5_col(texts: list[str]) -> list[str]:
    # portable content hash: DuckDB's md5() recomputes the identical
    # digest, so the diff below is cross-engine exact (same rationale
    # as dataset_split's md5 bucket: portability over speed; the
    # per-row loop runs inside map_batches on a pruned 2-column scan)
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


# --- snapshot diff --------------------------------------------------------

def snapshot_diff(sf_dir: str) -> rd.Dataset:
    """Classify every URL across two crawl snapshots.

    Snapshot A is the documents corpus as-is; snapshot B is the
    deterministic "next crawl": docs with ``doc_id % 41 == 6`` have
    dropped out (404/expired), docs with ``doc_id % 9 == 2`` changed
    content (text + " [updated]"), and each doc with
    ``doc_id % 23 == 3`` spawned one new page (doc_id + max_id + 1,
    text + " [new]").  The diff itself is generic: hash text per
    block, full-outer-join the two (doc_id, hash) streams through one
    partitioned exchange, classify added / removed / changed /
    unchanged.  Reference: historical_data_service.py's
    snapshot-compare queries.
    """
    # bounded aggregate on a single pruned int column → new-doc id base
    base = int(_documents(sf_dir, ["doc_id"]).max("doc_id")) + 1

    def hash_a(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return df.select(
            "doc_id", pl.Series("h_a", _md5_col(df["text"].to_list()))
        ).to_arrow()

    def synth_b(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        kept = df.filter(pl.col("doc_id") % 41 != 6).select(
            "doc_id",
            pl.when(pl.col("doc_id") % 9 == 2)
            .then(pl.col("text") + pl.lit(" [updated]"))
            .otherwise(pl.col("text"))
            .alias("text"),
        )
        added = df.filter(pl.col("doc_id") % 23 == 3).select(
            (pl.col("doc_id") + base).alias("doc_id"),
            (pl.col("text") + pl.lit(" [new]")).alias("text"),
        )
        b = pl.concat([kept, added])
        return b.select(
            pl.col("doc_id").alias("doc_id_b"),
            pl.Series("h_b", _md5_col(b["text"].to_list())),
        ).to_arrow()

    cols = ["doc_id", "text"]
    a = _documents(sf_dir, cols).map_batches(
        hash_a, batch_format="pyarrow", zero_copy_batch=True
    )
    b = _documents(sf_dir, cols).map_batches(
        synth_b, batch_format="pyarrow", zero_copy_batch=True
    )

    joined = tagged_union_join(
        a,
        b,
        "doc_id",
        "doc_id_b",
        how="full",
        left_schema=pa.schema([("doc_id", pa.int64()), ("h_a", pa.string())]),
        right_schema=pa.schema([("doc_id_b", pa.int64()), ("h_b", pa.string())]),
    )

    def classify(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return df.select(
            pl.coalesce(pl.col("doc_id"), pl.col("doc_id_b")).alias("doc_id"),
            pl.when(pl.col("h_a").is_null())
            .then(pl.lit("added"))
            .when(pl.col("h_b").is_null())
            .then(pl.lit("removed"))
            .when(pl.col("h_a") != pl.col("h_b"))
            .then(pl.lit("changed"))
            .otherwise(pl.lit("unchanged"))
            .alias("status"),
        ).to_arrow()

    return joined.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)


# --- redirect resolution by pointer doubling ------------------------------

def _step(col: pl.Expr) -> pl.Expr:
    """One redirect hop: doc d 3xx-redirects iff d % 3 != 0 and d > 0,
    landing on max(d - ((2d mod 5) + 1), 0).  Steps always move down,
    so chains are acyclic; ~2/3 of docs redirect, giving geometric
    chain lengths (a handful of hops typically, tails of a few dozen).
    """
    return pl.max_horizontal(col - ((col * 2) % 5 + 1), pl.lit(0, dtype=pl.Int64))


def _is_redirect(col: pl.Expr) -> pl.Expr:
    return (col % 3 != 0) & (col > 0)


def redirect_chains(sf_dir: str, max_iters: int = 40) -> rd.Dataset:
    """(doc_id, final_id, hops): final destination of every doc's
    redirect chain.

    The redirect TABLE is synthesized closed-form (see ``_step``) so a
    DuckDB recursive CTE can recompute the expected fixpoint, but the
    resolution itself is generic pointer doubling over that table:
    mapping m0(d) = one hop (or d itself if terminal); each iteration
    self-joins m through one partitioned exchange to form
    m_{k+1}(d) = m_k(m_k(d)) with hops added, doubling the resolved
    distance per round.  Convergence = no row's cursor is still a
    redirecting node (cheap vectorized aggregate per round); loud
    failure on non-convergence, like near_dup_survivors.
    """
    def init_map(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        red = _is_redirect(pl.col("doc_id"))
        return df.select(
            "doc_id",
            pl.when(red).then(_step(pl.col("doc_id"))).otherwise(pl.col("doc_id")).alias("cur"),
            pl.when(red).then(pl.lit(1, dtype=pl.Int64)).otherwise(pl.lit(0, dtype=pl.Int64)).alias("hops"),
        ).to_arrow()

    mapping = (
        _documents(sf_dir, ["doc_id"])
        .map_batches(init_map, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    m_schema = pa.schema([("doc_id", pa.int64()), ("cur", pa.int64()), ("hops", pa.int64())])

    for _ in range(max_iters):
        # any row still parked on a redirecting node? (tiny aggregate)
        def live(batch: pa.Table) -> pa.Table:
            df = pl.from_arrow(batch)
            return df.select(
                _is_redirect(pl.col("cur")).cast(pl.Int64).sum().alias("n")
            ).to_arrow()

        remaining = mapping.map_batches(
            live, batch_format="pyarrow", zero_copy_batch=True
        ).sum("n")
        if not remaining:
            break

        # m_{k+1}(d) = m_k(m_k(d)): probe side keyed on cur, lookup side
        # keyed on doc_id — one partitioned exchange per doubling round
        lookup = mapping.map_batches(
            lambda b: pl.from_arrow(b)
            .rename({"doc_id": "at", "cur": "nxt", "hops": "nxt_hops"})
            .to_arrow(),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        l_schema = pa.schema([("at", pa.int64()), ("nxt", pa.int64()), ("nxt_hops", pa.int64())])
        joined = tagged_union_join(
            mapping, lookup, "cur", "at",
            left_schema=m_schema, right_schema=l_schema,
        )

        def advance(batch: pa.Table) -> pa.Table:
            df = pl.from_arrow(batch)
            return df.select(
                "doc_id",
                pl.col("nxt").alias("cur"),
                (pl.col("hops") + pl.col("nxt_hops")).alias("hops"),
            ).to_arrow()

        mapping = joined.map_batches(
            advance, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
    else:
        raise RuntimeError(
            f"redirect_chains: chains unresolved after {max_iters} doubling rounds"
        )

    return mapping.map_batches(
        lambda b: pl.from_arrow(b).rename({"cur": "final_id"}).to_arrow(),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# --- incremental view maintenance of link profiles ------------------------

_LINK_TYPES = ("dofollow", "nofollow", "sponsored", "ugc")


def profiles_incremental(sf_dir: str, multiplier: int = 1) -> rd.Dataset:
    """Link profiles AFTER a recrawl delta, by INCREMENTAL maintenance
    — apply the delta to a stored pair index instead of recomputing
    the web graph.

    At 10^10 URLs a recrawl touches a sliver of the corpus; rebuilding
    every profile from scratch is the classic mistake.  The
    maintainable state is the (target_url, source_host) PAIR index
    with counts (the same partial link_profiles pre-aggregates):
    counts are summable AND subtractable, and distinct-referrer
    cardinality — which is NOT subtractable from the rolled-up
    profile — falls out as the count of pairs with n > 0.

    Delta model: the snapshot_diff recrawl drops docs with
    ``doc_id % 41 == 6``; their out-edges enter the delta stream with
    sign −1.  Plan: one pair-keyed exchange builds the stored index,
    the (tiny) delta aggregates through the same exchange shape, the
    union re-merges per pair, dead pairs (n = 0) drop, and one
    target-keyed exchange rolls up profiles.  Equality with a full
    recompute over the surviving docs is pytest-pinned; the SQL
    oracle recomputes profiles over edges whose source doc survives.
    """
    from .graph import edges_dataset
    from ..ops import hash_aggregate

    edges = edges_dataset(sf_dir, multiplier).select_columns(
        ["source_url", "target_url", "source_host", "link_type"]
    ).materialize()

    def pair_combine(sign: int):
        return [
            (pl.len().cast(pl.Int64) * sign).alias("n"),
            *[
                ((pl.col("link_type") == t).sum().cast(pl.Int64) * sign).alias(
                    f"{t}_backlinks"
                )
                for t in _LINK_TYPES
            ],
        ]

    _MERGE = [
        pl.col("n").sum(),
        *[pl.col(f"{t}_backlinks").sum() for t in _LINK_TYPES],
    ]

    # stored state: the full pair index of snapshot A
    pairs_state = hash_aggregate(
        edges, ["target_url", "source_host"], combine=pair_combine(+1), merge=_MERGE
    )

    # delta stream: out-edges of the docs the recrawl removed, sign -1
    def removed_only(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        d = pl.col("source_url").str.extract(r"/doc/(\d+)$", 1).cast(pl.Int64)
        return df.filter(d % 41 == 6).to_arrow()

    pairs_delta = hash_aggregate(
        edges.map_batches(removed_only, batch_format="pyarrow", zero_copy_batch=True),
        ["target_url", "source_host"],
        combine=pair_combine(-1),
        merge=_MERGE,
    )

    merged = hash_aggregate(
        pairs_state.union(pairs_delta),
        ["target_url", "source_host"],
        combine=_MERGE,
        merge=_MERGE,
    ).map_batches(
        lambda b: pl.from_arrow(b).filter(pl.col("n") > 0).to_arrow(),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def profile(df: pl.DataFrame) -> pl.DataFrame:
        return df.group_by("target_url").agg(
            pl.col("n").sum().alias("total_backlinks"),
            pl.len().cast(pl.Int64).alias("unique_referring_domains"),
            *[pl.col(f"{t}_backlinks").sum() for t in _LINK_TYPES],
        )

    return hash_group_apply(merged, ["target_url"], profile)
