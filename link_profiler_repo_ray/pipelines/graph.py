"""Backlink-graph analytics: pure ``ray.data`` Dataset pipelines.

Operators covered (SURVEY.md §2): A1 link profiles, A4 referring-domain
cardinality (exact + HyperLogLog), A6 link velocity, D1 edge dedup,
J2 link intersect, plus the salted (source_host, target_host) edge
rollup the BASELINE north-star names explicitly.

Shuffle discipline (SURVEY.md §7.4): every aggregation goes through
``ops.hash_aggregate`` — a per-block vectorized combiner (which bounds
hub-key skew: a hot host contributes one partial row per block, the
combiner IS the salt) followed by a hash-partition exchange and a
vectorized per-partition merge.  Raw edges are never shuffled.
"""

from __future__ import annotations

import glob
import os

import polars as pl
import pyarrow as pa
import ray.data as rd

from ..functions.sketches import HyperLogLog, token_hashes
from .. import ops
from ..ops import hash_aggregate, hash_group_apply
from ..sources import corpus as corpus_mod
from ..stages import ExtractLinksStage

__all__ = [
    "pages_dataset",
    "edges_dataset",
    "link_profiles",
    "top_anchor_profiles",
    "top_anchors_referrers",
    "host_graph",
    "host_pagerank",
    "host_hits",
    "host_components",
    "host_communities",
    "link_overlap_hll",
    "host_triangles",
    "host_kcore",
    "host_reciprocal_links",
    "host_clustering",
    "host_triangle_counts",
    "related_hosts_cocitation",
    "host_degree_assortativity",
    "undirected_host_pairs",
    "undirected_degrees",
    "referring_domains_exact",
    "referring_domains_hll",
    "host_harmonic_centrality",
    "host_effective_diameter",
    "host_pagerank_personalized",
    "link_intersect",
    "link_velocity",
]

_LINK_TYPES = ("dofollow", "nofollow", "sponsored", "ugc")


def corpus_files(sf_dir: str, multiplier: int = 1) -> list[str]:
    cdir = corpus_mod.corpus_dir(sf_dir, multiplier)
    return sorted(glob.glob(os.path.join(cdir, "pages_*.parquet")))


def pages_dataset(sf_dir: str, multiplier: int = 1, columns: list[str] | None = None) -> rd.Dataset:
    """The Common-Crawl-style pages table (column-pruned at the read)."""
    return ops.read_parquet(corpus_files(sf_dir, multiplier), columns=columns)


def edges_dataset(sf_dir: str, multiplier: int = 1) -> rd.Dataset:
    """Full-corpus link extraction: pages -> exploded edge rows (M2)."""
    ds = pages_dataset(sf_dir, multiplier, columns=["url", "warc_ts", "html"])
    return ds.map_batches(ExtractLinksStage(), batch_format="pyarrow", zero_copy_batch=True)


# --- A1: link profiles ----------------------------------------------------

def link_profiles(sf_dir: str, multiplier: int = 1, edges: rd.Dataset | None = None) -> rd.Dataset:
    """Per-target profile counts (core/models.py:449-491).

    total_backlinks counts every edge (canonical pseudo-edges included,
    matching create_link_profile_from_backlinks which appends them to
    the total but to no per-type counter); per-type counters cover the
    four rel-derived classes the extractor can produce.

    ONE exchange (keyed target_url): per-batch combiner pre-reduces to
    (target, host) partials (bounding hot-target skew to one row per
    host per batch), then the partition apply dedups pairs and rolls up
    per-target totals where the pair count IS the distinct-referrer
    count.  The previous two-hash_aggregate plan paid a second
    sort-shuffle for no extra information.
    """
    if edges is None:
        edges = edges_dataset(sf_dir, multiplier)
    edges = edges.select_columns(["target_url", "source_host", "link_type"])

    def pre(df: pl.DataFrame) -> pl.DataFrame:
        return df.group_by(["target_url", "source_host"]).agg(
            pl.len().cast(pl.Int64).alias("n"),
            *[
                (pl.col("link_type") == t).sum().cast(pl.Int64).alias(f"{t}_backlinks")
                for t in _LINK_TYPES
            ],
        )

    def profile(df: pl.DataFrame) -> pl.DataFrame:
        pair = df.group_by(["target_url", "source_host"]).agg(
            pl.col("n").sum(),
            *[pl.col(f"{t}_backlinks").sum() for t in _LINK_TYPES],
        )
        return pair.group_by("target_url").agg(
            pl.col("n").sum().alias("total_backlinks"),
            pl.len().cast(pl.Int64).alias("unique_referring_domains"),
            *[pl.col(f"{t}_backlinks").sum() for t in _LINK_TYPES],
        )

    return hash_group_apply(edges, ["target_url"], profile, pre=pre)


def top_anchor_profiles(sf_dir: str, multiplier: int = 1, k: int = 10) -> rd.Dataset:
    """Top-k anchor texts + referring domains per target (O3).

    Count-desc, then first-seen (anchor asc as the deterministic proxy)
    per core/models.py:481,489.  Keys are pre-counted per block
    (combiner), the apply stage does one vectorized top-k per partition.
    """
    edges = edges_dataset(sf_dir, multiplier).select_columns(
        ["target_url", "anchor_text", "source_host"]
    )

    def topk(df: pl.DataFrame) -> pl.DataFrame:
        def top_map(sub: pl.DataFrame, col: str) -> pl.DataFrame:
            counts = (
                sub.group_by(["target_url", col])
                .agg(pl.col("cnt").sum().alias("c"))
                .sort(["target_url", "c", col], descending=[False, True, False])
                .with_columns(pl.col(col).cum_count().over("target_url").alias("r"))
                .filter(pl.col("r") <= k)
            )
            return counts.group_by("target_url").agg(
                pl.col(col).alias(f"top_{col}_keys"), pl.col("c").alias(f"top_{col}_counts")
            )

        a = top_map(df, "anchor_text")
        d = top_map(df, "source_host")
        return a.join(d, on="target_url", how="full", coalesce=True)

    def pre(df: pl.DataFrame) -> pl.DataFrame:
        return (
            df.group_by(["target_url", "anchor_text", "source_host"])
            .agg(pl.len().cast(pl.Int64).alias("cnt"))
        )

    return hash_group_apply(edges, ["target_url"], topk, pre=pre)


def top_anchors_referrers(sf_dir: str, multiplier: int = 1, k: int = 10) -> rd.Dataset:
    """Row-form top-k anchors + referring domains per target (O3/A1).

    Same semantics as :func:`top_anchor_profiles` (count desc, key asc
    per core/models.py:481,489) but exploded to
    (target_url, kind, item, cnt, rank) rows — exactly hashable by the
    driver's value-compare, with a closed-form DuckDB oracle.
    """
    edges = edges_dataset(sf_dir, multiplier).select_columns(
        ["target_url", "anchor_text", "source_host"]
    )

    def pre(df: pl.DataFrame) -> pl.DataFrame:
        return df.group_by(["target_url", "anchor_text", "source_host"]).agg(
            pl.len().cast(pl.Int64).alias("cnt")
        )

    def topk(df: pl.DataFrame) -> pl.DataFrame:
        outs = []
        for col, kind in (("anchor_text", "anchor"), ("source_host", "referrer")):
            outs.append(
                df.group_by(["target_url", col])
                .agg(pl.col("cnt").sum().alias("c"))
                .sort(["target_url", "c", col], descending=[False, True, False])
                .with_columns(
                    pl.col(col).cum_count().over("target_url").cast(pl.Int64).alias("rank")
                )
                .filter(pl.col("rank") <= k)
                .select(
                    pl.col("target_url"),
                    pl.lit(kind).alias("kind"),
                    pl.col(col).alias("item"),
                    pl.col("c").alias("cnt"),
                    pl.col("rank"),
                )
            )
        return pl.concat(outs)

    return hash_group_apply(edges, ["target_url"], topk, pre=pre)


# --- host-pair rollup (the salted groupby of the north star) -------------

def host_graph(sf_dir: str, multiplier: int = 1, edges: rd.Dataset | None = None) -> rd.Dataset:
    """(source_host, target_host) edge counts.

    Hub-domain skew is absorbed by the combine stage: a hub pair is
    reduced to ONE partial row per block before the exchange, so the
    reduce side receives O(blocks) rows per hot pair, never O(edges).
    """
    if edges is None:
        edges = edges_dataset(sf_dir, multiplier)
    return hash_aggregate(
        edges.select_columns(["source_host", "target_host"]),
        ["source_host", "target_host"],
        combine=[pl.len().cast(pl.Int64).alias("n_links")],
        merge=[pl.col("n_links").sum()],
    )


def host_pagerank(
    sf_dir: str,
    multiplier: int = 1,
    damping: float = 0.85,
    iters: int = 20,
    edges: rd.Dataset | None = None,
) -> rd.Dataset:
    """Weighted PageRank over the host graph (iterative, distributed).

    The reference attaches an externally-sourced ``authority_score``
    per domain (core/models.py:255-297); this computes an intrinsic
    link-graph authority instead — the canonical iterative-algorithm
    shape on this engine.  Per iteration: one partitioned join of the
    (materialized-once) weighted host-pair table against the current
    rank vector, one hash aggregate of the pushed contributions, and a
    left-join back onto the full host list; dangling-host mass is the
    only driver-side scalar per iteration.  Edge weight = n_links /
    total outbound links of the source host.
    """
    from ..ops import tagged_union_join

    hg = host_graph(sf_dir, multiplier, edges=edges).materialize()
    outw = hash_aggregate(
        hg,
        ["source_host"],
        combine=[pl.col("n_links").sum().alias("out_total")],
        merge=[pl.col("out_total").sum()],
    )
    hg_schema = pa.schema(
        [("source_host", pa.string()), ("target_host", pa.string()), ("n_links", pa.int64())]
    )
    outw_schema = pa.schema([("source_host", pa.string()), ("out_total", pa.int64())])
    weighted = tagged_union_join(
        hg, outw, "source_host", "source_host",
        left_schema=hg_schema, right_schema=outw_schema,
    ).map_batches(
        lambda b: pl.from_arrow(b)
        .select(
            "source_host",
            "target_host",
            (pl.col("n_links") / pl.col("out_total")).alias("w"),
        )
        .to_arrow(),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    # the node set = every host appearing on either side
    def hosts_of(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return pl.concat(
            [
                df.select(pl.col("source_host").alias("host")),
                df.select(pl.col("target_host").alias("host")),
            ]
        ).unique().to_arrow()

    all_hosts = hash_group_apply(
        hg.map_batches(hosts_of, batch_format="pyarrow", zero_copy_batch=True),
        ["host"],
        lambda df: df.unique(),
    ).materialize()
    n_hosts = all_hosts.count()
    outw = outw.materialize()

    ranks = all_hosts.map_batches(
        lambda b: pl.from_arrow(b)
        .with_columns(pl.lit(1.0 / n_hosts).alias("rank"))
        .to_arrow(),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    ranks_schema = pa.schema([("host", pa.string()), ("rank", pa.float64())])
    w_schema = pa.schema(
        [("source_host", pa.string()), ("target_host", pa.string()), ("w", pa.float64())]
    )
    hosts_schema = pa.schema([("host", pa.string())])

    outw_schema2 = pa.schema([("source_host", pa.string()), ("out_total", pa.int64())])
    for _ in range(iters):
        # dangling mass: rank held by hosts with no outlinks — a
        # DISTRIBUTED left join + scalar sum (no rank-vector
        # materialization on the driver; the rank table is O(hosts))
        dangling = (
            tagged_union_join(
                ranks, outw, "host", "source_host", how="left",
                left_schema=ranks_schema, right_schema=outw_schema2,
            )
            .map_batches(
                lambda b: pl.from_arrow(b)
                .filter(pl.col("out_total").is_null())
                .select("rank")
                .to_arrow(),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .sum("rank")
            or 0.0
        )
        contrib = tagged_union_join(
            weighted, ranks, "source_host", "host",
            left_schema=w_schema, right_schema=ranks_schema,
        ).map_batches(
            lambda b: pl.from_arrow(b)
            .select(
                pl.col("target_host").alias("host"),
                (pl.col("w") * pl.col("rank")).alias("push"),
            )
            .to_arrow(),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        sums = hash_aggregate(
            contrib,
            ["host"],
            combine=[pl.col("push").sum().alias("push")],
            merge=[pl.col("push").sum()],
        )
        base = (1.0 - damping) / n_hosts + damping * dangling / n_hosts
        sums_schema = pa.schema([("host", pa.string()), ("push", pa.float64())])
        ranks = tagged_union_join(
            all_hosts, sums, "host", "host", how="left",
            left_schema=hosts_schema, right_schema=sums_schema,
        ).map_batches(
            lambda b, base=base: pl.from_arrow(b)
            .select(
                "host",
                (base + damping * pl.col("push").fill_null(0.0)).alias("rank"),
            )
            .to_arrow(),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        ranks = ops.materialize_cut(ranks)

    return ranks.map_batches(
        lambda b: pl.from_arrow(b)
        .select("host", pl.col("rank").round(8))
        .to_arrow(),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def host_hits(
    sf_dir: str,
    multiplier: int = 1,
    iters: int = 20,
    edges: rd.Dataset | None = None,
) -> rd.Dataset:
    """HITS hub/authority scores over the weighted host graph
    (Kleinberg 1999) — the second intrinsic link-graph authority
    measure next to :func:`host_pagerank` (the reference's
    ``authority_score`` per domain, core/models.py:255-297, is an
    external feed; PageRank and HITS are the standard intrinsic
    replacements).

    Same distributed iteration shape as PageRank: the weighted pair
    table is materialized ONCE; each half-step is one partitioned join
    of edges against the current score vector plus one thin hash
    aggregate, and the only driver-side value per half-step is the L2
    norm (a scalar ``sum``).  auth(v) = Σ_{u→v} w·hub(u), then
    normalize; hub(u) = Σ_{u→v} w·auth(v), then normalize — hosts
    without in-links (out-links) keep authority (hub) exactly 0.0 via
    the left-join fill.
    """
    from ..ops import tagged_union_join

    hg = host_graph(sf_dir, multiplier, edges=edges).materialize()
    hg_schema = pa.schema(
        [("source_host", pa.string()), ("target_host", pa.string()), ("n_links", pa.int64())]
    )

    def hosts_of(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return pl.concat(
            [
                df.select(pl.col("source_host").alias("host")),
                df.select(pl.col("target_host").alias("host")),
            ]
        ).unique().to_arrow()

    all_hosts = hash_group_apply(
        hg.map_batches(hosts_of, batch_format="pyarrow", zero_copy_batch=True),
        ["host"],
        lambda df: df.unique(),
    ).materialize()
    hosts_schema = pa.schema([("host", pa.string())])
    score_schema = pa.schema([("host", pa.string()), ("score", pa.float64())])
    sums_schema = pa.schema([("host", pa.string()), ("push", pa.float64())])

    def _init(b: pa.Table) -> pa.Table:
        return pl.from_arrow(b).with_columns(pl.lit(1.0).alias("score")).to_arrow()

    hubs = all_hosts.map_batches(_init, batch_format="pyarrow", zero_copy_batch=True).materialize()
    auths = hubs

    def _half_step(scores: rd.Dataset, src_key: str, dst_key: str) -> rd.Dataset:
        """One HITS half-step: push w·score along edges from src_key
        to dst_key, aggregate, L2-normalize, re-attach to all hosts."""
        pushed = tagged_union_join(
            hg, scores, src_key, "host",
            left_schema=hg_schema, right_schema=score_schema,
        ).map_batches(
            lambda b, dst=dst_key: pl.from_arrow(b)
            .select(
                pl.col(dst).alias("host"),
                (pl.col("n_links") * pl.col("score")).alias("push"),
            )
            .to_arrow(),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        sums = ops.materialize_cut(
            hash_aggregate(
                pushed,
                ["host"],
                combine=[pl.col("push").sum().alias("push")],
                merge=[pl.col("push").sum()],
            )
        )
        sumsq = (
            sums.map_batches(
                lambda b: pl.from_arrow(b).select((pl.col("push") ** 2).alias("sq")).to_arrow(),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).sum("sq")
            or 0.0
        )
        norm = sumsq ** 0.5 if sumsq > 0 else 1.0
        return ops.materialize_cut(
            tagged_union_join(
                all_hosts, sums, "host", "host", how="left",
                left_schema=hosts_schema, right_schema=sums_schema,
            ).map_batches(
                lambda b, norm=norm: pl.from_arrow(b)
                .select("host", (pl.col("push").fill_null(0.0) / norm).alias("score"))
                .to_arrow(),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )

    for _ in range(iters):
        auths = _half_step(hubs, "source_host", "target_host")
        hubs = _half_step(auths, "target_host", "source_host")

    joined = tagged_union_join(
        auths.map_batches(
            lambda b: pl.from_arrow(b).rename({"score": "authority"}).to_arrow(),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        hubs.map_batches(
            lambda b: pl.from_arrow(b).rename({"score": "hub"}).to_arrow(),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        "host", "host",
        left_schema=pa.schema([("host", pa.string()), ("authority", pa.float64())]),
        right_schema=pa.schema([("host", pa.string()), ("hub", pa.float64())]),
    )
    return joined.map_batches(
        lambda b: pl.from_arrow(b)
        .select("host", pl.col("authority").round(8), pl.col("hub").round(8))
        .to_arrow(),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def host_components(
    sf_dir: str,
    multiplier: int = 1,
    edges: rd.Dataset | None = None,
    max_iters: int = 40,
) -> rd.Dataset:
    """Weakly-connected components of the host graph → (host,
    root_host) — link-neighborhood clusters, the graph-analytics
    sibling of PageRank/HITS (the reference groups domains into
    "networks" for competitive analysis,
    services/competitive_analysis_service.py; components are the
    graph-native version of that grouping).

    Reuses the SAME distributed min-label propagation as MinHash dedup
    survivor selection (textdata.near_dup_survivors: one exchange per
    iteration, loud failure on non-convergence) over 64-bit host
    hashes; two partitioned joins then re-attach host names, so the
    component id is a host NAME (the member with the minimum hash),
    not an opaque integer.  Nothing is broadcast; hash collisions
    would only ever MERGE two components (never split), with
    probability ~n²/2⁶⁴.
    """
    from ..ops import tagged_union_join
    from .textdata import near_dup_survivors

    hg = host_graph(sf_dir, multiplier, edges=edges).materialize()

    def to_pairs(batch: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(batch)
            .select(
                pl.col("source_host").hash(seed=0).reinterpret(signed=True).alias("doc_a"),
                pl.col("target_host").hash(seed=0).reinterpret(signed=True).alias("doc_b"),
            )
            .to_arrow()
        )

    labels = near_dup_survivors(
        sf_dir,
        max_iters=max_iters,
        pairs=hg.map_batches(to_pairs, batch_format="pyarrow", zero_copy_batch=True),
    )

    def to_names(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return (
            pl.concat(
                [
                    df.select(pl.col("source_host").alias("host")),
                    df.select(pl.col("target_host").alias("host")),
                ]
            )
            .unique()
            .with_columns(pl.col("host").hash(seed=0).reinterpret(signed=True).alias("h"))
            .to_arrow()
        )

    names = hash_group_apply(
        hg.map_batches(to_names, batch_format="pyarrow", zero_copy_batch=True),
        ["host"],
        lambda df: df.unique(subset=["host"]),
    ).materialize()

    names_schema = pa.schema([("host", pa.string()), ("h", pa.int64())])
    labels_schema = pa.schema([("doc_id", pa.int64()), ("survivor_id", pa.int64())])
    with_host = tagged_union_join(
        labels, names, "doc_id", "h",
        left_schema=labels_schema, right_schema=names_schema,
    ).map_batches(
        lambda b: pl.from_arrow(b).select("host", "survivor_id").to_arrow(),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    rooted = tagged_union_join(
        with_host,
        names.map_batches(
            lambda b: pl.from_arrow(b).rename({"host": "root_host"}).to_arrow(),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        "survivor_id", "h",
        left_schema=pa.schema([("host", pa.string()), ("survivor_id", pa.int64())]),
        right_schema=pa.schema([("root_host", pa.string()), ("h", pa.int64())]),
    )
    return rooted.map_batches(
        lambda b: pl.from_arrow(b).select("host", "root_host").to_arrow(),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def undirected_host_pairs(edges: rd.Dataset) -> rd.Dataset:
    """Distinct undirected host pairs (a < b), self-loops dropped —
    materialized because the graph algorithms below read it repeatedly.
    Per-block unique is a combiner; the hash exchange dedups globally."""

    def to_und(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).select(["source_host", "target_host"])
        return (
            df.filter(pl.col("source_host") != pl.col("target_host"))
            .select(
                pl.min_horizontal("source_host", "target_host").alias("a"),
                pl.max_horizontal("source_host", "target_host").alias("b"),
            )
            .unique()
            .to_arrow()
        )

    return hash_group_apply(
        edges.map_batches(to_und, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"],
        lambda df: df.unique(),
    ).materialize()


def undirected_degrees(und: rd.Dataset) -> rd.Dataset:
    """(host, deg) over the distinct undirected pair table."""

    def corners(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return pl.concat(
            [df.select(pl.col("a").alias("host")), df.select(pl.col("b").alias("host"))]
        ).to_arrow()

    return hash_aggregate(
        und.map_batches(corners, batch_format="pyarrow", zero_copy_batch=True),
        ["host"],
        combine=[pl.len().cast(pl.Int64).alias("deg")],
        merge=[pl.col("deg").sum()],
    ).materialize()


def host_triangles(
    sf_dir: str,
    multiplier: int = 1,
    edges: rd.Dataset | None = None,
    k: int = 20,
) -> rd.Dataset:
    """Top-``k`` hosts by triangle participation — see
    ``host_triangle_counts`` for the algorithm and scale analysis."""
    per_host = host_triangle_counts(sf_dir, multiplier, edges=edges)
    return ops.block_topk(per_host, ["triangles", "host"], [True, False], k)


def host_triangle_counts(
    sf_dir: str,
    multiplier: int = 1,
    edges: rd.Dataset | None = None,
    und: rd.Dataset | None = None,
    deg: rd.Dataset | None = None,
) -> rd.Dataset:
    """Per-host triangle participation counts over the undirected host
    graph → ``(host, triangles)``, one row per host in ≥ 1 triangle.

    Triangle density is the classic link-network signal the reference
    approximates with pairwise "common referring domains" overlap
    (services/competitive_analysis_service.py's link-intersect
    analysis, J2): a host whose neighbors also link to EACH OTHER sits
    inside a genuine community (or a link farm), while a pure hub's
    neighbors don't interconnect.

    Algorithm = the "forward" / compact-forward orientation scheme
    (Schank & Wagner 2005; Latapy 2008): order hosts by (degree, name),
    orient every undirected edge from the ≺-smaller endpoint to the
    larger, then each triangle a≺b≺c is found EXACTLY once as the
    out-wedge (a→b, a→c) closed by the oriented edge b→c.  The
    orientation bounds every host's out-degree by O(√m) on any graph,
    so the wedge self-join — the step that explodes on hubs if done on
    the raw graph — emits Σ out_deg² = O(m^1.5) candidates worst case
    instead of Σ deg² (a 10^6-degree hub contributes ZERO wedges if
    its neighbors all have lower degree, because its edges point IN).

    Distribution: one hash exchange to dedup undirected pairs, one to
    count degrees, two partitioned joins to attach endpoint degrees,
    one group-apply keyed on the wedge source for the self-join, and
    one partitioned join keyed on the (x,y) closing pair — nothing is
    broadcast and no stage holds more than one partition's candidates.
    """
    from ..ops import tagged_union_join

    if und is None:
        if edges is None:
            edges = edges_dataset(sf_dir, multiplier)
        und = undirected_host_pairs(edges)
    if deg is None:
        deg = undirected_degrees(und)

    # attach both endpoint degrees (two partitioned joins), then orient
    und_schema = pa.schema([("a", pa.string()), ("b", pa.string())])
    deg_schema = pa.schema([("host", pa.string()), ("deg", pa.int64())])
    with_da = tagged_union_join(
        und, deg, "a", "host", left_schema=und_schema, right_schema=deg_schema
    ).map_batches(
        lambda t: pl.from_arrow(t).select("a", "b", pl.col("deg").alias("deg_a")).to_arrow(),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    da_schema = pa.schema([("a", pa.string()), ("b", pa.string()), ("deg_a", pa.int64())])
    oriented = tagged_union_join(
        with_da, deg, "b", "host", left_schema=da_schema, right_schema=deg_schema
    ).map_batches(
        lambda t: pl.from_arrow(t)
        .select("a", "b", "deg_a", pl.col("deg").alias("deg_b"))
        .with_columns(
            fwd=(pl.col("deg_a") < pl.col("deg_b"))
            | ((pl.col("deg_a") == pl.col("deg_b")) & (pl.col("a") < pl.col("b")))
        )
        .select(
            pl.when(pl.col("fwd")).then(pl.col("a")).otherwise(pl.col("b")).alias("src"),
            pl.when(pl.col("fwd")).then(pl.col("b")).otherwise(pl.col("a")).alias("dst"),
            pl.when(pl.col("fwd")).then(pl.col("deg_b")).otherwise(pl.col("deg_a")).alias("dst_deg"),
        )
        .to_arrow(),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    # out-wedges: all ≺-ordered pairs of out-neighbors of each src
    def wedges(df: pl.DataFrame) -> pl.DataFrame:
        j = df.join(df, on="src", suffix="_r")
        return j.filter(
            (pl.col("dst_deg") < pl.col("dst_deg_r"))
            | ((pl.col("dst_deg") == pl.col("dst_deg_r")) & (pl.col("dst") < pl.col("dst_r")))
        ).select(
            pl.col("src").alias("u"),
            pl.col("dst").alias("x"),
            pl.col("dst_r").alias("y"),
            (pl.col("dst") + "\x00" + pl.col("dst_r")).alias("xy"),
        )

    cand = hash_group_apply(oriented, ["src"], wedges)

    closing = oriented.map_batches(
        lambda t: pl.from_arrow(t)
        .select((pl.col("src") + "\x00" + pl.col("dst")).alias("xy"))
        .to_arrow(),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    cand_schema = pa.schema(
        [("u", pa.string()), ("x", pa.string()), ("y", pa.string()), ("xy", pa.string())]
    )
    tri = tagged_union_join(
        cand, closing, "xy", "xy",
        left_schema=cand_schema,
        right_schema=pa.schema([("xy", pa.string())]),
    )

    def tri_corners(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return pl.concat(
            [
                df.select(pl.col("u").alias("host")),
                df.select(pl.col("x").alias("host")),
                df.select(pl.col("y").alias("host")),
            ]
        ).to_arrow()

    return hash_aggregate(
        tri.map_batches(tri_corners, batch_format="pyarrow", zero_copy_batch=True),
        ["host"],
        combine=[pl.len().cast(pl.Int64).alias("triangles")],
        merge=[pl.col("triangles").sum()],
    )


def host_reciprocal_links(
    sf_dir: str,
    multiplier: int = 1,
    edges: rd.Dataset | None = None,
) -> rd.Dataset:
    """Per-host reciprocal-linking stats →
    ``(host, partners, reciprocal_partners)``.

    "Excessive link exchanges" is a named link-scheme signal (Google
    spam policies; the reference's backlink analysis scores link_type
    quality per edge, services/domain_analyzer_service.py) — a host
    whose partner hosts mostly link BACK is trading links rather than
    earning them.  ``partners`` counts distinct hosts linked in either
    direction; ``reciprocal_partners`` counts those where both
    directions exist.

    Shape: per-block distinct directed pairs (combiner), ONE hash
    exchange keyed the unordered pair to count directions (1 or 2),
    then the corner hash-aggregate — identical exchange family to
    ``host_graph``; nothing is broadcast and no stage sees more than
    O(distinct pairs) rows.
    """
    if edges is None:
        edges = edges_dataset(sf_dir, multiplier)

    def to_directed(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).select(["source_host", "target_host"])
        return (
            df.filter(pl.col("source_host") != pl.col("target_host"))
            .unique()
            .select(
                pl.min_horizontal("source_host", "target_host").alias("a"),
                pl.max_horizontal("source_host", "target_host").alias("b"),
                (pl.col("source_host") <= pl.col("target_host"))
                .cast(pl.Int64)
                .alias("fwd"),
                (pl.col("source_host") > pl.col("target_host"))
                .cast(pl.Int64)
                .alias("rev"),
            )
            .to_arrow()
        )

    dirs = hash_aggregate(
        edges.map_batches(to_directed, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"],
        combine=[pl.col("fwd").max(), pl.col("rev").max()],
        merge=[pl.col("fwd").max(), pl.col("rev").max()],
    )

    def corners(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).with_columns(
            recip=((pl.col("fwd") + pl.col("rev")) == 2).cast(pl.Int64)
        )
        return pl.concat(
            [
                df.select(pl.col("a").alias("host"), "recip"),
                df.select(pl.col("b").alias("host"), "recip"),
            ]
        ).to_arrow()

    return hash_aggregate(
        dirs.map_batches(corners, batch_format="pyarrow", zero_copy_batch=True),
        ["host"],
        combine=[
            pl.len().cast(pl.Int64).alias("partners"),
            pl.col("recip").sum().alias("reciprocal_partners"),
        ],
        merge=[pl.col("partners").sum(), pl.col("reciprocal_partners").sum()],
    )


def related_hosts_cocitation(
    sf_dir: str,
    multiplier: int = 1,
    edges: rd.Dataset | None = None,
    k: int = 50,
    max_targets: int | None = None,
) -> rd.Dataset:
    """Top-``k`` co-cited host pairs → ``(x, y, cocitations)``.

    Co-citation — two hosts repeatedly linked by the SAME sources —
    is the standard "related domains" relatedness signal (Small 1973
    for citation graphs; SEO tools surface it as competitor/related
    sites, the reference approximates it with pairwise link_intersect
    J2 for two NAMED hosts).  This computes it for ALL pairs at once:
    distinct (source, target) edges keyed source, per-source ordered
    target pairs, then one count aggregate and a distributed top-k.

    ``max_targets``: a source linking to H distinct hosts emits
    O(H²) pairs — the same hub blow-up as ``word_jaccard_pairs``'s
    hub tokens.  Default None = exact (matches the SQL oracle); at
    100 TB set it (e.g. 100) to keep only each source's first
    ``max_targets`` targets (by name, deterministic), the standard
    directory-page mitigation — a source linking to thousands of
    hosts is a directory/boilerplate page carrying no relatedness
    evidence anyway.  The same loud scale warning fires on big
    corpora when unset.
    """
    if max_targets is None:
        import warnings

        n_docs = ops.parquet_num_rows(os.path.join(sf_dir, "documents.parquet")) if sf_dir else 0
        if n_docs > 100_000:
            warnings.warn(
                f"related_hosts_cocitation(max_targets=None) on {n_docs} docs "
                "is exact but emits O(out_deg^2) pairs per hub source; set "
                "max_targets (e.g. 100) at this scale.",
                UserWarning,
                stacklevel=2,
            )
    if edges is None:
        edges = edges_dataset(sf_dir, multiplier)

    def pre(df: pl.DataFrame) -> pl.DataFrame:
        return (
            df.select(["source_host", "target_host"])
            .filter(pl.col("source_host") != pl.col("target_host"))
            .unique()
        )

    def pairs(df: pl.DataFrame) -> pl.DataFrame:
        df = df.unique()
        if max_targets is not None:
            df = (
                df.sort(["source_host", "target_host"])
                .group_by("source_host", maintain_order=True)
                .head(max_targets)
            )
        j = df.join(df, on="source_host", suffix="_r")
        return j.filter(pl.col("target_host") < pl.col("target_host_r")).select(
            pl.col("target_host").alias("x"),
            pl.col("target_host_r").alias("y"),
        )

    cand = hash_group_apply(
        edges.select_columns(["source_host", "target_host"]),
        ["source_host"],
        pairs,
        pre=pre,
    )
    counts = hash_aggregate(
        cand,
        ["x", "y"],
        combine=[pl.len().cast(pl.Int64).alias("cocitations")],
        merge=[pl.col("cocitations").sum()],
    )
    return ops.block_topk(counts, ["cocitations", "x", "y"], [True, False, False], k)


def host_degree_assortativity(
    sf_dir: str,
    multiplier: int = 1,
    edges: rd.Dataset | None = None,
) -> rd.Dataset:
    """Degree assortativity of the undirected host graph (Newman 2002)
    → one row ``(n_edges, assortativity)``.

    r > 0: hosts link to similarly-connected hosts (mesh-like link
    networks); r < 0: hubs link to the fringe (the organic web is
    disassortative, Newman 2003 table II) — a corpus-level structure
    check for crawl frontiers and synthetic-graph validation.

    Exactness discipline: the three edge-endpoint-degree moments
    Σ(j+k), Σjk, Σ(j²+k²) are INTEGER sums accumulated per block and
    merged associatively (order-free), so only the final closed-form
    expression — written in the identical operation order as the
    DuckDB oracle — touches floats:
    ``a = S1/(2M); r = (S2/M − a·a) / (S3/(2M) − a·a)`` quantized to
    integer micro-units ``floor(r·1e6 + 0.5)`` (0 when the
    denominator is exactly 0: regular graphs).
    """
    from ..ops import tagged_union_join

    if edges is None:
        edges = edges_dataset(sf_dir, multiplier)
    und = undirected_host_pairs(edges)
    deg = undirected_degrees(und)

    und_schema = pa.schema([("a", pa.string()), ("b", pa.string())])
    deg_schema = pa.schema([("host", pa.string()), ("deg", pa.int64())])
    with_da = tagged_union_join(
        und, deg, "a", "host", left_schema=und_schema, right_schema=deg_schema
    ).map_batches(
        lambda t: pl.from_arrow(t).select("a", "b", pl.col("deg").alias("deg_a")).to_arrow(),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    da_schema = pa.schema([("a", pa.string()), ("b", pa.string()), ("deg_a", pa.int64())])
    both = tagged_union_join(
        with_da, deg, "b", "host", left_schema=da_schema, right_schema=deg_schema
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return df.select(
            pl.len().cast(pl.Int64).alias("m"),
            (pl.col("deg_a") + pl.col("deg")).sum().alias("s1"),
            (pl.col("deg_a") * pl.col("deg")).sum().alias("s2"),
            (pl.col("deg_a") * pl.col("deg_a") + pl.col("deg") * pl.col("deg"))
            .sum()
            .alias("s3"),
        ).to_arrow()

    def final(batch: pa.Table) -> pa.Table:
        import math

        df = pl.from_arrow(batch).select(
            pl.col("m").sum(), pl.col("s1").sum(), pl.col("s2").sum(), pl.col("s3").sum()
        )
        m, s1, s2, s3 = df.row(0)
        a = s1 / (2 * m)
        denom = s3 / (2 * m) - a * a
        micro = 0 if denom == 0.0 else math.floor((s2 / m - a * a) / denom * 1_000_000 + 0.5)
        return pa.table(
            {"n_edges": [int(m)], "assortativity_micro": [int(micro)]}
        )

    return (
        both.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", zero_copy_batch=True)
    )


def host_clustering(
    sf_dir: str,
    multiplier: int = 1,
    edges: rd.Dataset | None = None,
) -> rd.Dataset:
    """Local clustering coefficient per host →
    ``(host, deg, triangles, clustering)``.

    clustering(v) = 2·T(v) / (deg(v)·(deg(v)−1)) — the fraction of a
    host's neighbor pairs that interlink.  Near 1 with non-trivial
    degree = a densely interlinked network (link farm / PBN
    signature); near 0 = an organically earned hub.  Composes
    ``host_triangle_counts`` and ``undirected_degrees`` over ONE
    shared pair table, then a single left partitioned join (hosts in
    no triangle get 0); the division is done in one fixed expression
    order and rounded to 6 decimals so the DuckDB oracle reproduces
    it bit-identically (libm is shared).
    """
    from ..ops import tagged_union_join

    if edges is None:
        edges = edges_dataset(sf_dir, multiplier)
    und = undirected_host_pairs(edges)
    deg = undirected_degrees(und)
    tri = host_triangle_counts(sf_dir, multiplier, und=und, deg=deg)

    deg_schema = pa.schema([("host", pa.string()), ("deg", pa.int64())])
    tri_schema = pa.schema([("host", pa.string()), ("triangles", pa.int64())])
    joined = tagged_union_join(
        deg, tri, "host", "host",
        how="left", left_schema=deg_schema, right_schema=tri_schema,
    )

    def coeff(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).with_columns(pl.col("triangles").fill_null(0))
        return df.select(
            "host",
            "deg",
            "triangles",
            pl.when(pl.col("deg") >= 2)
            .then(
                (2.0 * pl.col("triangles") / (pl.col("deg") * (pl.col("deg") - 1)))
                .round(6)
            )
            .otherwise(0.0)
            .alias("clustering"),
        ).to_arrow()

    return joined.map_batches(coeff, batch_format="pyarrow", zero_copy_batch=True)


def host_kcore(
    sf_dir: str,
    multiplier: int = 1,
    edges: rd.Dataset | None = None,
    max_iters: int = 60,
) -> rd.Dataset:
    """Core number (coreness) per host → ``(host, coreness)``.

    The k-core is the standard "dense sub-network" detector: a host
    with coreness k sits in a subgraph where EVERY member keeps ≥ k
    neighbors — the link-farm / PBN (private blog network) signature
    the reference's domain analysis flags heuristically via inbound
    thresholds (services/domain_analyzer_service.py's value tiers);
    triangles (above) score local density, coreness scores the global
    nesting depth.

    Algorithm: iterated neighborhood H-index (Lü, Zhou, Zhang & Stanley
    2016, "The H-index of a network node and its relation to degree
    and coreness"): start every host at its degree, then repeatedly
    set val(v) ← H(vals of v's neighbors) — the largest h such that
    ≥ h neighbors currently have val ≥ h.  The sequence is monotone
    non-increasing and its fixed point IS the coreness, reached in at
    most O(peel-path length) sweeps (web host graphs: small-diameter,
    a handful).  Raises loudly on non-convergence like the other
    iterative operators rather than returning a wrong fixed point.

    Per iteration: ONE partitioned join (both-direction pair table ×
    current labels, keyed src), ONE hash group-apply keyed host for
    the vectorized H-index (rank-over + filter + max), and ONE join +
    sum for the distributed convergence check.  Nothing is broadcast;
    the label table is O(hosts), the exchanged rows O(pairs).
    """
    from ..ops import tagged_union_join

    if edges is None:
        edges = edges_dataset(sf_dir, multiplier)

    und = undirected_host_pairs(edges)

    # both directions once: (src, dst) for each undirected pair
    def to_dir(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return pl.concat(
            [
                df.select(pl.col("a").alias("src"), pl.col("b").alias("dst")),
                df.select(pl.col("b").alias("src"), pl.col("a").alias("dst")),
            ]
        ).to_arrow()

    dir_pairs = und.map_batches(
        to_dir, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    labels = undirected_degrees(und).map_batches(
        lambda t: pl.from_arrow(t).select("host", pl.col("deg").alias("val")).to_arrow(),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    dir_schema = pa.schema([("src", pa.string()), ("dst", pa.string())])
    lab_schema = pa.schema([("host", pa.string()), ("val", pa.int64())])

    def hindex(df: pl.DataFrame) -> pl.DataFrame:
        return (
            df.with_columns(
                rank=pl.col("nbr_val").rank("ordinal", descending=True).over("host")
            )
            .filter(pl.col("nbr_val") >= pl.col("rank"))
            .group_by("host")
            .agg(pl.col("rank").max().cast(pl.Int64).alias("val"))
        )

    for _ in range(max_iters):
        nbr_vals = tagged_union_join(
            dir_pairs, labels, "src", "host",
            left_schema=dir_schema, right_schema=lab_schema,
        ).map_batches(
            lambda t: pl.from_arrow(t)
            .select(pl.col("dst").alias("host"), pl.col("val").alias("nbr_val"))
            .to_arrow(),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        new_labels = ops.materialize_cut(hash_group_apply(nbr_vals, ["host"], hindex))

        changed = tagged_union_join(
            labels,
            new_labels.map_batches(
                lambda t: pl.from_arrow(t).rename({"val": "new_val"}).to_arrow(),
                batch_format="pyarrow", zero_copy_batch=True,
            ),
            "host", "host",
            left_schema=lab_schema,
            right_schema=pa.schema([("host", pa.string()), ("new_val", pa.int64())]),
        ).map_batches(
            lambda t: pl.from_arrow(t)
            .select((pl.col("val") != pl.col("new_val")).cast(pl.Int64).alias("changed"))
            .to_arrow(),
            batch_format="pyarrow", zero_copy_batch=True,
        ).sum("changed")
        labels = new_labels
        if not changed:
            return labels.map_batches(
                lambda t: pl.from_arrow(t)
                .select("host", pl.col("val").alias("coreness"))
                .to_arrow(),
                batch_format="pyarrow", zero_copy_batch=True,
            )
    raise RuntimeError(
        f"host_kcore did not converge in {max_iters} H-index sweeps — "
        "raise max_iters (sweeps scale with the graph's peel depth)"
    )


# --- A4: referring-domain cardinality ------------------------------------

def referring_domains_exact(sf_dir: str, multiplier: int = 1, edges: rd.Dataset | None = None) -> rd.Dataset:
    """Exact distinct source hosts per target host (test-scale ground
    truth).  One exchange keyed target_host: per-batch distinct pairs,
    partition-side distinct + count."""
    if edges is None:
        edges = edges_dataset(sf_dir, multiplier)

    def pre(df: pl.DataFrame) -> pl.DataFrame:
        return df.select(["target_host", "source_host"]).unique()

    def count_distinct(df: pl.DataFrame) -> pl.DataFrame:
        return (
            df.unique()
            .group_by("target_host")
            .agg(pl.len().cast(pl.Int64).alias("referring_domains"))
        )

    return hash_group_apply(
        edges.select_columns(["target_host", "source_host"]),
        ["target_host"],
        count_distinct,
        pre=pre,
    )


def _hll_sparse_partial(p: int):
    """Factory: the sparse-HLL per-block partial used by
    referring_domains_hll and link_overlap_hll — one (target_host,
    packed (bucket<<6|rank) uint32 blob) row per (host, block)."""

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        df = pl.from_arrow(batch)
        # one vectorized register update across ALL groups in the batch:
        # flat register index = group_index * 2^p + bucket
        gid = df.get_column("target_host").cast(pl.Categorical).to_physical().to_numpy()
        n_groups = int(gid.max()) + 1 if len(gid) else 0
        if n_groups == 0:
            return pa.table(
                {"target_host": pa.array([], pa.string()), "sketch": pa.array([], pa.binary())}
            )
        h = token_hashes(df.get_column("source_host").to_list())
        m = 1 << p
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)).astype(np.uint64)
        rank = np.full(h.shape, 64 - p + 1, dtype=np.int64)
        nz = rest != 0
        if nz.any():
            bl = np.zeros(int(nz.sum()), dtype=np.int64)
            r = rest[nz]
            for shift in (32, 16, 8, 4, 2, 1):
                ge = r >= (np.uint64(1) << np.uint64(shift))
                bl += np.where(ge, shift, 0)
                r = np.where(ge, r >> np.uint64(shift), r)
            rank[nz] = np.minimum(64 - (bl + 1) + 1, 64 - p + 1)
        # SPARSE sketch rows: pack (bucket, rank) as uint32 (idx<<6|rank),
        # dedup per (group, bucket) keeping max rank — a partial for a
        # small group costs O(distinct) bytes, not 2^p (dense 4 KiB
        # blobs per (host, block) were 95% of this stage's cost)
        packed = (gid.astype(np.uint64) << np.uint64(32)) | (
            (idx.astype(np.uint64) << np.uint64(6)) | rank.astype(np.uint64)
        )
        packed = np.sort(packed)
        # keep max rank per (group, bucket): after sort, the LAST entry
        # of each (group,bucket) run has the max rank (rank is low bits)
        key = packed >> np.uint64(6)
        last = np.ones(len(packed), dtype=bool)
        last[:-1] = key[:-1] != key[1:]
        packed = packed[last]
        grp = (packed >> np.uint64(32)).astype(np.int64)
        entries = (packed & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        # group id → host name (categorical physical codes are in first-
        # appearance order; recover via unique(maintain_order=True))
        hosts_in_order = (
            df.select(pl.col("target_host")).unique(maintain_order=True).get_column("target_host")
        ).to_list()
        bounds = np.searchsorted(grp, np.arange(n_groups + 1))
        blobs = [entries[bounds[g] : bounds[g + 1]].tobytes() for g in range(n_groups)]
        return pa.table(
            {
                "target_host": pa.array(hosts_in_order, pa.string()),
                "sketch": pa.array(blobs, pa.binary()),
            }
        )

    return partial


def referring_domains_hll(sf_dir: str, multiplier: int = 1, p: int = 12, edges: rd.Dataset | None = None) -> rd.Dataset:
    """HLL sketch per target host — the 10^10-scale path (BASELINE A4).

    One (target_host, 2^p-byte register blob) row per (host, block)
    leaves the map stage; the exchange moves sketches, not host lists.
    """

    partial = _hll_sparse_partial(p)

    def merge(df: pl.DataFrame) -> pl.DataFrame:
        import numpy as np

        m = 1 << p
        # one vectorized register-merge + estimate across ALL hosts in
        # the partition: flat register index = host_gid * m + bucket
        # (matches HyperLogLog.estimate()'s math row-wise)
        hosts = df.get_column("target_host")
        gid = hosts.cast(pl.Categorical).to_physical().to_numpy()
        hosts_in_order = (
            df.select(pl.col("target_host")).unique(maintain_order=True)
            .get_column("target_host").to_list()
        )
        n_hosts = len(hosts_in_order)
        if n_hosts == 0:
            return pl.DataFrame(
                schema={"target_host": pl.Utf8, "referring_domains_est": pl.Float64}
            )
        blobs = df.get_column("sketch").to_list()
        lens = np.fromiter((len(b) // 4 for b in blobs), dtype=np.int64, count=len(blobs))
        entries = np.frombuffer(b"".join(blobs), dtype=np.uint32)
        entry_gid = np.repeat(gid, lens)
        dense = np.zeros(n_hosts * m, dtype=np.uint8)
        np.maximum.at(
            dense,
            entry_gid * m + (entries >> 6),
            (entries & 63).astype(np.uint8),
        )
        reg = dense.reshape(n_hosts, m)
        mf = float(m)
        alpha = 0.7213 / (1 + 1.079 / mf)
        est = alpha * mf * mf / np.sum(2.0 ** (-reg.astype(np.float64)), axis=1)
        zeros = np.count_nonzero(reg == 0, axis=1)
        small = (est <= 2.5 * mf) & (zeros > 0)
        if small.any():
            est[small] = mf * np.log(mf / zeros[small])
        return pl.DataFrame(
            {"target_host": hosts_in_order, "referring_domains_est": est}
        )

    if edges is None:
        edges = edges_dataset(sf_dir, multiplier)
    partials = (
        edges.select_columns(["target_host", "source_host"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    return hash_group_apply(partials, ["target_host"], merge)


# --- J2: link intersect ---------------------------------------------------

def link_intersect(sf_dir: str, host_a: str, host_b: str, multiplier: int = 1) -> rd.Dataset:
    """Source hosts linking to BOTH targets (backlink_service.py:627-653).

    Semi-join shape: broadcast two-host predicate inside map_batches
    (no shuffle), distinct pairs, then per-source target count == 2.
    """

    def pick(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return (
            df.filter(pl.col("target_host").is_in([host_a, host_b]))
            .select(["source_host", "target_host"])
            .unique()
            .to_arrow()
        )

    def intersect(df: pl.DataFrame) -> pl.DataFrame:
        return (
            df.unique()
            .group_by("source_host")
            .agg(pl.len().alias("n_targets"))
            .filter(pl.col("n_targets") == 2)
            .select("source_host")
        )

    picked = (
        edges_dataset(sf_dir, multiplier)
        .select_columns(["source_host", "target_host"])
        .map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
    )
    return hash_group_apply(picked, ["source_host"], intersect)


# --- A6: link velocity ----------------------------------------------------

def link_velocity(sf_dir: str, multiplier: int = 1) -> rd.Dataset:
    """New backlinks per (target_host, day) (api/analytics.py:40-66)."""

    def add_day(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return df.select(
            pl.col("target_host"), pl.col("crawl_ts").dt.truncate("1d").alias("day")
        ).to_arrow()

    daily = (
        edges_dataset(sf_dir, multiplier)
        .select_columns(["target_host", "crawl_ts"])
        .map_batches(add_day, batch_format="pyarrow", zero_copy_batch=True)
    )
    return hash_aggregate(
        daily,
        ["target_host", "day"],
        combine=[pl.len().cast(pl.Int64).alias("n_new_links")],
        merge=[pl.col("n_new_links").sum()],
    )


def _hll_estimate_rows(arr, m: int):
    """Row-wise HyperLogLog estimate over an (n, m) uint8 register
    matrix — HyperLogLog.estimate() vectorized across hosts, same
    small-range linear-counting correction."""
    import numpy as np

    inv = np.power(2.0, -arr.astype(np.float64)).sum(axis=1)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / inv
    zeros = (arr == 0).sum(axis=1)
    lc = np.where(zeros > 0, m * np.log(m / np.maximum(zeros, 1)), e)
    return np.where(e <= 2.5 * m, lc, e)


def host_harmonic_centrality(
    sf_dir: str,
    multiplier: int = 1,
    edges: rd.Dataset | None = None,
    mode: str = "bitset",
    p: int = 10,
    max_iters: int = 64,
    round_totals: list | None = None,
) -> rd.Dataset:
    """Harmonic centrality of every host — HyperBall (Boldi & Vigna
    2013), THE neighborhood-function algorithm for web-scale graphs:
    ``H(v) = Σ_{u≠v} 1/d(u→v)`` computed from the growing in-ball
    ``ball_r(v) = ball_{r-1}(v) ∪ ⋃_{(u,v)∈E} ball_{r-1}(u)`` as
    ``H(v) += (|ball_r| − |ball_{r-1}|)/r`` per round; the same
    increments also yield the distance sum (``+ r·Δ``), hence Bavelas
    closeness, for free.

    Two interchangeable counter families behind one iteration:

    - ``mode="bitset"`` — EXACT: each host carries an n-bit bitmap
      (one bit per host, id map broadcast once).  O(n²) bits total, so
      this is the verification mode — the pytest oracle is per-node
      BFS.  Ball union is a vectorized ``np.bitwise_or.reduceat``.
    - ``mode="hll"`` — the 10^10-host scale path: 2^p one-byte
      registers per host (HyperBall proper; the repo's
      :class:`~..functions.sketches.HyperLogLog` discipline), union =
      ``np.maximum.reduceat``, size estimates via the same
      small-range-corrected formula.  No id map, no broadcast;
      state is O(n·2^p) bytes sharded across partitions.

    Per round: ONE partitioned join pushes each source's counter along
    its out-edges, one host-keyed exchange merges contributions with
    the previous state (counters only — host names and blobs, never
    edges re-shuffled), and the only driver-side value is the integer
    convergence delta (register/popcount mass is monotone, so delta==0
    is exact).  Rounds = graph diameter; loud failure past
    ``max_iters`` like the label-propagation family.
    """
    import numpy as np

    from ..ops import tagged_union_join

    if mode not in ("bitset", "hll"):
        raise ValueError(f"unknown mode {mode!r}")

    hg = host_graph(sf_dir, multiplier, edges=edges)
    pairs = hg.map_batches(
        lambda b: pl.from_arrow(b).select("source_host", "target_host").to_arrow(),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    def hosts_of(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return pl.concat(
            [
                df.select(pl.col("source_host").alias("host")),
                df.select(pl.col("target_host").alias("host")),
            ]
        ).unique().to_arrow()

    all_hosts = hash_group_apply(
        pairs.map_batches(hosts_of, batch_format="pyarrow", zero_copy_batch=True),
        ["host"],
        lambda df: df.unique(subset=["host"]),
    ).materialize()

    m = 1 << p
    if mode == "bitset":
        # exact/verification mode: O(n) id map on the driver by design
        host_list = sorted(r["host"] for r in all_hosts.take_all())
        hid = {h: i for i, h in enumerate(host_list)}
        width = (len(host_list) + 7) // 8
    else:
        hid = None
        width = m

    def init_stage(batch: pa.Table) -> pa.Table:
        hosts = batch.column("host").to_pylist()
        n = len(hosts)
        arr = np.zeros((n, width), dtype=np.uint8)
        if mode == "bitset":
            ids = np.array([hid[h] for h in hosts], dtype=np.int64)
            arr[np.arange(n), ids >> 3] = np.uint8(1) << (ids & 7).astype(np.uint8)
            cnt = np.ones(n, dtype=np.float64)
        else:
            h = token_hashes(hosts)
            idx = (h >> np.uint64(64 - p)).astype(np.int64)
            rest = (h << np.uint64(p)).astype(np.uint64)
            rank = np.full(n, 64 - p + 1, dtype=np.uint8)
            nz = rest != 0
            if nz.any():
                bl = np.zeros(int(nz.sum()), dtype=np.int64)
                r = rest[nz]
                for shift in (32, 16, 8, 4, 2, 1):
                    ge = r >= (np.uint64(1) << np.uint64(shift))
                    bl += np.where(ge, shift, 0)
                    r = np.where(ge, r >> np.uint64(shift), r)
                rank[nz] = np.minimum(64 - (bl + 1) + 1, 64 - p + 1)
            arr[np.arange(n), idx] = rank
            cnt = _hll_estimate_rows(arr, m)
        mass = arr.sum(axis=1, dtype=np.int64) if mode == "hll" else None
        if mode == "bitset":
            mass = np.unpackbits(arr, axis=1).sum(axis=1, dtype=np.int64)
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "blob": pa.array([row.tobytes() for row in arr], pa.binary()),
                "mass": pa.array(mass, pa.int64()),
                "cnt": pa.array(cnt, pa.float64()),
                "harmonic": pa.array(np.zeros(n), pa.float64()),
                "sum_dist": pa.array(np.zeros(n), pa.float64()),
            }
        )

    state = ops.materialize_cut(
        all_hosts.map_batches(init_stage, batch_format="pyarrow", zero_copy_batch=True)
    )

    pairs_schema = pa.schema([("source_host", pa.string()), ("target_host", pa.string())])
    state_schema = pa.schema(
        [
            ("host", pa.string()),
            ("blob", pa.binary()),
            ("mass", pa.int64()),
            ("cnt", pa.float64()),
            ("harmonic", pa.float64()),
            ("sum_dist", pa.float64()),
        ]
    )
    blob_schema = pa.schema([("host", pa.string()), ("blob", pa.binary())])

    union_ufunc = np.bitwise_or if mode == "bitset" else np.maximum

    for it in range(1, max_iters + 1):

        def merge_round(df: pl.DataFrame, r: int = it) -> pl.DataFrame:
            df = df.sort("host")
            hosts = df.get_column("host").to_numpy()
            starts = np.flatnonzero(
                np.concatenate(([True], hosts[1:] != hosts[:-1]))
            )
            arr = np.frombuffer(b"".join(df.get_column("blob").to_list()), dtype=np.uint8)
            arr = arr.reshape(len(df), width)
            merged = union_ufunc.reduceat(arr, starts, axis=0)
            # exactly one state row per host carries the scalars;
            # contribution rows are null → NaN under fmax
            old_cnt = np.fmax.reduceat(
                df.get_column("cnt").to_numpy().astype(np.float64), starts
            )
            old_mass = np.fmax.reduceat(
                df.get_column("mass").cast(pl.Float64).to_numpy(), starts
            ).astype(np.int64)
            old_harm = np.fmax.reduceat(
                df.get_column("harmonic").to_numpy().astype(np.float64), starts
            )
            old_sd = np.fmax.reduceat(
                df.get_column("sum_dist").to_numpy().astype(np.float64), starts
            )
            if mode == "bitset":
                new_mass = np.unpackbits(merged, axis=1).sum(axis=1, dtype=np.int64)
                new_cnt = new_mass.astype(np.float64)
            else:
                new_mass = merged.sum(axis=1, dtype=np.int64)
                new_cnt = _hll_estimate_rows(merged, m)
            new_harm = old_harm + (new_cnt - old_cnt) / float(r)
            new_sd = old_sd + (new_cnt - old_cnt) * float(r)
            return pl.DataFrame(
                {
                    "host": pl.Series(hosts[starts].tolist(), dtype=pl.String),
                    "blob": pl.Series([row.tobytes() for row in merged], dtype=pl.Binary),
                    "mass": pl.Series(new_mass, dtype=pl.Int64),
                    "cnt": pl.Series(new_cnt, dtype=pl.Float64),
                    "harmonic": pl.Series(new_harm, dtype=pl.Float64),
                    "sum_dist": pl.Series(new_sd, dtype=pl.Float64),
                    "delta": pl.Series(new_mass - old_mass, dtype=pl.Int64),
                }
            )

        own = state.map_batches(
            lambda b: pl.from_arrow(b)
            .select("host", "blob", "mass", "cnt", "harmonic", "sum_dist")
            .to_arrow(),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        contrib = tagged_union_join(
            pairs, own, "source_host", "host",
            left_schema=pairs_schema, right_schema=state_schema,
        ).map_batches(
            lambda b: pl.from_arrow(b)
            .select(
                pl.col("target_host").alias("host"),
                "blob",
                pl.lit(None, dtype=pl.Int64).alias("mass"),
                pl.lit(None, dtype=pl.Float64).alias("cnt"),
                pl.lit(None, dtype=pl.Float64).alias("harmonic"),
                pl.lit(None, dtype=pl.Float64).alias("sum_dist"),
            )
            .to_arrow(),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        state = ops.materialize_cut(
            hash_group_apply(own.union(contrib), ["host"], merge_round)
        )
        changed = state.sum("delta") or 0
        if round_totals is not None:
            # N(r) = sum_v |ball_r(v)| — the neighbourhood function,
            # one driver scalar per round (effective-diameter input)
            round_totals.append(float(state.sum("cnt")))
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"host_harmonic_centrality did not converge in {max_iters} rounds"
        )

    return state.map_batches(
        lambda b: pl.from_arrow(b)
        .select(
            "host",
            pl.col("cnt").alias("n_reachable"),
            "harmonic",
            # Bavelas closeness restricted to the in-ball (the standard
            # disconnected-graph convention): (reachable-1)/sum-of-dists
            pl.when(pl.col("sum_dist") > 0)
            .then((pl.col("cnt") - 1) / pl.col("sum_dist"))
            .otherwise(0.0)
            .alias("closeness"),
        )
        .to_arrow(),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def host_effective_diameter(
    sf_dir: str,
    multiplier: int = 1,
    edges: rd.Dataset | None = None,
    mode: str = "bitset",
    p: int = 10,
    max_iters: int = 64,
    q: float = 0.9,
) -> rd.Dataset:
    """Effective diameter of the host graph — HyperBall's original
    purpose (Boldi & Vigna 2013 measured exactly this on web crawls):
    the smallest distance ``d`` (linearly interpolated) such that at
    least ``q`` of all reachable ordered pairs are within distance
    ``d``.  Reuses :func:`host_harmonic_centrality`'s iteration; the
    neighbourhood function ``N(r) = Σ_v |ball_r(v)|`` costs one driver
    scalar per round, so this adds NOTHING to the exchange volume.
    """
    totals: list = []
    state = host_harmonic_centrality(
        sf_dir,
        multiplier,
        edges=edges,
        mode=mode,
        p=p,
        max_iters=max_iters,
        round_totals=totals,
    )
    n_hosts = state.count()  # N(0): every ball starts as {v}
    ns = [float(n_hosts)] + totals
    target = q * ns[-1]
    d_eff = 0.0
    for d in range(len(ns)):
        if ns[d] >= target:
            if d == 0 or ns[d] == ns[d - 1]:
                d_eff = float(d)
            else:
                d_eff = (d - 1) + (target - ns[d - 1]) / (ns[d] - ns[d - 1])
            break
    # converged round repeats N(diam) → true diameter is one less
    diameter = max(len(totals) - 1, 0)
    return rd.from_arrow(
        pa.table(
            {
                "n_hosts": pa.array([n_hosts], pa.int64()),
                "diameter": pa.array([diameter], pa.int64()),
                "effective_diameter": pa.array([d_eff], pa.float64()),
                "reachable_pairs": pa.array([ns[-1]], pa.float64()),
            }
        )
    )


def host_pagerank_personalized(
    sf_dir: str,
    seeds: tuple = ("h0.example.com",),
    multiplier: int = 1,
    damping: float = 0.85,
    iters: int = 20,
    edges: rd.Dataset | None = None,
) -> rd.Dataset:
    """Personalized PageRank: teleport restricted to a seed host set —
    the topic/spam-biased authority variant (a link-spam analyst seeds
    known-good hosts and reads off how much authority flows to a
    candidate; TrustRank's propagation shape).  Update per iteration:
    ``r = (1−d)·t + d·(push + dangling·t)`` with ``t`` uniform over
    ``seeds`` and zero elsewhere — identical exchange structure to
    :func:`host_pagerank` (one partitioned join + one hash aggregate +
    one left join per iteration; the dangling mass is the only
    driver-side scalar), only the teleport vector differs.
    """
    from ..ops import tagged_union_join

    hg = host_graph(sf_dir, multiplier, edges=edges).materialize()
    outw = hash_aggregate(
        hg,
        ["source_host"],
        combine=[pl.col("n_links").sum().alias("out_total")],
        merge=[pl.col("out_total").sum()],
    )
    hg_schema = pa.schema(
        [("source_host", pa.string()), ("target_host", pa.string()), ("n_links", pa.int64())]
    )
    outw_schema = pa.schema([("source_host", pa.string()), ("out_total", pa.int64())])
    weighted = tagged_union_join(
        hg, outw, "source_host", "source_host",
        left_schema=hg_schema, right_schema=outw_schema,
    ).map_batches(
        lambda b: pl.from_arrow(b)
        .select(
            "source_host",
            "target_host",
            (pl.col("n_links") / pl.col("out_total")).alias("w"),
        )
        .to_arrow(),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    def hosts_of(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return pl.concat(
            [
                df.select(pl.col("source_host").alias("host")),
                df.select(pl.col("target_host").alias("host")),
            ]
        ).unique().to_arrow()

    seed_list = list(seeds)
    t_seed = 1.0 / len(seed_list)
    all_hosts = hash_group_apply(
        hg.map_batches(hosts_of, batch_format="pyarrow", zero_copy_batch=True),
        ["host"],
        lambda df: df.unique(subset=["host"]).with_columns(
            pl.when(pl.col("host").is_in(seed_list))
            .then(t_seed)
            .otherwise(0.0)
            .alias("t")
        ),
    ).materialize()
    outw = outw.materialize()

    ranks = all_hosts.map_batches(
        lambda b: pl.from_arrow(b).select("host", pl.col("t").alias("rank")).to_arrow(),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    ranks_schema = pa.schema([("host", pa.string()), ("rank", pa.float64())])
    w_schema = pa.schema(
        [("source_host", pa.string()), ("target_host", pa.string()), ("w", pa.float64())]
    )
    hosts_t_schema = pa.schema([("host", pa.string()), ("t", pa.float64())])
    outw_schema2 = pa.schema([("source_host", pa.string()), ("out_total", pa.int64())])

    for _ in range(iters):
        dangling = (
            tagged_union_join(
                ranks, outw, "host", "source_host", how="left",
                left_schema=ranks_schema, right_schema=outw_schema2,
            )
            .map_batches(
                lambda b: pl.from_arrow(b)
                .filter(pl.col("out_total").is_null())
                .select("rank")
                .to_arrow(),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .sum("rank")
            or 0.0
        )
        contrib = tagged_union_join(
            weighted, ranks, "source_host", "host",
            left_schema=w_schema, right_schema=ranks_schema,
        ).map_batches(
            lambda b: pl.from_arrow(b)
            .select(
                pl.col("target_host").alias("host"),
                (pl.col("w") * pl.col("rank")).alias("push"),
            )
            .to_arrow(),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        sums = hash_aggregate(
            contrib,
            ["host"],
            combine=[pl.col("push").sum().alias("push")],
            merge=[pl.col("push").sum()],
        )
        sums_schema = pa.schema([("host", pa.string()), ("push", pa.float64())])
        ranks = tagged_union_join(
            all_hosts, sums, "host", "host", how="left",
            left_schema=hosts_t_schema, right_schema=sums_schema,
        ).map_batches(
            lambda b, dang=dangling: pl.from_arrow(b)
            .select(
                "host",
                (
                    (1.0 - damping) * pl.col("t")
                    + damping * (pl.col("push").fill_null(0.0) + dang * pl.col("t"))
                ).alias("rank"),
            )
            .to_arrow(),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        ranks = ops.materialize_cut(ranks)

    return ranks.map_batches(
        lambda b: pl.from_arrow(b)
        .select("host", pl.col("rank").round(8))
        .to_arrow(),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def host_communities(
    sf_dir: str,
    multiplier: int = 1,
    edges: rd.Dataset | None = None,
    rounds: int = 8,
) -> rd.Dataset:
    """Fixed-round synchronous label-propagation communities over the
    undirected host graph → (host, community).

    LPA (Raghavan et al. 2007) made fully deterministic: every host
    starts labelled with itself; each round every host SYNCHRONOUSLY
    adopts the neighbor label with the largest total edge weight,
    ties broken by lexicographically smallest label.  The round count
    is FIXED (synchronous LPA can 2-cycle on bipartite structure, so
    "run to convergence" is not well-defined) — after exactly
    ``rounds`` rounds the labelling is a pure function of the graph,
    which is what the sequential pytest oracle replays
    (tests/test_graph_iter.py).  Communities differ from
    :func:`host_components`: a component is connectivity-only, a
    community follows weight density (a weakly-attached bridge host
    joins the side that links to it more).

    Scale shape per round: ONE partitioned join (labels onto edge
    targets — ``tagged_union_join``, both sides stay partitioned) and
    ONE ``hash_aggregate`` of integer (host, label) weights followed
    by a per-host argmax inside the partition.  Labels materialize
    each round (O(hosts) rows), edges materialize once.
    """
    from ..ops import tagged_union_join

    hg = host_graph(sf_dir, multiplier, edges=edges)

    # undirected: symmetrize, summing directed weights
    def sym(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return pl.concat(
            [
                df.select(
                    pl.col("source_host").alias("u"),
                    pl.col("target_host").alias("v"),
                    pl.col("n_links").alias("w"),
                ),
                df.select(
                    pl.col("target_host").alias("u"),
                    pl.col("source_host").alias("v"),
                    pl.col("n_links").alias("w"),
                ),
            ]
        ).to_arrow()

    und = hash_aggregate(
        hg.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True),
        ["u", "v"],
        combine=[pl.col("w").sum()],
        merge=[pl.col("w").sum()],
    ).materialize()

    labels = hash_group_apply(
        und.map_batches(
            lambda b: pl.from_arrow(b).select(pl.col("u").alias("host")).to_arrow(),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        ["host"],
        lambda df: df.unique(),
    ).map_batches(
        lambda b: pl.from_arrow(b)
        .with_columns(pl.col("host").alias("community"))
        .to_arrow(),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    und_schema = pa.schema([("u", pa.string()), ("v", pa.string()), ("w", pa.int64())])
    lbl_schema = pa.schema([("host", pa.string()), ("community", pa.string())])

    for _ in range(rounds):
        # label of each edge's far end, delivered to the near end
        j = tagged_union_join(
            und, labels, "v", "host",
            left_schema=und_schema, right_schema=lbl_schema,
        ).map_batches(
            lambda b: pl.from_arrow(b).select("u", "community", "w").to_arrow(),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        freq = hash_aggregate(
            j, ["u", "community"], combine=[pl.col("w").sum()], merge=[pl.col("w").sum()]
        )

        def pick(df: pl.DataFrame) -> pl.DataFrame:
            return (
                df.sort(["u", "w", "community"], descending=[False, True, False])
                .group_by("u", maintain_order=True)
                .first()
                .select(pl.col("u").alias("host"), pl.col("community"))
            )

        labels = hash_group_apply(freq, ["u"], pick).materialize()

    return labels


def link_overlap_hll(
    sf_dir: str,
    host_a: str,
    host_b: str,
    p: int = 14,
    multiplier: int = 1,
    edges: rd.Dataset | None = None,
) -> pa.Table:
    """Audience-overlap estimate between two target hosts from merged
    HLL sketches — the 10^10-scale sibling of exact :func:`link_intersect`
    (backlink_service.py:627-653's competitive-intersect question).

    HLLs are closed under union (register-wise max), so
    ``|A∩B| ≈ est(A) + est(B) − est(A ∪ B)`` (inclusion–exclusion over
    three sketch estimates).  The exchange moves only sparse register
    blobs for the TWO filtered hosts: a pre-filter keeps just edges
    targeting A/B, the per-block sparse partial is ≤ 2 rows of
    O(distinct-in-block) bytes, and the driver fan-in is bounded by
    #blocks × 2 rows (the same bounded-fanin discipline as
    bloomjoin).  At p=14 the standard error per estimate is ~0.8%;
    the intersection estimate inherits the summed error, so it is a
    triage signal (which competitor pairs overlap enough to intersect
    exactly), not a replacement for the exact path.
    """
    import numpy as np

    if edges is None:
        edges = edges_dataset(sf_dir, multiplier)

    targets = {host_a, host_b}

    def keep(batch: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(batch)
            .filter(pl.col("target_host").is_in(list(targets)))
            .select("target_host", "source_host")
            .to_arrow()
        )

    partials = (
        edges.select_columns(["target_host", "source_host"])
        .map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(_hll_sparse_partial(p), batch_format="pyarrow", zero_copy_batch=True)
    )
    # bounded take_all: ≤ 2 sparse rows per block
    rows = partials.take_all()
    m = 1 << p
    dense = {host_a: np.zeros(m, dtype=np.uint8), host_b: np.zeros(m, dtype=np.uint8)}
    for r in rows:
        entries = np.frombuffer(r["sketch"], dtype=np.uint32)
        reg = dense[r["target_host"]]
        np.maximum.at(reg, entries >> 6, (entries & 63).astype(np.uint8))

    def est(reg: np.ndarray) -> float:
        # single source of truth for the estimator math
        return HyperLogLog(p, registers=reg).estimate()

    ea, eb = est(dense[host_a]), est(dense[host_b])
    eu = est(np.maximum(dense[host_a], dense[host_b]))
    return pa.table(
        {
            "host_a": pa.array([host_a]),
            "host_b": pa.array([host_b]),
            "referring_a_est": pa.array([round(ea, 6)], pa.float64()),
            "referring_b_est": pa.array([round(eb, 6)], pa.float64()),
            "union_est": pa.array([round(eu, 6)], pa.float64()),
            "intersection_est": pa.array([round(max(0.0, ea + eb - eu), 6)], pa.float64()),
            "precision_p": pa.array([p], pa.int64()),
        }
    )
