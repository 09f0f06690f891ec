"""The distributed crawl: URL frontier + fetch scheduler on Ray.

Semantics reproduced (see SURVEY.md §3.1 step 4 and §2.6 O1/O4):
- BFS frontier seeded from a seed list; a URL is crawled iff its
  first-discovery depth < max_depth (crawl_service.py:493-500) and
  robots.txt allows it (web_crawler politeness + robots_parser).
- Round-based logical politeness budget: per round each host yields at
  most ``max_per_host_per_round`` fetches (DomainBucket.max_concurrent,
  smart_crawler_queue.py:122) and honors Crawl-delay as a round gap
  (see state/politeness.py).
- Admission order per round — the reference's O1 discipline
  (smart_crawler_queue.py:149-169): per host take tasks in
  (priority, depth, url) order, then order the round's admitted set by
  (priority, depth, host, url).  The global crawl order is the
  concatenation of the rounds' admitted sequences; it is a pure
  function of (seeds, corpus, robots, budget) and therefore identical
  under any parallelism level.
- Dedup at discovery through the sharded seen-set actors (T1); the
  final URL-seen set = seeds ∪ all canonicalized discovered targets.
- Failed fetches (HTTP 5xx) are retried with priority demotion
  (O6, smart_crawler_queue.py:182-192): retries+1, priority demoted one
  level toward LOW, dropped to the dead-letter output after 3 retries.

Execution model: a persistent actor pool (corpus-replay fetch+parse
actors, hash-sharded so each holds 1/P of the corpus index) serves
every round — the idiomatic Ray shape for a continuous frontier
scheduler, where per-round Dataset pipelines would re-create actor
pools each round.  The full-corpus analytics in pipelines/graph.py and
pipelines/pages.py are pure ``ray.data`` Dataset pipelines.  Frontier
bookkeeping is vectorized polars/arrow on the driver; the frontier is
orders of magnitude smaller than the corpus (it holds only
not-yet-crawled URLs), and every operation on it (eligibility mask,
per-host top-k, sort, anti-join) is expressed as columnar kernels that
move verbatim into ``map_groups`` when a 10^10-URL frontier outgrows
one node — the checkpoint layout (hash-partitioned parquet) already
supports that.

Checkpoints: after each round, ``checkpoint_dir/round=K/`` holds
frontier.parquet, host_state.parquet, order.parquet, seen/shard-*.npy,
pages/ and edges/ parquet deltas, and manifest.json with counters +
per-partition lineage; the manifest is written last, atomically —
resume loads the newest complete round (SURVEY.md §4 checkpoint row).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from dataclasses import dataclass, field

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from .. import schemas
from ..functions import canonical as can
from ..functions.htmlx import extract_links, extract_text_batch
from ..sources import corpus as corpus_mod
from ..state.politeness import RobotsIndex, HostClock, DEFAULT_MAX_PER_HOST_PER_ROUND
from ..state.seen import SeenSet

__all__ = ["CrawlConfig", "run_crawl", "oracle_crawl", "CrawlResult"]


@dataclass
class CrawlConfig:
    max_depth: int = 3
    max_pages: int | None = None
    politeness: bool = True
    max_per_host_per_round: int = DEFAULT_MAX_PER_HOST_PER_ROUND
    num_seen_shards: int = 4
    num_fetchers: int = 4
    fetch_batch_size: int = 2048
    checkpoint_dir: str | None = None
    resume: bool = False
    stop_after_round: int | None = None  # test hook for kill/resume
    flaky_mod: int | None = None  # test hook: doc_id % mod == 0 fails once with 503
    max_retries: int = 3

    def config_hash(self) -> str:
        import hashlib

        payload = json.dumps(
            {
                k: v
                for k, v in self.__dict__.items()
                if k not in ("checkpoint_dir", "resume", "stop_after_round")
            },
            sort_keys=True,
        )
        return hashlib.md5(payload.encode()).hexdigest()[:12]


@dataclass
class CrawlResult:
    order: pa.Table  # seq, round, url, host, depth, priority, status
    edges: pa.Table
    pages_paths: list[str]
    counters: dict = field(default_factory=dict)

    def seen_urls(self) -> set[str]:
        return set(self.counters["seen_urls"])


@ray.remote(num_cpus=1)
class FetchParseActor:
    """Corpus-replay fetch + parse for one hash shard of the corpus.

    Real-web deployments replace the constructor body with an aiohttp
    session (crawlers/web_crawler.py:262-328) — the batch interface
    (frontier rows in → pages+edges out) is unchanged.
    """

    def __init__(self, corpus_files: list[str], shard: int, num_shards: int, flaky_mod=None):
        self.index: dict[str, tuple] = {}
        for f in corpus_files:
            t = pq.read_table(f, columns=["url", "warc_ts", "html", "lang"])
            h = can.url_hash64(t.column("url").to_pylist())
            mask = (h % np.uint64(num_shards)) == np.uint64(shard)
            t = t.filter(pa.array(mask))
            for u, ts, html, lang in zip(
                t.column("url").to_pylist(),
                t.column("warc_ts").to_pylist(),
                t.column("html").to_pylist(),
                t.column("lang").to_pylist(),
            ):
                self.index[u] = (ts, html, lang)
        self.flaky_mod = flaky_mod
        self._attempted: set[str] = set()

    def fetch_parse(self, batch: pa.Table) -> tuple[pa.Table, pa.Table]:
        """Frontier rows -> (pages table, edges table).

        pages: url, warc_ts, html, text, lang, status, depth
        edges: schemas.EDGES columns
        """
        urls = batch.column("url").to_pylist()
        depths = batch.column("depth").to_pylist()
        status, tss, htmls, langs = [], [], [], []
        for u in urls:
            hit = self.index.get(u)
            if hit is None:
                status.append(404)
                tss.append(None)
                htmls.append(None)
                langs.append(None)
                continue
            if self.flaky_mod is not None and u not in self._attempted:
                self._attempted.add(u)
                d_str = u.rsplit("/", 1)[-1]
                if d_str.isdigit() and int(d_str) % self.flaky_mod == 0:
                    status.append(503)
                    tss.append(None)
                    htmls.append(None)
                    langs.append(None)
                    continue
            status.append(200)
            tss.append(hit[0])
            htmls.append(hit[1])
            langs.append(hit[2])

        html_strs = ["" if h is None else bytes(h).decode("utf-8", errors="replace") for h in htmls]
        texts = extract_text_batch(html_strs)
        pages = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(texts, pa.large_string()),
                "lang": pa.array(langs, pa.string()),
                "status": pa.array(status, pa.int16()),
                "depth": pa.array(depths, pa.int16()),
            }
        )

        src, tgt, anchor, ltype, rels, ctx, ets = [], [], [], [], [], [], []
        for u, html, st, ts in zip(urls, html_strs, status, tss):
            if st != 200:
                continue
            for link in extract_links(u, html):
                src.append(u)
                tgt.append(link["target_url"])
                anchor.append(link["anchor_text"])
                ltype.append(link["link_type"])
                rels.append(link["rel_attributes"])
                ctx.append(link["context_text"])
                ets.append(ts)
        edges = pa.table(
            {
                "source_url": pa.array(src, pa.string()),
                "target_url": pa.array(tgt, pa.string()),
                "source_host": pa.array(can.host_of_batch(src), pa.string()),
                "target_host": pa.array(can.host_of_batch(tgt), pa.string()),
                "anchor_text": pa.array(anchor, pa.string()),
                "link_type": pa.array(ltype, pa.string()),
                "rel_attributes": pa.array(rels, pa.list_(pa.string())),
                "context_text": pa.array(ctx, pa.string()),
                "crawl_ts": pa.array(ets, pa.timestamp("us")),
            },
            schema=schemas.EDGES,
        )
        return pages, edges


def _frontier_table(rows: dict) -> pa.Table:
    return pa.table(
        {
            "url": pa.array(rows["url"], pa.string()),
            "url_hash": pa.array(rows["url_hash"], pa.uint64()),
            "host": pa.array(rows["host"], pa.string()),
            "priority": pa.array(rows["priority"], pa.int8()),
            "depth": pa.array(rows["depth"], pa.int16()),
            "retries": pa.array(rows["retries"], pa.int8()),
        },
        schema=schemas.FRONTIER,
    )


def _empty_frontier() -> pa.Table:
    return _frontier_table({k: [] for k in ("url", "url_hash", "host", "priority", "depth", "retries")})


def _admit(
    frontier: pa.Table,
    round_no: int,
    clock: HostClock,
    cfg: CrawlConfig,
    remaining_budget: int | None,
) -> tuple[pa.Table, pa.Table]:
    """Deterministic per-round admission (O1 + O4).  Returns (admitted, rest)."""
    if frontier.num_rows == 0:
        return frontier, frontier
    f = pl.from_arrow(frontier)
    if cfg.politeness:
        hosts = f.get_column("host").unique().to_list()
        eligible_hosts = {h for h in hosts if clock.eligible(h, round_no)}
        elig = f.filter(pl.col("host").is_in(eligible_hosts))
        rest0 = f.filter(~pl.col("host").is_in(eligible_hosts))
        elig = (
            elig.sort(["priority", "depth", "url"])
            .with_columns(pl.col("url").cum_count().over("host").alias("_rank"))
        )
        admitted = elig.filter(pl.col("_rank") <= cfg.max_per_host_per_round).drop("_rank")
        overflow = elig.filter(pl.col("_rank") > cfg.max_per_host_per_round).drop("_rank")
        rest = pl.concat([rest0, overflow])
    else:
        admitted, rest = f, f.clear()
    admitted = admitted.sort(["priority", "depth", "host", "url"])
    if remaining_budget is not None and admitted.height > remaining_budget:
        rest = pl.concat([rest, admitted.slice(remaining_budget)])
        admitted = admitted.slice(0, remaining_budget)
    return admitted.to_arrow().cast(schemas.FRONTIER), rest.to_arrow().cast(schemas.FRONTIER)


def _route_chunks(table: pa.Table, num_shards: int, batch_size: int):
    """Yield (shard_id, sub_table) chunks routed by url_hash % num_shards."""
    h = table.column("url_hash").to_numpy(zero_copy_only=False)
    shard_ids = (h % np.uint64(num_shards)).astype(np.int64)
    for s in range(num_shards):
        idx = np.nonzero(shard_ids == s)[0]
        for start in range(0, len(idx), batch_size):
            yield s, table.take(pa.array(idx[start : start + batch_size]))


class _Checkpointer:
    def __init__(self, root: str | None, cfg: CrawlConfig):
        self.root = root
        self.cfg = cfg

    def round_dir(self, r: int) -> str:
        return os.path.join(self.root, f"round={r:05d}")

    def latest_complete_round(self) -> int | None:
        if not self.root or not os.path.isdir(self.root):
            return None
        rounds = []
        for d in glob.glob(os.path.join(self.root, "round=*")):
            mf = os.path.join(d, "manifest.json")
            if os.path.exists(mf):
                with open(mf) as fh:
                    m = json.load(fh)
                if m.get("complete") and m.get("config_hash") == self.cfg.config_hash():
                    rounds.append(int(m["round"]))
        return max(rounds) if rounds else None

    def write_round(
        self,
        r: int,
        frontier: pa.Table,
        clock: HostClock,
        seen: SeenSet,
        order_delta: pa.Table,
        pages_delta: pa.Table,
        edges_delta: pa.Table,
        counters: dict,
    ) -> None:
        if not self.root:
            return
        d = self.round_dir(r)
        os.makedirs(d, exist_ok=True)
        lineage = {"round": r, "inputs": [], "outputs": []}
        pq.write_table(frontier, os.path.join(d, "frontier.parquet"))
        host_rows = clock.state_rows()
        pq.write_table(
            pa.table(
                {
                    "host": pa.array([x["host"] for x in host_rows], pa.string()),
                    "last_crawl_round": pa.array(
                        [x["last_crawl_round"] for x in host_rows], pa.int32()
                    ),
                }
            ),
            os.path.join(d, "host_state.parquet"),
        )
        pq.write_table(order_delta, os.path.join(d, "order.parquet"))
        if pages_delta.num_rows:
            os.makedirs(os.path.join(d, "pages"), exist_ok=True)
            p = os.path.join(d, "pages", "part-0.parquet")
            pq.write_table(pages_delta, p)
            lineage["outputs"].append({"table": "pages", "path": p, "rows": pages_delta.num_rows})
        if edges_delta.num_rows:
            os.makedirs(os.path.join(d, "edges"), exist_ok=True)
            p = os.path.join(d, "edges", "part-0.parquet")
            pq.write_table(edges_delta, p)
            lineage["outputs"].append({"table": "edges", "path": p, "rows": edges_delta.num_rows})
        seen.checkpoint(os.path.join(d, "seen"))
        manifest = {
            "round": r,
            "config_hash": self.cfg.config_hash(),
            "counters": counters,
            "lineage": lineage,
            "complete": True,
        }
        tmp = os.path.join(d, "manifest.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(d, "manifest.json"))


def run_crawl(sf_dir: str, cfg: CrawlConfig | None = None, multiplier: int = 1) -> CrawlResult:
    """Run the full crawl over the synthetic corpus of ``sf_dir``."""
    cfg = cfg or CrawlConfig()
    cdir = corpus_mod.corpus_dir(sf_dir, multiplier)
    n_docs = corpus_mod.corpus_n_docs(sf_dir, multiplier)
    corpus_files = sorted(glob.glob(os.path.join(cdir, "pages_*.parquet")))
    robots = RobotsIndex(corpus_mod.robots_map(n_docs))
    clock = HostClock(robots, cfg.max_per_host_per_round)
    seen = SeenSet(cfg.num_seen_shards)
    fetchers = [
        FetchParseActor.remote(corpus_files, s, cfg.num_fetchers, cfg.flaky_mod)
        for s in range(cfg.num_fetchers)
    ]
    ckpt = _Checkpointer(cfg.checkpoint_dir, cfg)

    counters = {
        "pages_fetched": 0,
        "fetch_misses": 0,
        "fetch_errors": 0,
        "robots_denied": 0,
        "discovered": 0,
        "dedup_hits": 0,
        "frontier_ops": 0,
        "rounds": 0,
        "dead_lettered": 0,
    }
    order_parts: list[pa.Table] = []
    edges_parts: list[pa.Table] = []
    pages_paths: list[str] = []
    seen_urls: list[str] = []
    seq = 0
    start_round = 0

    resumed = cfg.resume and ckpt.latest_complete_round() is not None
    if resumed:
        r0 = ckpt.latest_complete_round()
        d = ckpt.round_dir(r0)
        frontier = pq.read_table(os.path.join(d, "frontier.parquet"))
        hs = pq.read_table(os.path.join(d, "host_state.parquet"))
        clock.load_state(
            [
                {"host": h, "last_crawl_round": rr}
                for h, rr in zip(hs.column("host").to_pylist(), hs.column("last_crawl_round").to_pylist())
            ]
        )
        seen.restore(os.path.join(d, "seen"))
        with open(os.path.join(d, "manifest.json")) as fh:
            m = json.load(fh)
        counters.update(m["counters"])
        seen_urls = list(counters.pop("seen_urls", []))
        seq = counters.pop("next_seq", 0)
        start_round = r0 + 1
        for rr in range(r0 + 1):
            rd = ckpt.round_dir(rr)
            op = os.path.join(rd, "order.parquet")
            if os.path.exists(op):
                order_parts.append(pq.read_table(op))
            for p in sorted(glob.glob(os.path.join(rd, "edges", "*.parquet"))):
                edges_parts.append(pq.read_table(p))
            pages_paths.extend(sorted(glob.glob(os.path.join(rd, "pages", "*.parquet"))))
    else:
        if cfg.checkpoint_dir and os.path.isdir(cfg.checkpoint_dir):
            shutil.rmtree(cfg.checkpoint_dir)
        # seed the frontier
        seed_rows = corpus_mod.seed_rows(n_docs)
        seed_urls = can.canonicalize_batch([r["url"] for r in seed_rows])
        rows = {"url": [], "url_hash": [], "host": [], "priority": [], "depth": [], "retries": []}
        kept_urls, kept_prio = [], []
        for u, r in zip(seed_urls, seed_rows):
            if u is not None:
                kept_urls.append(u)
                kept_prio.append(r["priority"])
        if kept_urls:
            hashes = can.url_hash64(kept_urls)
            new_mask = seen.filter_new(hashes)
            for u, p, h, new in zip(kept_urls, kept_prio, hashes, new_mask):
                if not new:
                    counters["dedup_hits"] += 1
                    continue
                seen_urls.append(u)
                rows["url"].append(u)
                rows["url_hash"].append(int(h))
                rows["host"].append(can.host_of(u))
                rows["priority"].append(p)
                rows["depth"].append(0)
                rows["retries"].append(0)
        frontier = _frontier_table(rows)

    round_no = start_round
    while frontier.num_rows > 0:
        if cfg.max_pages is not None and counters["pages_fetched"] >= cfg.max_pages:
            break
        remaining = (
            None if cfg.max_pages is None else cfg.max_pages - counters["pages_fetched"]
        )
        admitted, frontier = _admit(frontier, round_no, clock, cfg, remaining)
        counters["frontier_ops"] += admitted.num_rows
        if admitted.num_rows == 0:
            # politeness stall: advance the logical clock one round
            round_no += 1
            if round_no - start_round > 10_000_000:
                raise RuntimeError("crawl failed to make progress")
            continue

        # robots gate (before fetch, consuming the admission slot — §3.1)
        hosts = admitted.column("host").to_pylist()
        urls = admitted.column("url").to_pylist()
        allowed = np.array(robots.allowed_batch(hosts, urls), dtype=bool)
        counters["robots_denied"] += int((~allowed).sum())
        admitted = admitted.filter(pa.array(allowed))
        fetched_hosts = set(admitted.column("host").to_pylist())

        # fetch + parse via the persistent actor pool
        futures = []
        for shard, chunk in _route_chunks(admitted, cfg.num_fetchers, cfg.fetch_batch_size):
            futures.append(fetchers[shard].fetch_parse.remote(chunk))
        results = ray.get(futures)
        pages_list = [p for p, _ in results]
        edges_list = [e for _, e in results if e.num_rows]

        pages_round = (
            pa.concat_tables(pages_list) if pages_list else None
        )
        retry_rows = {k: [] for k in ("url", "url_hash", "host", "priority", "depth", "retries")}
        if pages_round is not None and pages_round.num_rows:
            # deterministic page order within the round for the output
            pages_round = pages_round.sort_by([("url", "ascending")])
            st = pages_round.column("status").to_numpy()
            counters["pages_fetched"] += int((st != 503).sum())
            counters["fetch_misses"] += int((st == 404).sum())
            counters["fetch_errors"] += int((st == 503).sum())
            # O6: retry with demoted priority on server errors
            if (st == 503).any():
                fail = pages_round.filter(pa.array(st == 503))
                adm = pl.from_arrow(admitted)
                fl = adm.filter(pl.col("url").is_in(fail.column("url").to_pylist()))
                for row in fl.iter_rows(named=True):
                    if row["retries"] + 1 > cfg.max_retries:
                        counters["dead_lettered"] += 1
                        continue
                    retry_rows["url"].append(row["url"])
                    retry_rows["url_hash"].append(row["url_hash"])
                    retry_rows["host"].append(row["host"])
                    retry_rows["priority"].append(
                        min(schemas.PRIORITY_LOW, row["priority"] + 1)
                    )
                    retry_rows["depth"].append(row["depth"])
                    retry_rows["retries"].append(row["retries"] + 1)

        for h in fetched_hosts:
            clock.mark_crawled(h, round_no)

        # admission/order log
        n_adm = admitted.num_rows
        status_by_url = {}
        if pages_round is not None:
            status_by_url = dict(
                zip(pages_round.column("url").to_pylist(), pages_round.column("status").to_pylist())
            )
        order_delta = pa.table(
            {
                "seq": pa.array(range(seq, seq + n_adm), pa.int64()),
                "round": pa.array([round_no] * n_adm, pa.int32()),
                "url": admitted.column("url"),
                "host": admitted.column("host"),
                "depth": admitted.column("depth"),
                "priority": admitted.column("priority"),
                "status": pa.array(
                    [status_by_url.get(u, -1) for u in admitted.column("url").to_pylist()],
                    pa.int16(),
                ),
            }
        )
        seq += n_adm
        order_parts.append(order_delta)

        edges_round = (
            pa.concat_tables(edges_list)
            if edges_list
            else pa.Table.from_pylist([], schema=schemas.EDGES)
        )
        if edges_round.num_rows:
            edges_parts.append(edges_round)

        # frontier expansion: canonical targets -> min-depth per url -> seen filter
        new_frontier_parts = [frontier]
        if retry_rows["url"]:
            new_frontier_parts.append(_frontier_table(retry_rows))
        if edges_round.num_rows:
            tgt = pl.from_arrow(
                edges_round.select(["target_url", "target_host", "source_url"])
            )
            depth_by_url = dict(
                zip(admitted.column("url").to_pylist(), admitted.column("depth").to_pylist())
            )
            tgt = tgt.with_columns(
                (pl.col("source_url").replace_strict(depth_by_url, default=None) + 1).alias("depth")
            )
            cand = (
                tgt.group_by("target_url")
                .agg(
                    pl.col("target_host").first().alias("host"),
                    pl.col("depth").min().alias("depth"),
                )
                .sort("target_url")
            )
            counters["discovered"] += cand.height
            urls_c = cand.get_column("target_url").to_list()
            hashes_c = can.url_hash64(urls_c)
            new_mask = seen.filter_new(hashes_c)
            counters["dedup_hits"] += int((~new_mask).sum())
            counters["frontier_ops"] += len(urls_c)
            rows = {k: [] for k in ("url", "url_hash", "host", "priority", "depth", "retries")}
            for u, h, hsh, dep, new in zip(
                urls_c,
                cand.get_column("host").to_list(),
                hashes_c,
                cand.get_column("depth").to_list(),
                new_mask,
            ):
                if not new:
                    continue
                seen_urls.append(u)
                if dep >= cfg.max_depth:
                    continue  # seen but never crawled (depth cap, O4)
                rows["url"].append(u)
                rows["url_hash"].append(int(hsh))
                rows["host"].append(h)
                rows["priority"].append(schemas.PRIORITY_MEDIUM)
                rows["depth"].append(dep)
                rows["retries"].append(0)
            if rows["url"]:
                new_frontier_parts.append(_frontier_table(rows))

        frontier = pa.concat_tables([t for t in new_frontier_parts if t.num_rows > 0]) if any(
            t.num_rows for t in new_frontier_parts
        ) else _empty_frontier()

        counters["rounds"] += 1
        if cfg.checkpoint_dir:
            ck_counters = dict(counters)
            ck_counters["seen_urls"] = sorted(seen_urls)
            ck_counters["next_seq"] = seq
            ckpt.write_round(
                round_no,
                frontier,
                clock,
                seen,
                order_delta,
                pages_round if pages_round is not None else pa.table({"url": pa.array([], pa.string())}),
                edges_round,
                ck_counters,
            )
            if pages_round is not None and pages_round.num_rows:
                pages_paths.append(os.path.join(ckpt.round_dir(round_no), "pages", "part-0.parquet"))

        if cfg.stop_after_round is not None and round_no >= cfg.stop_after_round:
            break
        round_no += 1

    counters["seen_urls"] = sorted(seen_urls)
    order = (
        pa.concat_tables(order_parts)
        if order_parts
        else pa.table({"seq": pa.array([], pa.int64()), "url": pa.array([], pa.string())})
    )
    edges = (
        pa.concat_tables(edges_parts)
        if edges_parts
        else pa.Table.from_pylist([], schema=schemas.EDGES)
    )
    seen.shutdown()
    for f in fetchers:
        ray.kill(f)
    return CrawlResult(order=order, edges=edges, pages_paths=pages_paths, counters=counters)


# --- Pure-Python oracle (FIXTURES.md §8) ---------------------------------

def oracle_crawl(sf_dir: str, cfg: CrawlConfig | None = None, multiplier: int = 1) -> dict:
    """Sequential reference-semantics oracle: same spec, no Ray, no Arrow.

    Returns {"order": [(url, depth)...], "crawled": set, "seen": set}.
    """
    cfg = cfg or CrawlConfig()
    n_docs = corpus_mod.corpus_n_docs(sf_dir, multiplier)
    robots = RobotsIndex(corpus_mod.robots_map(n_docs))
    corpus_urls = {corpus_mod.url_of(d, n_docs): d for d in range(n_docs)}

    seen: set[str] = set()
    frontier: list[tuple] = []  # (priority, depth, host, url)
    order: list[tuple] = []
    crawled: set[str] = set()
    last_round: dict[str, int] = {}

    for row in corpus_mod.seed_rows(n_docs):
        u = can.canonicalize(row["url"])
        if u is None or u in seen:
            continue
        seen.add(u)
        frontier.append((row["priority"], 0, can.host_of(u), u))

    round_no = 0
    pages = 0
    while frontier:
        if cfg.max_pages is not None and pages >= cfg.max_pages:
            break
        if cfg.politeness:
            eligible = [
                t
                for t in frontier
                if last_round.get(t[2]) is None
                or round_no >= last_round[t[2]] + robots.crawl_delay_rounds(t[2])
            ]
        else:
            eligible = list(frontier)
        if not eligible:
            round_no += 1
            continue
        eligible.sort(key=lambda t: (t[0], t[1], t[3]))  # priority, depth, url
        admitted = []
        per_host: dict[str, int] = {}
        for t in eligible:
            if cfg.politeness and per_host.get(t[2], 0) >= cfg.max_per_host_per_round:
                continue
            per_host[t[2]] = per_host.get(t[2], 0) + 1
            admitted.append(t)
        admitted.sort(key=lambda t: (t[0], t[1], t[2], t[3]))  # priority, depth, host, url
        if cfg.max_pages is not None:
            admitted = admitted[: cfg.max_pages - pages]
        admitted_set = set(admitted)
        frontier = [t for t in frontier if t not in admitted_set]

        discovered: dict[str, tuple] = {}
        for prio, depth, host, url in admitted:
            if not robots.allowed(host, url):
                continue
            order.append((url, depth))
            crawled.add(url)
            pages += 1
            last_round[host] = round_no
            d = corpus_urls.get(url)
            if d is None:
                continue  # fetch miss
            for link in corpus_mod.expected_links(d, n_docs):
                tu = link["target_url"]
                cur = discovered.get(tu)
                if cur is None or depth + 1 < cur[0]:
                    discovered[tu] = (depth + 1, can.host_of(tu))
        for tu in sorted(discovered):
            dep, host = discovered[tu]
            if tu in seen:
                continue
            seen.add(tu)
            if dep >= cfg.max_depth:
                continue
            frontier.append((schemas.PRIORITY_MEDIUM, dep, host, tu))
        round_no += 1

    return {"order": order, "crawled": crawled, "seen": seen}
