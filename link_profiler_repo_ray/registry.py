"""Named pipeline registry — the Ray analogue of the reference's
string-keyed job-type dispatch (services/crawl_service.py:215-264,
12 job types).  One entry per implemented operator from SURVEY.md §2
(+ the training-data extensions); each callable takes an sf_dir and
returns a ray.data.Dataset or a pyarrow Table.  The CLI's ``query``
subcommand and ``__ray_entry__.queries()`` both dispatch through this
table.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def _crawl_bfs(sf_dir: str):
    from .pipelines.crawl import CrawlConfig, run_crawl

    cfg = CrawlConfig(politeness=False, num_seen_shards=2, num_fetchers=2)
    res = run_crawl(sf_dir, cfg)
    return res.order.select(["url", "depth"])


def _crawl_ordered(sf_dir: str):
    from .pipelines.crawl import CrawlConfig, run_crawl

    cfg = CrawlConfig(num_seen_shards=2, num_fetchers=2)
    res = run_crawl(sf_dir, cfg)
    return res.order


def queries() -> dict[str, Callable[[str], Any]]:
    from .pipelines import (
        audit,
        bloomjoin,
        bpe,
        classifier,
        curate,
        encode,
        graph,
        history,
        hygiene,
        monitor,
        prospects,
        relational,
        research,
        retrieval,
        social,
        textdata,
    )
    from .sources import cdx, serpkw, sitemap, tarshard, warc

    return {
        # CDX index sources (S4/S5)
        "cc_cdx_parse": cdx.cc_cdx_parse,
        "wayback_latest_snapshot": cdx.wayback_latest_snapshot,
        "wayback_domain_age": cdx.wayback_domain_age,
        "cdx_seed_frontier": cdx.cdx_seed_frontier,
        # sitemap sources
        "sitemap_parse": sitemap.sitemap_parse,
        "tar_shard_roundtrip": tarshard.tar_shard_roundtrip,
        "sitemap_seed_frontier": sitemap.sitemap_seed_frontier,
        # WARC sink + CDX index builder (S4 writer side; offsets/digests
        # are real file facts, so correctness is pytest-pinned by
        # seek-reads rather than a SQL oracle)
        "cdx_index_build": warc.cdx_index_build,
        # SERP analysis + keyword research job types
        "serp_rank_latest": serpkw.serp_rank_latest,
        "keyword_gap": serpkw.keyword_gap,
        "keyword_suggest_rollup": serpkw.keyword_suggest_rollup,
        # AI content scoring (T10) + technical audit job types
        "ai_content_scores": audit.ai_content_scores,
        "ai_calibration": audit.ai_calibration,
        "technical_audit": audit.technical_audit,
        "full_seo_audit": audit.full_seo_audit,
        # social-media / web3 / content-gap job types
        "social_engagement_rollup": social.social_engagement_rollup,
        "web3_content_index": social.web3_content_index,
        "content_gap_topics": social.content_gap_topics,
        # link-building prospects + outreach campaign rollups
        "link_prospects": prospects.link_prospects,
        "outreach_campaign_stats": prospects.outreach_campaign_stats,
        # alerting / security-audit / local-SEO service analogues
        "alert_rules_eval": monitor.alert_rules_eval,
        "security_audit_summary": monitor.security_audit_summary,
        "local_seo_nearby": monitor.local_seo_nearby,
        # research / auxiliary operators
        "seo_metrics": research.seo_metrics,
        "domain_value_scores": research.domain_value_scores,
        "crawl_tier_assignment": research.crawl_tier_assignment,
        "recrawl_schedule": research.recrawl_schedule,
        "expired_domain_finder": research.expired_domain_finder,
        "link_health_audit": research.link_health_audit,
        "customers_without_orders": research.customers_without_orders,
        "latest_event_per_user": research.latest_event_per_user,
        "anomalous_events": research.anomalous_events,
        "anomalous_events_windowed": research.anomalous_events_windowed,
        "props_json_rollup": research.props_json_rollup,
        "enriched_edges": research.enriched_edges,
        "edge_snapshot_merge": research.edge_snapshot_merge,
        "domain_intelligence": research.domain_intelligence,
        "domain_intelligence_sources": research.domain_intelligence_sources,
        "whois_domain_age": research.whois_domain_age,
        "dns_enrichment": research.dns_enrichment,
        "url_priority_scores": research.url_priority_scores,
        "top_valuable_domains": research.top_valuable_domains,
        # crawl core
        "text_extract": textdata.text_extract_roundtrip,
        "extract_links": lambda sf: graph.edges_dataset(sf).select_columns(
            ["source_url", "target_url", "anchor_text", "link_type"]
        ),
        "crawl_bfs": _crawl_bfs,
        "crawl_ordered": _crawl_ordered,
        # graph analytics
        "link_profiles": graph.link_profiles,
        "top_anchors_referrers": graph.top_anchors_referrers,
        "host_graph": graph.host_graph,
        "host_pagerank": graph.host_pagerank,
        "host_pagerank_personalized": graph.host_pagerank_personalized,
        "host_hits": graph.host_hits,
        "host_components": graph.host_components,
        "host_communities": graph.host_communities,
        "host_triangles": graph.host_triangles,
        "host_kcore": graph.host_kcore,
        "host_reciprocal_links": graph.host_reciprocal_links,
        "host_clustering": graph.host_clustering,
        "related_hosts_cocitation": graph.related_hosts_cocitation,
        "host_degree_assortativity": graph.host_degree_assortativity,
        "host_harmonic_centrality": graph.host_harmonic_centrality,
        "host_effective_diameter": graph.host_effective_diameter,
        "referring_domains_exact": graph.referring_domains_exact,
        "referring_domains_hll": graph.referring_domains_hll,
        "link_intersect": lambda sf: graph.link_intersect(sf, "h1.example.com", "h2.example.com"),
        "link_overlap_hll": lambda sf: graph.link_overlap_hll(sf, "h1.example.com", "h2.example.com"),
        "link_velocity": graph.link_velocity,
        # training-data ops
        "token_stats": textdata.token_stats,
        "token_stats_bpe": textdata.token_stats_bpe,
        # distributed BPE tokenizer training + application (iterative;
        # pytest-oracled vs the sequential learner, no SQL oracle)
        "bpe_train": bpe.bpe_train,
        "bpe_apply_counts": bpe.bpe_apply_counts,
        "bpe_sequence_packing": bpe.bpe_sequence_packing,
        # distributed trained quality classifier (FineWeb-Edu-style
        # label distillation; iterative, pytest-oracled vs the
        # sequential learner — same class as bpe_train/PageRank)
        "quality_classifier_train": classifier.quality_classifier_train,
        "quality_classifier_scores": classifier.quality_classifier_scores,
        "quality_classifier_eval": classifier.quality_classifier_eval,
        "doc_quality": textdata.doc_quality,
        "compression_ratio": textdata.compression_ratio,
        "token_entropy": textdata.token_entropy,
        "source_kl_divergence": textdata.source_kl_divergence,
        "line_dedup": textdata.line_dedup,
        "chunk_documents": textdata.chunk_documents,
        "badwords_filter": textdata.badwords_filter,
        "source_quality_rollup": textdata.source_quality_rollup,
        "token_zipf_fit": textdata.token_zipf_fit,
        "dup_cluster_stats": textdata.dup_cluster_stats,
        "source_lang_mix": textdata.source_lang_mix,
        "repetition_metrics": textdata.repetition_metrics,
        "unigram_logprob": textdata.unigram_logprob,
        "bigram_logprob": textdata.bigram_logprob,
        "ccnet_buckets": textdata.ccnet_buckets,
        "dsir_scores": textdata.dsir_scores,
        "dsir_select": textdata.dsir_select,
        "exact_substring_dups": textdata.exact_substring_dups,
        "ngram_novelty": textdata.ngram_novelty,
        "lang_id": textdata.lang_id_docs,
        "fingerprints": textdata.fingerprints,
        "dedup_exact": textdata.dedup_exact,
        "minhash_lsh_dups": textdata.minhash_lsh_dups,
        "near_dup_survivors": textdata.near_dup_survivors,
        "simhash_dups": textdata.simhash_dups,
        # PPJoin prefix-filtered exact Jaccard IS the default since round 5
        # (no hub-token O(df^2) blowup); the all-pairs variant stays for
        # equality tests
        "word_jaccard_pairs": textdata.word_jaccard_pairs_prefix,
        "embedding_topk": textdata.embedding_topk,
        "embedding_centroids": textdata.embedding_centroids,
        "kmeans_lloyd": textdata.kmeans_lloyd,
        "knn_ivf": textdata.knn_ivf,
        "knn_lsh": textdata.knn_lsh,
        "media_features": textdata.media_features,
        "media_features_png": textdata.media_features_png,
        "media_features_jpeg": textdata.media_features_jpeg,
        "video_frame_features": textdata.video_frame_features,
        "c4_filters": textdata.c4_filters,
        "tfidf_top_terms": textdata.tfidf_top_terms,
        "semdedup_survivors": textdata.semdedup_survivors,
        # the scale path (IVF cell blocking, no full-matrix broadcast)
        # IS the default; the exact broadcast variant stays for small
        # corpora / recall assertions (round-3 verdict item 7)
        "embedding_near_dups": textdata.embedding_near_dups_bucketed,
        "embedding_near_dups_exact": textdata.embedding_near_dups,
        "embedding_quantize": textdata.embedding_quantize,
        "embedding_random_projection": textdata.embedding_random_projection,
        # text -> embedding encoder (closes the chunk->encode->index loop)
        "embed_documents": encode.embed_documents,
        "vocab_top_tokens": textdata.vocab_top_tokens,
        "token_heavy_hitters": textdata.token_heavy_hitters,
        "inverted_index": textdata.inverted_index,
        "bm25_topk": retrieval.bm25_topk,
        # corpus-curation ops (round 3)
        "clean_text": textdata.clean_text,
        "pii_scrub": textdata.pii_scrub,
        "domain_balanced_sample": textdata.domain_balanced_sample,
        "quality_funnel": textdata.quality_funnel,
        "contamination_ngrams": textdata.contamination_ngrams,
        "sequence_packing": textdata.sequence_packing,
        "dataset_split": textdata.dataset_split,
        "weighted_sample_systematic": textdata.weighted_sample_systematic,
        "mixture_sample": textdata.mixture_sample,
        "curated_documents": curate.curated_documents,
        # historical snapshot analytics + redirect resolution
        "snapshot_diff": history.snapshot_diff,
        "redirect_chains": history.redirect_chains,
        "profiles_incremental": history.profiles_incremental,
        # web hygiene + partition diagnostics
        "host_spam_scores": hygiene.host_spam_scores,
        "url_filter_scores": hygiene.url_filter_scores,
        "shard_balance_report": hygiene.shard_balance_report,
        "robots_block_rates": hygiene.robots_block_rates,
        "range_partition_plan": hygiene.range_partition_plan,
        "anchor_fuzzy_pairs": hygiene.anchor_fuzzy_pairs,
        # bloom-pruned big⋈big semi-join + decontamination scale path
        "bloom_semijoin": bloomjoin.bloom_semijoin,
        "contamination_bloom": bloomjoin.contamination_bloom,
        # relational breadth
        "q1_lineitem": relational.q1_lineitem,
        "revenue_by_nation": relational.revenue_by_nation,
        "order_priority_revenue": relational.order_priority_revenue,
        "top_parts_per_brand": relational.top_parts_per_brand,
        "events_by_day": relational.events_by_day,
        "events_hopping_window": relational.events_hopping_window,
        "sessionize": relational.sessionize,
        "event_funnel": relational.event_funnel,
        "cohort_retention": relational.cohort_retention,
        "events_rolling_window": relational.events_rolling_window,
        "watermark_lateness": relational.watermark_lateness,
        "events_distinct_users": relational.events_distinct_users,
        "events_asof_join": relational.events_asof_join,
        "events_range_join": relational.events_range_join,
        "events_rollup": relational.events_rollup,
        "value_percentiles": relational.value_percentiles,
        "value_quantiles_sketch": relational.value_quantiles_sketch,
    }


