"""Driver-window honesty guard (round-3 verdict item 10 / ADVICE).

The driver records only the first 50 ``queries()`` entries.  The
contract: every query that CAN be value-hash-verified (has an
``oracle_sql`` entry) is either inside that window or (a) is
redundantly covered by an in-window sibling sharing its upstream
parse/rollup AND (b) is still hash-verified in-repo by
tests/test_queries_oracle.py.  These assertions make registry growth
fail loudly instead of silently orphaning a query."""

import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entry

WINDOW = 50

# yielded query -> the in-window sibling that exercises the same
# upstream parse/rollup (must stay consistent with the rationale in
# __ray_entry__._YIELD_WINDOW_SLOT)
SIBLINGS = {
    "sitemap_seed_frontier": "sitemap_parse",
    "wayback_domain_age": "wayback_latest_snapshot",
    "link_health_audit": "extract_links",
    "expired_domain_finder": "domain_value_scores",
    "top_valuable_domains": "domain_value_scores",
    "anomalous_events_windowed": "anomalous_events",
    "token_stats_bpe": "token_stats",
    "order_priority_revenue": "revenue_by_nation",
    "cdx_seed_frontier": "cc_cdx_parse",
    "events_hopping_window": "events_by_day",
    "doc_quality": "token_stats",
    "link_velocity": "host_graph",
    "top_anchors_referrers": "link_profiles",
    "clean_text": "pii_scrub",
    "referring_domains_exact": "link_profiles",
    "full_seo_audit": "technical_audit",
    "web3_content_index": "text_extract",
    "embedding_centroids": "embedding_topk",
    "embedding_quantize": "embedding_topk",
    "repetition_metrics": "token_stats",
    "unigram_logprob": "token_stats",
    "dsir_scores": "token_stats",
    "dsir_select": "dataset_split",
    "ccnet_buckets": "token_stats",
    "exact_substring_dups": "contamination_ngrams",
    "media_features_png": "media_features",
    "events_range_join": "events_asof_join",
    "c4_filters": "token_stats",
    "tfidf_top_terms": "vocab_top_tokens",
    "value_percentiles": "events_by_day",
    "host_triangles": "host_graph",
    "host_reciprocal_links": "host_graph",
    "host_clustering": "host_graph",
    "related_hosts_cocitation": "link_intersect",
    "host_degree_assortativity": "host_graph",
    "event_funnel": "sessionize",
    "cohort_retention": "sessionize",
    "inverted_index": "vocab_top_tokens",
    "mixture_sample": "dataset_split",
    "token_entropy": "token_stats",
    "source_kl_divergence": "token_stats",
    "line_dedup": "token_stats",
    "events_rolling_window": "sessionize",
    "chunk_documents": "token_stats",
    "badwords_filter": "token_stats",
    "watermark_lateness": "events_by_day",
    "source_quality_rollup": "token_stats",
    "crawl_tier_assignment": "domain_value_scores",
    "token_zipf_fit": "vocab_top_tokens",
    "source_lang_mix": "token_stats",
    "tar_shard_roundtrip": "text_extract",
    "bigram_logprob": "contamination_ngrams",
    "events_distinct_users": "events_by_day",
    "snapshot_diff": "dataset_split",
    "redirect_chains": "dataset_split",
    "host_spam_scores": "host_graph",
    "url_filter_scores": "extract_links",
    "shard_balance_report": "extract_links",
    "bloom_semijoin": "customers_without_orders",
    "robots_block_rates": "crawl_bfs",
    "profiles_incremental": "link_profiles",
    "range_partition_plan": "events_by_day",
    "events_rollup": "events_by_day",
    "anchor_fuzzy_pairs": "extract_links",
    "ai_calibration": "ai_content_scores",
}


def test_all_oracle_queries_fit_window_or_yield():
    oracles = entry.oracle_sql()
    yielded = set(entry._YIELD_WINDOW_SLOT)
    assert len(oracles) - len(yielded) <= WINDOW, (
        f"{len(oracles)} oracle queries minus {len(yielded)} yields exceeds the "
        f"{WINDOW}-slot driver window — add a redundantly-covered query to "
        "_YIELD_WINDOW_SLOT (with a sibling) or drop one"
    )


def test_window_prefix_is_exactly_the_unyielded_oracles():
    qs = list(entry.queries().keys())
    oracles = set(entry.oracle_sql())
    yielded = set(entry._YIELD_WINDOW_SLOT)
    in_window = set(qs[:WINDOW])
    # every unyielded oracle query must land in the recorded window
    missing = (oracles - yielded) - in_window
    assert not missing, f"oracle-backed queries fell out of the driver window: {missing}"


def test_every_yield_has_an_in_window_sibling():
    qs = list(entry.queries().keys())
    oracles = set(entry.oracle_sql())
    in_window = set(qs[:WINDOW])
    for name in entry._YIELD_WINDOW_SLOT:
        assert name in oracles, f"yielded query {name} lost its in-repo oracle"
        sib = SIBLINGS.get(name)
        assert sib is not None, f"yielded query {name} has no documented sibling"
        assert sib in in_window, f"{name}'s sibling {sib} is not in the driver window"


def test_every_registry_query_is_exposed():
    from link_profiler_repo_ray.registry import queries as reg

    exposed = set(entry.queries().keys())
    assert set(reg().keys()) == exposed
