"""SURVEY §5 item 3: sketch-based aggregates vs exact ground truth."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_hll_within_error_bound_of_exact():
    from link_profiler_repo_ray.pipelines import graph

    exact = (
        graph.referring_domains_exact(SF)
        .to_pandas()
        .set_index("target_host")["referring_domains"]
    )
    est = (
        graph.referring_domains_hll(SF)
        .to_pandas()
        .set_index("target_host")["referring_domains_est"]
    )
    assert set(exact.index) == set(est.index)
    for host in exact.index:
        rel_err = abs(est[host] - exact[host]) / max(1, exact[host])
        assert rel_err < 0.1, (host, est[host], exact[host])


@pytest.mark.usefixtures("ray_session")
def test_profiles_sum_to_edge_count():
    from link_profiler_repo_ray.pipelines import graph

    profiles = graph.link_profiles(SF).to_pandas()
    n_edges = graph.edges_dataset(SF).count()
    assert profiles["total_backlinks"].sum() == n_edges
    assert (profiles["unique_referring_domains"] <= profiles["total_backlinks"]).all()


@pytest.mark.usefixtures("ray_session")
def test_host_components_vs_union_find():
    """Distributed label-propagation components == sequential union-find."""
    from link_profiler_repo_ray.pipelines import graph

    edges = [
        (r["source_host"], r["target_host"])
        for r in graph.host_graph(SF).take_all()
    ]
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp: dict = {}
    for h in parent:
        comp.setdefault(find(h), set()).add(h)
    expected = {frozenset(v) for v in comp.values()}

    rows = graph.host_components(SF).take_all()
    got: dict = {}
    for r in rows:
        got.setdefault(r["root_host"], set()).add(r["host"])
    # every member's root is inside its own component
    for root, members in got.items():
        assert root in members
    assert {frozenset(v) for v in got.values()} == expected
