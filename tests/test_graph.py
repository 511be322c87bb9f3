"""Entity co-mention graph analytics: edges + fixed-iteration PageRank."""

import numpy as np
import pandas as pd
import ray.data as rd

from rdf_canon_ray.pipelines import graph

SF = "/root/testdata/sf0.001"


def test_pagerank_star_graph_hand_computed(ray_session):
    # star K1,3: center c with leaves l1..l3; 2 iterations by hand:
    #   r1(c) = .15 + .85*3 = 2.7          r1(l) = .15 + .85/3
    #   r2(c) = .15 + .85*3*r1(l) = 1.255  r2(l) = .15 + .85*2.7/3 = .915
    adj = rd.from_pandas(
        pd.DataFrame(
            {
                "node": ["c", "l1", "l2", "l3"],
                "srcs": [["l1", "l2", "l3"], ["c"], ["c"], ["c"]],
                "deg": np.array([3, 1, 1, 1], np.int64),
            }
        )
    )
    deg_df = pd.DataFrame(
        {"node": ["c", "l1", "l2", "l3"], "deg": np.array([3, 1, 1, 1])}
    )
    out = (
        graph._pagerank_broadcast(adj, deg_df, iterations=2)
        .to_pandas()
        .set_index("entity_iri")["rank"]
    )
    assert out["c"] == 1.255
    assert out["l1"] == out["l2"] == out["l3"] == 0.915


def test_comention_edges_symmetric_free_and_distinct(ray_session):
    edges = graph.comention_edges(SF).to_pandas()
    assert (edges["e1"] < edges["e2"]).all()
    assert not edges.duplicated(["e1", "e2"]).any()
    assert len(edges) > 0


def test_pagerank_broadcast_matches_partitioned(ray_session):
    bc = (
        graph.pagerank(SF, iterations=3)
        .to_pandas()
        .sort_values("entity_iri")
        .reset_index(drop=True)
    )
    part = (
        graph.pagerank(SF, iterations=3, force_partitioned=True)
        .to_pandas()
        .sort_values("entity_iri")
        .reset_index(drop=True)
    )
    assert bc["entity_iri"].tolist() == part["entity_iri"].tolist()
    # identical math, different float summation order → equal to well
    # below the 6 dp rounding both paths apply
    np.testing.assert_allclose(
        bc["rank"].to_numpy(), part["rank"].to_numpy(), atol=2e-6
    )
    # mean-1 normalization: ranks are O(1) and average near 1
    assert 0.5 < bc["rank"].mean() < 1.5


def test_pagerank_cap_is_deterministic(ray_session):
    a = graph.comention_edges(SF, max_conv_entities=3).to_pandas()
    b = graph.comention_edges(SF, max_conv_entities=3).to_pandas()
    key = lambda d: sorted(map(tuple, d.to_numpy()))
    assert key(a) == key(b)
    full = graph.comention_edges(SF).to_pandas()
    assert len(a) < len(full)
