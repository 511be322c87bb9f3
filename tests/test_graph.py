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


def test_bfs_broadcast_matches_partitioned(ray_session):
    bc = (
        graph.bfs_depths(SF, max_depth=3)
        .to_pandas()
        .sort_values("entity_iri")
        .reset_index(drop=True)
    )
    part = (
        graph.bfs_depths(SF, max_depth=3, force_partitioned=True)
        .to_pandas()
        .sort_values("entity_iri")
        .reset_index(drop=True)
    )
    assert bc["entity_iri"].tolist() == part["entity_iri"].tolist()
    assert bc["depth"].tolist() == part["depth"].tolist()
    assert (bc["depth"] == 0).sum() == 1  # exactly one seed


def test_triangle_counts_vs_set_intersection(ray_session):
    got = (
        graph.triangle_counts(SF)
        .to_pandas()
        .sort_values("entity_iri")
        .reset_index(drop=True)
    )
    # independent ground truth: per-node triangles = Σ_{(a,b)∈E}
    # |N(a)∩N(b)| distributed to the three corners, via adjacency sets
    edges = graph.comention_edges(SF).to_pandas()
    adj = {}
    for a, b in edges.itertuples(index=False):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {}
    for a, b in edges.itertuples(index=False):
        for c in adj[a] & adj[b]:
            for n in (a, b, c):
                tri[n] = tri.get(n, 0) + 1
    # each triangle's (a,b,c) is seen via its 3 edges → counted 3× per corner
    exp = {n: t // 3 for n, t in tri.items()}
    assert dict(zip(got["entity_iri"], got["n_triangles"])) == exp
    assert (got["clustering"] > 0).all() and (got["clustering"] <= 1).all()


def test_triangles_partitioned_matches_broadcast(ray_session):
    # the 100-TB path (no node-/edge-scale broadcast anywhere) must
    # produce the exact same counts as the broadcast kernel — verified
    # at sf0.01 per the round-3 brief
    sf = "/root/testdata/sf0.01"
    key = lambda df: (
        df.to_pandas()
        .sort_values("entity_iri")
        .reset_index(drop=True)
    )
    bc = key(graph.triangle_counts(sf))
    part = key(graph.triangle_counts(sf, force_partitioned=True))
    assert bc["entity_iri"].tolist() == part["entity_iri"].tolist()
    assert bc["n_triangles"].tolist() == part["n_triangles"].tolist()
    assert bc["clustering"].tolist() == part["clustering"].tolist()


def test_mix_sources_quotas(ray_session):
    import duckdb

    sf = "/root/testdata/sf0.01"
    from rdf_canon_ray.pipelines import corpus

    out = corpus.mix_sources(sf).to_pandas()
    counts = duckdb.sql(
        f"SELECT source, COUNT(*) AS c FROM read_parquet('{sf}/documents.parquet') GROUP BY 1"
    ).df()
    got = out.groupby("source").size()
    import numpy as np

    for _, row in counts.iterrows():
        n = int(row["source"].removeprefix("src"))
        quota = min(int(row["c"]), int(np.floor((n + 1) / 210.0 * 300)))
        assert got.get(row["source"], 0) == quota
    # rank is 1..quota per source
    assert (out.groupby("source")["sample_rank"].max() == got).all()


def test_pagerank_cap_is_deterministic(ray_session):
    a = graph.comention_edges(SF, max_conv_entities=3).to_pandas()
    b = graph.comention_edges(SF, max_conv_entities=3).to_pandas()
    key = lambda d: sorted(map(tuple, d.to_numpy()))
    assert key(a) == key(b)
    full = graph.comention_edges(SF).to_pandas()
    assert len(a) < len(full)


def test_adjacency_store_cold_load_equality(ray_session):
    """The persisted encoded-adjacency store (VERDICT r04 #4) must give
    byte-identical pagerank/BFS when loaded cold (in-process caches
    cleared), and rebuild when the transcript corpus changes."""
    import json
    import os
    import shutil

    store = graph._adjacency_store_dir(SF, None)
    shutil.rmtree(store, ignore_errors=True)
    # the persist happens on BUILD — drop the in-process cache so this
    # test is order-independent (earlier tests may have packed SF)
    graph._ENC_CACHE.clear()
    a = graph.pagerank(SF).to_pandas().sort_values("entity_iri").reset_index(drop=True)
    assert os.path.isfile(os.path.join(store, "_adj.json"))
    with open(os.path.join(store, "_adj.json")) as f:
        manifest = json.load(f)
    assert manifest["v"] == graph._ADJ_STORE_V
    # simulate a cold session: drop every in-process cache
    graph._ENC_CACHE.clear()
    graph._ADJ_CACHE.clear()
    graph._PAIRS_CACHE.clear()
    b = graph.pagerank(SF).to_pandas().sort_values("entity_iri").reset_index(drop=True)
    assert a.equals(b)
    bfs_a = graph.bfs_depths(SF).to_pandas().sort_values("entity_iri").reset_index(drop=True)
    graph._ENC_CACHE.clear()
    bfs_b = graph.bfs_depths(SF).to_pandas().sort_values("entity_iri").reset_index(drop=True)
    assert bfs_a.equals(bfs_b)
    # stale fingerprint → loader refuses (rebuild path)
    bad = dict(manifest, fingerprint=[["tampered", 0, 0]])
    with open(os.path.join(store, "_adj.json"), "w") as f:
        json.dump(bad, f)
    assert graph._load_resident_graph(
        store, [list(t) for t in graph._corpus_tag(SF)], 500_000
    ) is None
    shutil.rmtree(store, ignore_errors=True)


def test_triangle_hub_split_equals_whole_segments(ray_session):
    """Wedge-balanced task planning (VERDICT r04 #5): forcing a tiny
    wedge budget makes every hub's out-list split across pair-range
    sub-tasks; corner partials must bincount-merge to the same counts
    as the unsplit run."""
    a = (
        graph.triangle_counts(SF)
        .to_pandas()
        .sort_values("entity_iri")
        .reset_index(drop=True)
    )
    b = (
        graph.triangle_counts(SF, wedge_budget_floor=25)
        .to_pandas()
        .sort_values("entity_iri")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert a["n_triangles"].sum() > 0


def test_comention_incremental_equals_full_rebuild(ray_session):
    """Incremental graph refresh (VERDICT r04 #6): persisted base pair
    store ∪ delta-bucket pairs == full comention_edges rebuild; the
    store holds only non-delta buckets (refresh cost O(delta))."""
    import os

    key = lambda d: sorted(map(tuple, d.to_numpy()))
    full = graph.comention_edges(SF).to_pandas()
    inc = graph.comention_incremental(SF, num_buckets=16, delta_mod=4).to_pandas()
    assert key(full) == key(inc)
    store = graph.comention_store(SF, num_buckets=16, delta_mod=4)
    parts = [d for d in os.listdir(store) if d.startswith("part=")]
    assert parts and all(int(p.split("=")[1]) % 4 != 0 for p in parts)
