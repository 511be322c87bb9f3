"""Unit tests for training-data operators (dedup, text, similarity,
multimodal) on small controlled inputs."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_df():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def test_exact_dedup_keeps_min_id(ray_session):
    import ray.data as rd

    from rdf_canon_ray.stages.dedup import exact_dedup

    df = pd.DataFrame(
        {"doc_id": [5, 3, 9, 1], "text": ["aa", "bb", "aa", "bb"]}
    )
    out = exact_dedup(rd.from_pandas(df), num_buckets=2).to_pandas()
    assert sorted(out["doc_id"]) == [1, 5]  # min id per content group
    assert set(out["n_dups"]) == {2}


def test_minhash_finds_planted_dups(ray_session, docs_df):
    """MinHash-LSH recovers exactly the brute-force jaccard≥0.8 pairs."""
    import itertools

    import ray.data as rd

    from rdf_canon_ray.stages.dedup import minhash_lsh_pairs

    texts = dict(zip(docs_df["doc_id"], docs_df["text"]))

    def sh(t):
        return {t[i : i + 5] for i in range(len(t) - 4)} if len(t) >= 5 else {t}

    S = {i: sh(t) for i, t in texts.items()}
    truth = set()
    for i, j in itertools.combinations(sorted(S), 2):
        inter = len(S[i] & S[j])
        if inter and inter / (len(S[i]) + len(S[j]) - inter) >= 0.8:
            truth.add((i, j))

    got = minhash_lsh_pairs(
        rd.from_pandas(docs_df[["doc_id", "text"]]),
        threshold=0.8,
    ).to_pandas()
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    assert got_pairs == truth
    assert len(truth) > 0  # corpus has planted near-dups


def test_dup_groups(ray_session):
    import ray.data as rd

    from rdf_canon_ray.stages.dedup import dup_groups_from_pairs

    pairs = pd.DataFrame(
        {"id_a": [1, 2, 10], "id_b": [2, 3, 11], "jaccard": [0.9] * 3}
    )
    out = dup_groups_from_pairs(rd.from_pandas(pairs)).to_pandas()
    by = out.set_index("doc_id")["rep_id"]
    assert by[1] == by[2] == by[3] == 1
    assert by[10] == by[11] == 10


def test_degenerate_bucket_drop_is_reported(ray_session):
    """Candidate caps on degenerate LSH buckets must report their drop
    count through the metrics channel, never silently."""
    import ray.data as rd

    from rdf_canon_ray.stages.dedup import minhash_lsh_pairs
    from rdf_canon_ray.state import metrics

    metrics.reset()
    n = 250  # one LSH bucket of 250 identical docs > bucket_cap=200
    df = pd.DataFrame(
        {"doc_id": np.arange(n), "text": ["same text repeated here"] * n}
    )
    out = minhash_lsh_pairs(rd.from_pandas(df), threshold=0.8).to_pandas()
    assert len(out) > 0  # surviving candidates still verified
    counters = metrics.read()
    assert counters.get("minhash_lsh_candidates_dropped", 0) > 0


def test_simhash_rejects_unguaranteed_hamming(ray_session):
    import ray.data as rd

    from rdf_canon_ray.stages.dedup import simhash_pairs

    df = pd.DataFrame({"doc_id": [1], "text": ["x"]})
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_pairs(rd.from_pandas(df), max_hamming=5)


def test_simhash_identical_texts_zero_hamming(ray_session):
    import ray.data as rd

    from rdf_canon_ray.stages.dedup import simhash_pairs

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy dog",
                "completely different words entirely here now",
            ],
        }
    )
    out = simhash_pairs(rd.from_pandas(df), num_buckets=2).to_pandas()
    assert ((out["id_a"] == 1) & (out["id_b"] == 2)).any()
    row = out[(out["id_a"] == 1) & (out["id_b"] == 2)].iloc[0]
    assert row["hamming"] == 0


def test_token_stats_matches_python(ray_session, docs_df):
    import ray.data as rd

    from rdf_canon_ray.stages.text import WORD_RE, TokenStats

    out = (
        rd.from_pandas(docs_df[["doc_id", "text"]])
        .map_batches(TokenStats, batch_format="pandas", concurrency=1)
        .to_pandas()
        .set_index("doc_id")
    )
    for _, r in docs_df.head(20).iterrows():
        assert out.loc[r.doc_id, "n_ws_tokens"] == len(r.text.split())
        assert out.loc[r.doc_id, "n_word_tokens"] == len(WORD_RE.findall(r.text))


def test_cosine_topk_exact(ray_session):
    import ray.data as rd

    from rdf_canon_ray.stages.similarity import cosine_topk

    rng = np.random.RandomState(0)
    vecs = rng.normal(size=(200, 16))
    df = pd.DataFrame({"vec_id": np.arange(200)})
    df["embedding"] = list(vecs)
    queries = vecs[:3]
    out = cosine_topk(rd.from_pandas(df), queries, k=5).to_pandas()
    # brute-force reference
    n = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = n @ n[:3].T
    for q in range(3):
        order = np.lexsort((np.arange(200), -sims[:, q]))[:5]
        got = out[out["query_id"] == q].sort_values("rank")["vec_id"].to_numpy()
        assert (got == order).all()
        # self is rank 1 with score 1.0
        assert got[0] == q
        assert (
            out[(out["query_id"] == q) & (out["rank"] == 1)]["score"].iloc[0]
            == 1.0
        )


def test_lsh_topk_subset_of_bucket(ray_session):
    import ray.data as rd

    from rdf_canon_ray.pipelines import corpus

    out = corpus.ann_lsh_topk(SF).to_pandas()
    exact = corpus.ann_topk(SF).to_pandas()
    # every LSH hit must carry the exact score of that (query, vec) pair
    merged = out.merge(
        exact, on=["query_id", "vec_id"], suffixes=("_lsh", "_exact"), how="inner"
    )
    if len(merged):
        assert (merged["score_lsh"] == merged["score_exact"]).all()
    # rank-1 for each answered query is the query itself (same bucket)
    r1 = out[out["rank"] == 1]
    assert (r1["vec_id"].to_numpy() == r1["query_id"].to_numpy()).all()


def test_media_features_real_decode(ray_session):
    """All three media kinds (PPM/WAV/RCRV) decode for real: every row
    is decoded=True and the feature sum equals the content byte sum."""
    import pyarrow.parquet as pq_mod

    from rdf_canon_ray.pipelines import corpus
    from rdf_canon_ray.stages import multimodal

    out = corpus.media_feature_table(SF).to_pandas()
    assert len(out) == 280  # 256 base + 24 planted near-dup variants (v4)
    assert out["decoded"].all()
    assert out["feature"].map(len).eq(64).all()
    # cross-check one row per kind against a direct decode
    raw = pq_mod.read_table(corpus.media_corpus_parquet()).to_pandas()
    merged = out.merge(raw, on=["media_id", "kind"])
    for kind, content_of in [
        ("image", lambda p: multimodal.decode_ppm(p).ravel()),
        ("audio", multimodal.decode_wav),
        ("video", lambda p: multimodal.decode_rcrv(p)[0].ravel()),
    ]:
        row = merged[merged["kind"] == kind].iloc[0]
        assert int(sum(row["feature"])) == int(
            content_of(row["payload"]).astype(np.int64).sum()
        )
    # deterministic across runs
    out2 = corpus.media_feature_table(SF).to_pandas()
    a = out.sort_values("media_id")["feature"].map(tuple).tolist()
    b = out2.sort_values("media_id")["feature"].map(tuple).tolist()
    assert a == b


def test_earl_report(ray_session, tmp_path):
    """EARL/Turtle conformance report (reference parity:
    /root/reference/src/lib.rs:206-272): 86 assertions, all passed."""
    from rdf_canon_ray.pipelines.conformance import (
        run_conformance,
        write_earl_report,
    )

    results = run_conformance().to_pandas()
    path = write_earl_report(results, str(tmp_path / "earl.ttl"))
    doc = open(path, encoding="utf-8").read()
    assert doc.count("earl:passed") == 86
    assert doc.count("earl:failed") == 0
    assert doc.count("a               earl:Assertion") == 86
    assert "w3c.github.io/rdf-canon/tests/manifest#test020c" in doc
    assert doc.startswith("@prefix dc:")


def test_nquads_source_roundtrip(ray_session, tmp_path):
    from rdf_canon_ray.sources.nquads import read_nquads

    src = "/root/reference/tests/rdfc10/test060-in.nq"
    ds = read_nquads(src)
    df = ds.to_pandas()
    import re

    with open(src, encoding="utf-8") as f:
        n_stmts = sum(1 for line in f if line.strip() and not line.startswith("#"))
    assert len(df) == n_stmts
    assert set(df["graph_id"]) >= {""}  # default graph present


def test_ivf_topk_recall(ray_session):
    """IVF top-k: scores byte-match the exact search on shared pairs;
    recall@10 against brute force is high with 4/16 probes."""
    from rdf_canon_ray.pipelines import corpus

    exact = corpus.ann_topk(SF).to_pandas()
    ivf = corpus.ann_ivf_topk(SF).to_pandas()
    merged = ivf.merge(
        exact, on=["query_id", "vec_id"], suffixes=("_ivf", "_exact"), how="inner"
    )
    assert (merged["score_ivf"] == merged["score_exact"]).all()
    # rank-1 self-match always survives (query's own list is probed)
    r1 = ivf[ivf["rank"] == 1]
    assert (r1["vec_id"].to_numpy() == r1["query_id"].to_numpy()).all()
    # aggregate recall@10
    hits = len(merged)
    total = len(exact)
    assert hits / total >= 0.5, f"recall {hits}/{total}"


def test_ivf_persisted_multiprobe_recall(ray_session):
    """The registered persisted-IVF query (6 of 16 lists probed) clears
    recall@10 ≥ 0.9 vs brute force, and scores byte-match exact search
    on shared pairs."""
    from rdf_canon_ray.pipelines import corpus

    exact = corpus.ann_topk(SF).to_pandas()
    ivf = corpus.ann_ivf_persisted(SF).to_pandas()
    merged = ivf.merge(
        exact, on=["query_id", "vec_id"], suffixes=("_ivf", "_exact"),
        how="inner",
    )
    assert (merged["score_ivf"] == merged["score_exact"]).all()
    assert len(merged) / len(exact) >= 0.9, f"recall {len(merged)}/{len(exact)}"


def test_media_resize_and_frames(ray_session):
    from rdf_canon_ray.pipelines import corpus
    from rdf_canon_ray.stages.multimodal import decode_ppm

    rz = corpus.media_resized(SF).to_pandas()
    assert len(rz) == 280  # 256 base + 24 planted near-dup variants (v4)
    img = rz[rz["kind"] == "image"]
    assert img["resized"].all()
    # output payloads are valid 64×64 PPMs
    decoded = img["payload"].map(decode_ppm)
    assert decoded.map(lambda a: a is not None and a.shape == (64, 64, 3)).all()
    assert (~rz[rz["kind"] != "image"]["resized"]).all()

    fr = corpus.media_frames(SF).to_pandas()
    assert len(fr) > 0
    # ≤ 8 frames per video, deterministic across runs
    per = fr.groupby("media_id").size()
    assert per.le(8).all()
    fr2 = corpus.media_frames(SF).to_pandas()
    a = fr.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    b = fr2.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    assert a.equals(b)


def test_events_sessions_gap_semantics(ray_session, tmp_path):
    """Gap-based sessionization: a >30min gap starts a new session;
    users never share sessions."""
    import pandas as pd

    from rdf_canon_ray.pipelines import analytics

    ts = pd.to_datetime(
        [
            "2024-01-01 10:00",  # u1 s0
            "2024-01-01 10:10",  # u1 s0 (10min gap)
            "2024-01-01 11:00",  # u1 s1 (50min gap)
            "2024-01-01 10:05",  # u2 s0
        ]
    )
    df = pd.DataFrame(
        {"event_id": [1, 2, 3, 4], "user_id": [1, 1, 1, 2], "ts": ts}
    )
    sf = tmp_path / "sess"
    sf.mkdir()
    df.to_parquet(sf / "events.parquet", index=False)
    out = (
        analytics.events_sessions(str(sf))
        .to_pandas()
        .set_index("event_id")["session_idx"]
    )
    assert out[1] == 0 and out[2] == 0 and out[3] == 1 and out[4] == 0


def test_operators_handle_empty_and_singleton_inputs(ray_session):
    """Empty and single-row corpora flow through every dedup/shuffle
    operator without errors."""
    import ray.data as rd

    from rdf_canon_ray.stages.dedup import (
        dup_groups_from_pairs,
        exact_dedup,
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from rdf_canon_ray.stages.shuffle import distinct

    empty = pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "text": pd.Series([], dtype=object)}
    )
    one = pd.DataFrame({"doc_id": [1], "text": ["hello world text"]})
    assert exact_dedup(rd.from_pandas(empty)).count() == 0
    assert exact_dedup(rd.from_pandas(one)).count() == 1
    assert minhash_lsh_pairs(rd.from_pandas(empty)).count() == 0
    assert minhash_lsh_pairs(rd.from_pandas(one)).count() == 0
    assert simhash_pairs(rd.from_pandas(one)).count() == 0
    assert distinct(rd.from_pandas(empty), ["doc_id"]).count() == 0
    no_pairs = pd.DataFrame(
        {"id_a": pd.Series([], dtype="int64"),
         "id_b": pd.Series([], dtype="int64"),
         "jaccard": pd.Series([], dtype=float)}
    )
    assert dup_groups_from_pairs(rd.from_pandas(no_pairs)).count() == 0


def test_dup_groups_long_chain_converges(ray_session):
    """Min-label propagation over a 12-node path graph needs ~11 rounds
    — exercises the iterate-to-fixpoint loop, not just 1-hop cases."""
    import ray.data as rd

    from rdf_canon_ray.stages.dedup import dup_groups_from_pairs

    n = 12
    pairs = pd.DataFrame(
        {
            "id_a": np.arange(n - 1) + 100,
            "id_b": np.arange(1, n) + 100,
            "jaccard": [0.9] * (n - 1),
        }
    )
    out = dup_groups_from_pairs(
        rd.from_pandas(pairs), num_buckets=4
    ).to_pandas()
    assert len(out) == n
    assert (out["rep_id"] == 100).all()


def test_hash_split_deterministic_and_complete(ray_session):
    from rdf_canon_ray.pipelines import corpus

    a = corpus.hash_split(SF).to_pandas().sort_values("doc_id")
    b = corpus.hash_split(SF).to_pandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    assert set(a["split"]) <= {"train", "val", "test"}
    # roughly 80/10/10 (content-stable, so exact counts are fixed)
    frac = (a["split"] == "train").mean()
    assert 0.6 < frac < 0.95


def test_decontaminate_flags_benchmark_members(ray_session):
    from rdf_canon_ray.pipelines import corpus

    out = corpus.decontaminate(SF).to_pandas().set_index("doc_id")
    bench_ids = sorted(out.index)[:10]
    assert out.loc[bench_ids, "contaminated"].all()


def test_events_sliding_covers_four_windows(ray_session, tmp_path):
    """A single event appears in exactly the 4 sliding windows (1h len,
    15min slide) that cover it."""
    import pandas as pd

    from rdf_canon_ray.pipelines import analytics

    df = pd.DataFrame(
        {
            "event_id": [1],
            "user_id": [1],
            "event_type": ["click"],
            "ts": pd.to_datetime(["2024-01-01 10:07"]),
            "value": [2.5],
        }
    )
    sf = tmp_path / "slide"
    sf.mkdir()
    df.to_parquet(sf / "events.parquet", index=False)
    out = analytics.events_sliding(str(sf)).to_pandas()
    assert len(out) == 4
    starts = sorted(out["window_start"])
    assert [str(s) for s in starts] == [
        "2024-01-01 09:15:00",
        "2024-01-01 09:30:00",
        "2024-01-01 09:45:00",
        "2024-01-01 10:00:00",
    ]
    assert (out["n_events"] == 1).all()
    assert (out["sum_value"] == 2.5).all()


def test_dedup_clean_drops_only_non_representatives(ray_session):
    """Corpus dedup keeps every unduplicated doc plus exactly one
    representative (min id) per near-dup cluster."""
    from rdf_canon_ray.pipelines import corpus

    kept = set(corpus.dedup_clean(SF).to_pandas()["doc_id"])
    groups = (
        corpus.minhash_groups(SF, threshold=0.8)
    )  # char-based groups only sanity-check structure
    pairs = corpus.ngram_jaccard_pairs(SF).to_pandas()
    import pyarrow.parquet as pq

    all_ids = set(
        pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"].to_pylist()
    )
    dropped = all_ids - kept
    # every dropped doc appears in some near-dup pair, never as the
    # smallest member of its pair set
    paired = set(pairs["id_a"]) | set(pairs["id_b"])
    assert dropped <= paired
    for d in dropped:
        partners = set(pairs.loc[pairs["id_a"] == d, "id_b"]) | set(
            pairs.loc[pairs["id_b"] == d, "id_a"]
        )
        assert min(partners | {d}) < d  # someone smaller represents it


def test_pack_sequences_contiguous_within_stream(ray_session):
    """Packing invariant per stream: doc start offsets are the running
    token total (concat-then-chunk), so consecutive docs are contiguous
    modulo the budget."""
    import pyarrow.parquet as pq

    from rdf_canon_ray.pipelines import corpus

    out = corpus.pack_sequences(SF, budget=256).to_pandas()
    toks = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    toks["n_tok"] = toks["text"].str.split().str.len()
    merged = out.merge(toks[["doc_id", "n_tok"]], on="doc_id")
    for _, sub in merged.groupby("pack_bucket"):
        sub = sub.sort_values("doc_id")
        running = 0
        for _, r in sub.iterrows():
            assert r["seq_idx"] == running // 256
            assert r["tok_offset"] == running % 256
            running += r["n_tok"]


def test_shuffle_backbone_matches_pandas(ray_session):
    """Randomized (seeded) equivalence: grouped_agg and distinct over
    the bucketed shuffle match plain pandas on mixed-type frames."""
    import ray.data as rd

    from rdf_canon_ray.stages.shuffle import distinct, grouped_agg

    rng = np.random.RandomState(7)
    for trial in range(3):
        n = 2000
        df = pd.DataFrame(
            {
                "k1": rng.choice(["a", "b", "c", "d"], n),
                "k2": rng.randint(0, 13, n),
                "v": rng.normal(size=n),
                "w": rng.randint(-5, 5, n).astype(np.int64),
            }
        )
        got = (
            grouped_agg(
                rd.from_pandas(df), ["k1", "k2"],
                {"v": "sum", "w": "min"}, num_buckets=8,
            )
            .to_pandas()
            .sort_values(["k1", "k2"])
            .reset_index(drop=True)
        )
        exp = (
            df.groupby(["k1", "k2"])
            .agg(v=("v", "sum"), w=("w", "min"))
            .reset_index()
            .sort_values(["k1", "k2"])
            .reset_index(drop=True)
        )
        assert np.allclose(got["v"], exp["v"]) and (got["w"] == exp["w"]).all()

        d_got = (
            distinct(rd.from_pandas(df), ["k1", "k2"], num_buckets=8)
            .to_pandas()
            .sort_values(["k1", "k2"])
            .reset_index(drop=True)
        )
        d_exp = (
            df[["k1", "k2"]]
            .drop_duplicates()
            .sort_values(["k1", "k2"])
            .reset_index(drop=True)
        )
        assert d_got.equals(d_exp)


def test_knn_join_tie_break_on_duplicate_refs(ray_session):
    """Exact score ties at the k-th boundary must resolve by ascending
    nn_id (duplicate reference embeddings force the tie)."""
    import ray.data as rd

    from rdf_canon_ray.stages.similarity import knn_join

    v = [1.0, 0.0, 0.0]
    ref_ids = np.array([10, 11, 12, 13])
    ref_vecs = np.array([v, v, v, [0.0, 1.0, 0.0]])  # three exact ties
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": [0], "embedding": [np.array(v)]})
    )
    out = (
        knn_join(ds, ref_ids, ref_vecs, k=2)
        .to_pandas()
        .sort_values("rank")
    )
    assert out["nn_id"].tolist() == [10, 11]  # lowest ids among the ties


def test_hash_join_broadcast_fallback_respects_how(ray_session):
    """broadcast_threshold must not hijack right/outer joins (per-batch
    merge would duplicate unmatched right rows)."""
    import ray.data as rd

    from rdf_canon_ray.stages.joins import hash_join

    left = rd.from_pandas(
        pd.DataFrame({"k": [1, 1, 2], "lv": [10, 11, 12]})
    ).repartition(3)
    right = rd.from_pandas(pd.DataFrame({"k": [2, 3], "rv": [20, 30]}))
    out = hash_join(
        left, right, on="k", how="outer",
        num_buckets=4, broadcast_threshold=1000,
    ).to_pandas()
    # unmatched right row k=3 appears exactly once despite 3 left blocks
    assert (out["k"] == 3).sum() == 1
    assert len(out) == 4


def test_dup_groups_pointer_jump_converges_deep_chain(ray_session):
    """A chain deeper than max_rounds converges via pointer jumping."""
    import ray.data as rd

    from rdf_canon_ray.stages.dedup import dup_groups_from_pairs

    n = 40
    pairs = pd.DataFrame(
        {
            "id_a": np.arange(n - 1) + 200,
            "id_b": np.arange(1, n) + 200,
            "jaccard": [0.9] * (n - 1),
        }
    )
    out = dup_groups_from_pairs(
        rd.from_pandas(pairs), num_buckets=4, max_rounds=12, jump_after=2
    ).to_pandas()
    assert len(out) == n
    assert (out["rep_id"] == 200).all()


def test_pack_sequences_two_level_offsets(ray_session):
    """Packing output is invariant to sub_size (the scale knob that
    bounds per-task work): tiny sub-ranges — many groups per stream, no
    task sees a whole stream — must reproduce the one-shot result."""
    from rdf_canon_ray.pipelines import corpus

    whole = (
        corpus.pack_sequences(SF, sub_size=1 << 40)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    split = (
        corpus.pack_sequences(SF, sub_size=7)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert whole.equals(split)
    # sub_size=7 really splits streams into many sub-ranges
    assert whole["doc_id"].max() // 7 >= 10


def test_dedup_clean_distributed_drop_path(ray_session):
    """Forcing the drop-set over the broadcast gate must route through
    the co-partitioned anti-join and return the identical kept set."""
    from rdf_canon_ray.pipelines import corpus

    via_broadcast = sorted(
        corpus.dedup_clean(SF).to_pandas()["doc_id"].tolist()
    )
    via_distributed = sorted(
        corpus.dedup_clean(SF, broadcast_max=0).to_pandas()["doc_id"].tolist()
    )
    assert via_broadcast == via_distributed
    assert len(via_broadcast) > 0


def test_stratified_sample_stable_and_capped(ray_session):
    """Per-source hash sampling: ≤N per source, deterministic across
    runs (the local-top combiner must not change the global winners)."""
    from rdf_canon_ray.pipelines import corpus

    a = corpus.stratified_sample(SF, per_source=5).to_pandas()
    assert a.groupby("source")["doc_id"].count().le(5).all()
    assert (a.groupby("source")["sample_rank"].max()
            == a.groupby("source")["doc_id"].count()).all()
    b = corpus.stratified_sample(SF, per_source=5).to_pandas()
    cols = ["source", "sample_rank"]
    a2 = a.sort_values(cols).reset_index(drop=True)
    b2 = b.sort_values(cols).reset_index(drop=True)
    assert a2.equals(b2)


def test_partitioned_anti_join_multi_key(ray_session):
    """Co-partitioned anti join on a composite key (merge-indicator
    path) drops exactly the left rows whose full key appears right."""
    import ray.data as rd

    from rdf_canon_ray.stages.joins import partitioned_anti_join

    left = pd.DataFrame(
        {"k1": [1, 1, 2, 2], "k2": ["a", "b", "a", "b"], "v": [10, 11, 12, 13]}
    )
    right = pd.DataFrame({"k1": [1, 2], "k2": ["b", "a"]})
    out = partitioned_anti_join(
        rd.from_pandas(left), rd.from_pandas(right), on=["k1", "k2"],
        num_buckets=4,
    ).to_pandas()
    kept = sorted(zip(out["k1"], out["k2"]))
    assert kept == [(1, "a"), (2, "b")]


def test_broadcast_asof_floor_boundaries(ray_session):
    """Nearest-below semantics: exact hits match inclusively, probes
    below the axis minimum get the missing sentinels."""
    import ray.data as rd

    from rdf_canon_ray.stages.joins import broadcast_asof_floor

    ds = rd.from_pandas(pd.DataFrame({"id": [1, 2, 3, 4], "x": [0.5, 1.0, 2.5, 99.0]}))
    out = (
        broadcast_asof_floor(
            ds, "x",
            axis_vals=np.array([1.0, 2.0, 3.0]),
            payload=np.array([10, 20, 30], np.int64),
            out_key="k", out_val="v",
        )
        .to_pandas()
        .sort_values("id")
    )
    assert out["k"].tolist() == [-1, 10, 20, 30]
    assert out["v"].tolist() == [-1.0, 1.0, 2.0, 3.0]


def test_length_quantiles_histogram_exact(ray_session):
    """Histogram-based distributed quantiles equal the exact
    sorted-index quantile (quantile_disc convention) per source."""
    import math

    import pyarrow.parquet as pq_mod

    from rdf_canon_ray.pipelines import analytics

    out = (
        analytics.length_quantiles(SF)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    docs = pq_mod.read_table(
        f"{SF}/documents.parquet", columns=["source", "n_chars"]
    ).to_pandas()
    for src, sub in docs.groupby("source"):
        vals = np.sort(sub["n_chars"].to_numpy())
        for name, q in [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]:
            assert out.loc[src, name] == vals[math.ceil(q * len(vals)) - 1]


def test_audio_resample_decimation(ray_session):
    """WAV decimation keeps every factor-th sample exactly; non-audio
    rows pass through with resampled=False."""
    import pyarrow.parquet as pq_mod

    from rdf_canon_ray.pipelines import corpus
    from rdf_canon_ray.stages import multimodal

    raw = pq_mod.read_table(corpus.media_corpus_parquet()).to_pandas()
    out = (
        multimodal.resample_audio(
            __import__("ray").data.from_arrow(
                pq_mod.read_table(corpus.media_corpus_parquet())
            ),
            factor=4,
        )
        .to_pandas()
        .set_index("media_id")
    )
    audio = raw[raw["kind"] == "audio"]
    row = audio.iloc[0]
    orig = multimodal.decode_wav(row["payload"])
    res = multimodal.decode_wav(out.loc[row["media_id"], "payload"])
    assert np.array_equal(res, orig[::4])
    assert out.loc[row["media_id"], "resampled"]
    non_audio = raw[raw["kind"] != "audio"].iloc[0]
    assert not out.loc[non_audio["media_id"], "resampled"]
    assert out.loc[non_audio["media_id"], "payload"] == non_audio["payload"]


def test_top_quality_docs_matches_full_sort(ray_session):
    """Grouped top-k with local-top combiner equals the global
    (quality desc, doc_id asc) per-source selection."""
    from rdf_canon_ray.pipelines import corpus

    got = corpus.top_quality_docs(SF, per_source=3).to_pandas()
    scores = corpus.quality_scores(SF).to_pandas()[["doc_id", "quality"]]
    import pyarrow.parquet as pq_mod

    src = pq_mod.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source"]
    ).to_pandas()
    full = scores.merge(src, on="doc_id").sort_values(
        ["source", "quality", "doc_id"], ascending=[True, False, True]
    )
    exp = full.groupby("source").head(3)
    got_k = sorted(zip(got["source"], got["doc_id"]))
    exp_k = sorted(zip(exp["source"], exp["doc_id"]))
    assert got_k == exp_k
    assert got.groupby("source")["rank"].max().le(3).all()


def test_shuffle_order_is_complete_permutation(ray_session):
    """Global hash ranks form exactly 0..n-1, independent of input
    partitioning."""
    from rdf_canon_ray.pipelines import corpus

    out = corpus.shuffle_order(SF).to_pandas()
    n = len(out)
    assert sorted(out["shuffle_rank"]) == list(range(n))
    out2 = corpus.shuffle_order(SF).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_dedup_incremental_matches_filtered_full(ray_session):
    """Incremental dedup (persisted old-corpus signature index + old-x-old
    candidate pruning) finds exactly the full run's pairs that touch the
    new shard."""
    from rdf_canon_ray.pipelines import corpus

    split = 400
    full = corpus.minhash_pairs(SF).to_pandas()
    expected = full[full["id_b"] >= split].sort_values(
        ["id_a", "id_b"]
    ).reset_index(drop=True)
    inc = (
        corpus.dedup_incremental(SF, split_id=split)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert inc.equals(expected)
    assert (inc["id_b"] >= split).all()
    import os

    # the old-corpus signature index persisted (reused on the next shard)
    tag = "sf0.001"
    assert os.path.isdir(
        f"/tmp/rcr_cache/{tag}/minhash_sigs_lt{split}_k5_p128"
    )


def test_audio_resample_identity_factor(ray_session):
    """factor=1 decimation is the identity on samples (round-trip via
    re-encode)."""
    import pyarrow.parquet as pq_mod
    import ray.data as rd

    from rdf_canon_ray.pipelines import corpus
    from rdf_canon_ray.stages import multimodal

    t = pq_mod.read_table(corpus.media_corpus_parquet())
    out = multimodal.resample_audio(rd.from_arrow(t), factor=1).to_pandas()
    raw = t.to_pandas()
    audio = raw[raw["kind"] == "audio"].iloc[0]
    got = out.set_index("media_id").loc[audio["media_id"], "payload"]
    assert np.array_equal(
        multimodal.decode_wav(got), multimodal.decode_wav(audio["payload"])
    )


def test_top_quality_docs_cap_above_group_size(ray_session):
    """per_source larger than any stratum returns every doc ranked."""
    from rdf_canon_ray.pipelines import corpus

    out = corpus.top_quality_docs(SF, per_source=10**6).to_pandas()
    n_docs = corpus.quality_scores(SF).count()
    assert len(out) == n_docs
    assert (out.groupby("source")["rank"].max()
            == out.groupby("source")["doc_id"].count()).all()


def test_ivf_persisted_matches_in_memory(ray_session):
    """The persisted IVF index (partition-pruned reads) returns results
    byte-identical to the in-memory IVF over the same data, and only
    the probed lists' partition files exist to be read."""
    import os

    from rdf_canon_ray.pipelines import corpus

    in_mem = (
        corpus.ann_ivf_topk(SF)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    persisted = (
        corpus.ann_ivf_persisted(SF)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert persisted.equals(in_mem)
    index_dir = "/tmp/rcr_cache/sf0.001/ivf_index_16"
    assert os.path.exists(f"{index_dir}/centroids.parquet")
    lists = [d for d in os.listdir(index_dir) if d.startswith("list=")]
    assert 1 <= len(lists) <= 16


def test_embed_quantization_reconstruction(ray_session):
    """Int8 quantization: |dequantized − original| ≤ scale/2 per
    element, and the q range stays within int8."""
    import pyarrow.parquet as pq_mod

    from rdf_canon_ray.pipelines import corpus
    from rdf_canon_ray.stages.similarity import quantize_embeddings_int8

    full = quantize_embeddings_int8(corpus._embeddings(SF)).to_pandas()
    raw = pq_mod.read_table(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas().set_index("vec_id")
    assert full["qmin"].ge(-127).all() and full["qmax"].le(127).all()
    for _, row in full.head(20).iterrows():
        x = np.asarray(raw.loc[row["vec_id"], "embedding"], np.float64)
        deq = np.asarray(row["q"], np.float64) * row["scale"]
        # quantization error ≤ exact_scale/2; the emitted scale is
        # rounded to 6dp, adding up to 127·5e-7 of dequantization slack
        exact_scale = np.abs(x).max() / 127.0
        assert np.abs(deq - x).max() <= exact_scale / 2 + 127 * 5e-7


def test_hll_sketch_accuracy_and_mergeability(ray_session):
    """HLL at p=12 (σ≈1.6%): 100k distinct values per key estimate
    within 5% of truth, the estimate equals the single-shot register
    estimate exactly (merge of batch partials is lossless), and batch
    split does not change the result (associative merge)."""
    import ray.data as rd

    from rdf_canon_ray.stages.sketch import (
        _estimate,
        _hash64,
        _registers,
        approx_distinct,
    )

    n = 100_000
    df = pd.DataFrame(
        {
            "k": np.repeat(["a", "b"], n),
            "v": [f"a{i}" for i in range(n)]
            + [f"b{i}" for i in range(n // 2)] * 2,
        }
    )
    truth = {"a": n, "b": n // 2}
    outs = []
    for bs in (1024, 32768):
        ds = rd.from_pandas(df.sample(frac=1.0, random_state=bs))
        got = (
            approx_distinct(ds, "k", "v", p=12, num_buckets=2)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        outs.append(got)
        for _, row in got.iterrows():
            t = truth[row["k"]]
            assert abs(row["approx_distinct"] - t) / t < 0.05
    # batch split / row order must not change the merged estimate
    assert outs[0].equals(outs[1])
    # distributed merge == single-shot sketch of the full value set
    vals = pd.Series([f"a{i}" for i in range(n)])
    single = _estimate(_registers(_hash64(vals), 12), 12)
    assert single == int(
        outs[0].loc[outs[0]["k"] == "a", "approx_distinct"].iloc[0]
    )


def test_approx_distinct_matches_exact_small_vocab(ray_session):
    """On the sf0.001 corpus the vocabulary is far below 2.5·2^p, so
    linear counting makes the sketch EXACT — byte-for-byte equal to the
    oracle-checked exact companion."""
    from rdf_canon_ray.pipelines import analytics

    ap = (
        analytics.approx_distinct_terms(SF)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    ex = (
        analytics.distinct_terms_by_source(SF)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    m = ap.merge(ex, on="source")
    assert len(m) == len(ap) == len(ex)
    assert (m["approx_distinct"] == m["distinct_terms"]).all()


def test_hash_join_mixed_key_dtypes(ray_session):
    """Keys arriving int64 on one side and float64 on the other (an
    upstream join's null-widening does this) must still meet in the
    same bucket — regression for silent row drops from dtype-sensitive
    bucket hashing."""
    import ray.data as rd

    from rdf_canon_ray.stages.joins import hash_join

    left = rd.from_pandas(
        pd.DataFrame({"k": np.arange(200, dtype=np.int64), "a": 1})
    )
    right = rd.from_pandas(
        pd.DataFrame(
            {"k": np.arange(0, 400, 2, dtype=np.float64), "b": 2}
        )
    )
    out = hash_join(left, right, on="k", num_buckets=8).to_pandas()
    # every even left key (100 of them) matches exactly once
    assert len(out) == 100
    assert sorted(out["k"].astype(int)) == list(range(0, 200, 2))


def test_value_quantiles_error_bound(ray_session):
    """Log-binned quantile estimates land within one bin (≤ ~2.2%
    relative at res=32, plus the half-bin representative offset) of the
    exact discrete quantile."""
    from rdf_canon_ray.pipelines import analytics

    got = analytics.value_quantiles(SF).to_pandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    for etype, sub in ev.groupby("event_type"):
        v = np.sort(sub["value"].to_numpy())
        for q, col in ((0.5, "p50_est"), (0.9, "p90_est"), (0.99, "p99_est")):
            exact = v[int(np.ceil(q * len(v))) - 1]
            est = got.loc[etype, col]
            assert abs(est - exact) / exact < 0.03, (etype, col, est, exact)


def test_heavy_hitters_mg_guarantee(ray_session, tmp_path):
    """Two-pass heavy hitters returns EXACTLY the terms with frequency
    > N/capacity, with exact counts, on a skewed vocabulary spread over
    enough rows to force many per-batch MG compressions."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rdf_canon_ray.pipelines import analytics

    rng = np.random.default_rng(7)
    vocab = [f"w{i:04d}" for i in range(3000)]
    # zipf-ish: head terms dominate
    weights = 1.0 / np.arange(1, len(vocab) + 1) ** 1.3
    weights /= weights.sum()
    texts = [
        " ".join(rng.choice(vocab, size=40, p=weights)) for _ in range(4000)
    ]
    pq.write_table(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}),
        str(tmp_path / "documents.parquet"),
    )

    got = (
        analytics.heavy_hitters(str(tmp_path), capacity=64)
        .to_pandas()
        .set_index("term")["n"]
        .sort_index()
    )
    toks = pd.Series(" ".join(texts).split())
    exact = toks.value_counts()
    expect = exact[exact > len(toks) / 64].sort_index()
    assert list(got.index) == list(expect.index)
    assert (got.to_numpy() == expect.to_numpy()).all()


def test_user_retention_hand_case(ray_session, tmp_path):
    """Cohort cells match a hand-computed case: two cohorts, one
    returning user, week arithmetic exact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rdf_canon_ray.pipelines import analytics

    W = 604800
    ts = pd.to_datetime(
        [
            10 * W + 5,        # u1 cohort week 10
            11 * W + 12,       # u1 back in week 11 (offset 1)
            10 * W + 99,       # u2 cohort week 10
            12 * W + 1,        # u3 cohort week 12
            12 * W + 2,        # u3 same week again (distinct-user once)
        ],
        unit="s",
    )
    pq.write_table(
        pa.table({"user_id": [1, 1, 2, 3, 3], "ts": ts}),
        str(tmp_path / "events.parquet"),
    )
    got = (
        analytics.user_retention(str(tmp_path))
        .to_pandas()
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    expect = pd.DataFrame(
        {
            "cohort_week": [10, 10, 12],
            "week_offset": [0, 1, 0],
            "n_users": [2, 1, 1],
        }
    )
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_user_top_event_type_tie_break(ray_session, tmp_path):
    """Grouped mode breaks count ties lexicographically."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rdf_canon_ray.pipelines import analytics

    pq.write_table(
        pa.table(
            {
                "user_id": [1, 1, 1, 2, 2, 2, 2],
                "event_type": ["b", "a", "b", "z", "a", "z", "a"],
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = (
        analytics.user_top_event_type(str(tmp_path))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert list(got["top_event_type"]) == ["b", "a"]  # u2: a==z tie → a
    assert list(got["n"]) == [2, 2]


def test_top_bigram_pmi_matches_bruteforce(ray_session, tmp_path):
    """PMI top-k matches an exact pandas recompute on a corpus with a
    planted collocation (rare pair always adjacent → top PMI)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rdf_canon_ray.pipelines import analytics

    rng = np.random.default_rng(3)
    common = [f"c{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(common, size=25)) + " neo tokyo"
        for _ in range(40)
    ]
    pq.write_table(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}),
        str(tmp_path / "documents.parquet"),
    )
    got = analytics.top_bigram_pmi(str(tmp_path), min_count=5, k=10).to_pandas()

    toks = [t.split() for t in texts]
    uni = pd.Series([w for t in toks for w in t]).value_counts()
    bg = pd.Series(
        [f"{a}\x00{b}" for t in toks for a, b in zip(t[:-1], t[1:])]
    ).value_counts()
    N, B = uni.sum(), bg.sum()
    rows = []
    for key, c12 in bg.items():
        if c12 < 5:
            continue
        w1, w2 = key.split("\x00")
        pmi = np.log((c12 / B) / ((uni[w1] / N) * (uni[w2] / N)))
        rows.append((w1, w2, int(c12), round(float(pmi), 6)))
    exp = (
        pd.DataFrame(rows, columns=["w1", "w2", "n_pair", "pmi"])
        .sort_values(["pmi", "w1", "w2"], ascending=[False, True, True])
        .head(10)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp, check_dtype=False
    )
    assert (got.iloc[0]["w1"], got.iloc[0]["w2"]) == ("neo", "tokyo")


def test_monthly_revenue_growth_hand_case(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rdf_canon_ray.pipelines import analytics

    dates = pd.to_datetime(
        ["2024-01-05", "2024-01-20", "2024-02-10", "2024-04-01"]
    )
    pq.write_table(
        pa.table({"o_orderdate": dates, "o_totalprice": [100.0, 50.0, 300.0, 75.0]}),
        str(tmp_path / "orders.parquet"),
    )
    got = (
        analytics.monthly_revenue_growth(str(tmp_path))
        .to_pandas()
        .sort_values("month")
        .reset_index(drop=True)
    )
    assert list(got["month"]) == [202401, 202402, 202404]
    assert list(got["revenue"]) == [150.0, 300.0, 75.0]
    assert np.isnan(got["growth"].iloc[0])
    assert got["growth"].iloc[1] == 1.0
    assert got["growth"].iloc[2] == -0.75


def test_ed1_pairs_substitution_indel_and_cap(ray_session):
    """Deletion-neighborhood blocking finds exactly the ED==1 pairs,
    including insert/delete pairs of differing length; oversized key
    groups are dropped with a metrics count, not silently."""
    import itertools

    import ray.data as rd

    from rdf_canon_ray.stages.dedup import ed1_pairs
    from rdf_canon_ray.state import metrics

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    names = [
        "alpha", "alpho", "alphaa", "alph", "beta", "betas", "bet",
        "gamma", "gama", "x", "", "xy", "delta",
    ]
    df = pd.DataFrame({"name": names})
    got = ed1_pairs(rd.from_pandas(df), "name", num_buckets=4).to_pandas()
    got_pairs = set(zip(got["name_a"], got["name_b"]))
    expect = {
        (a, b)
        for a, b in itertools.combinations(sorted(names), 2)
        if lev(a, b) == 1
    }
    assert got_pairs == expect
    assert ("alph", "alpha") in got_pairs and ("", "x") in got_pairs

    # group cap: 40 names all sharing a deletion key -> dropped + counted
    metrics.ensure()
    base = metrics.read().get("ed1_groups_dropped", 0)
    many = pd.DataFrame({"name": [f"q{i:02d}" for i in range(40)]})
    out = ed1_pairs(
        rd.from_pandas(many), "name", num_buckets=2, group_cap=8
    ).to_pandas()
    assert metrics.read().get("ed1_groups_dropped", 0) > base


def test_bfs_depths_matches_pandas_bfs(ray_session):
    """Resident-graph BFS levels equal a driver-side BFS recompute from
    the co-mention edge list (sf0.001), including the early-exit path."""
    from collections import deque

    from rdf_canon_ray.pipelines import graph

    edges = graph.comention_edges(SF).to_pandas()
    adj: dict = {}
    for a, b in zip(edges["e1"], edges["e2"]):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {n: len(s) for n, s in adj.items()}
    seed = sorted(deg, key=lambda n: (-deg[n], n))[0]
    depth = {seed: 0}
    q = deque([seed])
    while q:
        u = q.popleft()
        if depth[u] >= 4:
            continue
        for v in adj[u]:
            if v not in depth:
                depth[v] = depth[u] + 1
                q.append(v)
    got = graph.bfs_depths(SF).to_pandas()
    got_map = dict(zip(got["entity_iri"], got["depth"]))
    assert got_map == depth


def test_events_value_percentile_ties_and_singletons(ray_session, tmp_path):
    """PERCENT_RANK semantics: ties share a rank, single-row partitions
    get 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rdf_canon_ray.pipelines import analytics

    pq.write_table(
        pa.table(
            {
                "event_id": [1, 2, 3, 4, 5, 6],
                "event_type": ["a", "a", "a", "a", "b", "a"],
                "value": [1.0, 2.0, 2.0, 3.0, 9.9, 0.5],
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = (
        analytics.events_value_percentile(str(tmp_path))
        .to_pandas()
        .set_index("event_id")["pct_rank"]
    )
    assert got[6] == 0.0 and got[1] == 0.25
    assert got[2] == got[3] == 0.5  # tie -> shared min rank
    assert got[4] == 1.0
    assert got[5] == 0.0  # singleton partition


def test_search_topk_matches_bruteforce(ray_session, tmp_path):
    """TF-IDF retrieval equals an exact pandas recompute, including
    query-term selection by top document frequency."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rdf_canon_ray.pipelines import analytics

    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(50)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 30)))
        for _ in range(300)
    ]
    pq.write_table(
        pa.table({"doc_id": list(range(300)), "text": texts}),
        str(tmp_path / "documents.parquet"),
    )
    got = analytics.search_topk(str(tmp_path)).to_pandas().reset_index(drop=True)

    toks = [t.split() for t in texts]
    df = pd.Series([w for t in toks for w in set(t)]).value_counts()
    q = df.reset_index()
    q.columns = ["term", "df"]
    q = q.sort_values(["df", "term"], ascending=[False, True]).head(3)
    idf = {t: np.log(300.0 / d) for t, d in zip(q["term"], q["df"])}
    scores = {}
    for i, t in enumerate(toks):
        s = sum(
            np.float64(sum(1 for w in t if w == term)) * widf
            for term, widf in idf.items()
            if term in t
        )
        if s:
            scores[i] = round(float(s), 6)
    exp = (
        pd.DataFrame(
            {"doc_id": list(scores), "score": list(scores.values())}
        )
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_curate_corpus_matches_bruteforce(ray_session, docs_df):
    """Flagship curation chain equals a driver-side recompute: quality
    gate, benchmark decontamination, then min-id per 3-gram-Jaccard
    connected component."""
    import itertools

    from rdf_canon_ray.pipelines import corpus
    from rdf_canon_ray.stages import text as tx

    got = set(corpus.curate_corpus(SF).to_pandas()["doc_id"])

    # quality gate (same rounded score the stage computes)
    q = tx.QualityScore()(docs_df[["doc_id", "text"]])
    keep_q = set(q.loc[q["quality"] >= 0.5, "doc_id"])

    # decontamination vs the 10 lowest-id docs of the ORIGINAL corpus
    bench_rows = docs_df.sort_values("doc_id").head(10)
    bench: set = set()
    for t in bench_rows["text"]:
        bench |= tx.Decontaminate.shingles(t, 8)
    texts = dict(zip(docs_df["doc_id"], docs_df["text"]))
    eligible = sorted(
        d for d in keep_q
        if tx.Decontaminate.shingles(texts[d], 8).isdisjoint(bench)
    )

    def sh3(t):
        w = t.split()
        if len(w) < 3:
            return {t}
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    sh = {d: sh3(texts[d]) for d in eligible}
    parent = {d: d for d in eligible}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(eligible, 2):
        inter = len(sh[a] & sh[b])
        if inter and inter / (len(sh[a]) + len(sh[b]) - inter) >= 0.5:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    comps: dict = {}
    for d in eligible:
        comps.setdefault(find(d), []).append(d)
    expect = {min(v) for v in comps.values()} | {
        d for v in comps.values() if len(v) == 1 for d in v
    }
    assert got == expect


def test_embed_covariance_matches_numpy(ray_session):
    """Mergeable-moment covariance equals np.cov (ddof=0) on the full
    matrix."""
    from rdf_canon_ray.pipelines import corpus

    got = corpus.embed_covariance(SF).to_pandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["embedding"])
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    C = np.cov(X, rowvar=False, bias=True)
    for i, j, cov in zip(got["i"], got["j"], got["cov"]):
        assert abs(cov - C[i - 1, j - 1]) < 1e-6, (i, j)
    d = X.shape[1]
    assert len(got) == d * (d + 1) // 2


def test_events_cube_grouping_sets_consistent(ray_session):
    """CUBE internal consistency: each marginal's totals equal the base
    cells' totals, and (ALL, ALL) equals the corpus."""
    from rdf_canon_ray.pipelines import analytics

    got = analytics.events_cube(SF).to_pandas()
    base = got[(got["event_type"] != "ALL") & (got["dow"] != "ALL")]
    t_marg = got[(got["event_type"] != "ALL") & (got["dow"] == "ALL")]
    d_marg = got[(got["event_type"] == "ALL") & (got["dow"] != "ALL")]
    grand = got[(got["event_type"] == "ALL") & (got["dow"] == "ALL")]
    assert len(grand) == 1
    total = base["n_events"].sum()
    assert t_marg["n_events"].sum() == total
    assert d_marg["n_events"].sum() == total
    assert grand["n_events"].iloc[0] == total
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id"])
    assert total == len(ev)


def test_events_value_mad_matches_numpy(ray_session):
    from rdf_canon_ray.pipelines import analytics

    got = (
        analytics.events_value_mad(SF)
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    for t, sub in ev.groupby("event_type"):
        med = np.median(sub["value"])
        mad = np.median(np.abs(sub["value"] - med))
        assert abs(got.loc[t, "median_value"] - med) < 1e-6
        assert abs(got.loc[t, "mad"] - mad) < 1e-6
        assert got.loc[t, "n"] == len(sub)


def test_profile_columns_nulls_and_distincts(ray_session):
    import ray.data as rd

    from rdf_canon_ray.pipelines import analytics

    df = pd.DataFrame(
        {
            "x": [1.0, 2.0, 2.0, np.nan, 5.0],
            "t": pd.to_datetime(
                ["2024-01-01", None, "2024-01-03", "2024-01-03", "2024-01-05"]
            ),
            "s": ["a", "b", None, "b", "c"],
        }
    )
    got = (
        analytics.profile_columns(
            rd.from_pandas(df),
            numeric_cols=["x"],
            epoch_cols=["t"],
            other_cols=["s"],
            num_buckets=2,
        )
        .to_pandas()
        .set_index("col")
    )
    assert (got["n"] == 5).all()
    assert got.loc["x", "n_null"] == 1 and got.loc["x", "n_distinct"] == 3
    assert got.loc["x", "min_v"] == 1.0 and got.loc["x", "max_v"] == 5.0
    assert got.loc["x", "mean_v"] == 2.5
    assert got.loc["t", "n_null"] == 1 and got.loc["t", "n_distinct"] == 3
    day_us = 86_400_000_000
    base = pd.Timestamp("2024-01-01").value // 1000
    assert got.loc["t", "min_v"] == float(base)
    assert got.loc["t", "max_v"] == float(base + 4 * day_us)
    assert got.loc["t", "mean_v"] == 0.0  # sentinel: no epoch mean
    assert got.loc["s", "n_null"] == 1 and got.loc["s", "n_distinct"] == 3
    assert (
        got.loc["s", ["min_v", "max_v", "mean_v"]].to_numpy() == 0.0
    ).all()


def test_leakage_safe_split_clusters_cohere(ray_session):
    from rdf_canon_ray.pipelines import corpus

    got = corpus.leakage_safe_split(SF).to_pandas()
    assert set(got["split"]) <= {"train", "val", "test"}
    groups = corpus.dedup.dup_groups_from_pairs(
        corpus.ngram_jaccard_pairs(SF)
    ).to_pandas()
    assert len(groups) > 0  # sf0.001 corpus contains near-dups
    merged = groups.merge(got, on="doc_id")
    # every member of a near-dup cluster lands in the same split
    assert merged.groupby("rep_id")["split"].nunique().eq(1).all()
    # docs outside any cluster keep the plain content-stable assignment
    plain = corpus.hash_split(SF).to_pandas()
    solo = got[~got["doc_id"].isin(set(groups["doc_id"]))]
    cmp = solo.merge(plain, on="doc_id", suffixes=("", "_plain"))
    assert (cmp["split"] == cmp["split_plain"]).all()


def test_bloom_prefilter_no_false_negatives_and_prunes(ray_session):
    import ray
    import ray.data as rd

    from rdf_canon_ray.stages.joins import bloom_prefilter, build_bloom

    rng = np.random.default_rng(7)
    members = rng.choice(1_000_000, size=500, replace=False).astype(np.int64)
    keys = rd.from_pandas(pd.DataFrame({"k": members}))
    bits_ref = build_bloom(keys, "k", n_bits=1 << 16, k=4)

    probe = pd.DataFrame(
        {"k": np.arange(20_000, dtype=np.int64), "v": np.arange(20_000)}
    )
    kept = bloom_prefilter(
        rd.from_pandas(probe), "k", bits_ref, n_bits=1 << 16, k=4
    ).to_pandas()
    member_set = set(members.tolist())
    true_in_probe = {k for k in probe["k"].tolist() if k in member_set}
    # no false negatives: every true member present in the probe survives
    assert true_in_probe <= set(kept["k"].tolist())
    # and it actually prunes: false-positive rate well under 5% at
    # 500 keys in 65536 bits
    assert len(kept) < len(true_in_probe) + 0.05 * len(probe)


def test_zonemap_prunes_files_and_is_exact(ray_session, tmp_path):
    import ray.data as rd

    from rdf_canon_ray.sources import zonemap

    df = pd.DataFrame(
        {"k": np.arange(10_000, dtype=np.int64), "v": np.arange(10_000)}
    )
    path = str(tmp_path / "by_k")
    zonemap.zone_export(
        rd.from_pandas(df).repartition(8), path, "k"
    )
    files, total = zonemap.zone_select(path, 2_000, 2_500)
    assert total >= 4  # the sorted export produced multiple zones
    assert len(files) < total  # the manifest actually prunes
    got = zonemap.zone_read(path, 2_000, 2_500).to_pandas()
    exp = df[(df["k"] >= 2_000) & (df["k"] < 2_500)]
    assert sorted(got["k"].tolist()) == exp["k"].tolist()
    # edge exactness: empty range and full range
    assert zonemap.zone_read(path, 5, 5).to_pandas().shape[0] == 0
    assert zonemap.zone_read(path, 0, 10_000).to_pandas().shape[0] == 10_000


# ---- property-based checks for the intricate pure kernels ----

def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_verify_ed1_property_matches_levenshtein():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rdf_canon_ray.stages.dedup import _verify_ed1

    words = st.text(alphabet="abc", min_size=0, max_size=6)

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.tuples(words, words), min_size=1, max_size=20))
    def prop(pairs):
        a = np.array([p[0] for p in pairs], dtype=object)
        b = np.array([p[1] for p in pairs], dtype=object)
        got = _verify_ed1(a, b)
        exp = np.array(
            [_levenshtein(x, y) == 1 for x, y in pairs], dtype=bool
        )
        assert got.tolist() == exp.tolist()

    prop()


def test_rolling_min_property_matches_scalar_rabin_karp():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rdf_canon_ray.stages.text import Fingerprint, _md5_64

    fp = Fingerprint(shingle=4)

    def scalar(text: str) -> int:
        k, base, mod = fp.k, fp.base, fp.mod
        if len(text) < k:
            return _md5_64(text)
        best = None
        for i in range(len(text) - k + 1):
            h = 0
            for ch in text[i : i + k]:
                h = (h * base + ord(ch)) % mod
            best = h if best is None else min(best, h)
        return best

    @settings(max_examples=200, deadline=None)
    @given(st.text(min_size=0, max_size=40))
    def prop(text):
        assert fp._rolling_min(text) == scalar(text)

    prop()


def test_rank_with_ties_semantics():
    # the operator's rank kernel (pos − tie_pos + 1) on a tie-heavy
    # frame, asserted against DuckDB's RANK() — the testdata has no
    # exact double ties, so this pins the tie path explicitly
    import duckdb

    df = pd.DataFrame(
        {
            "o_orderpriority": ["a"] * 5 + ["b"] * 3,
            "o_orderkey": np.arange(8, dtype=np.int64),
            "o_totalprice": [9.0, 9.0, 7.0, 7.0, 5.0, 4.0, 4.0, 4.0],
        }
    )
    b = df.sort_values(
        ["o_orderpriority", "o_totalprice", "o_orderkey"],
        ascending=[True, False, True], kind="mergesort",
    )
    pos = b.groupby("o_orderpriority", sort=False).cumcount().to_numpy()
    tie = b.groupby(["o_orderpriority", "o_totalprice"], sort=False).cumcount().to_numpy()
    b = b.assign(price_rank=(pos - tie + 1).astype(np.int64))
    exp = duckdb.sql(
        "SELECT o_orderkey, RANK() OVER (PARTITION BY o_orderpriority "
        "ORDER BY o_totalprice DESC) r FROM df ORDER BY o_orderkey"
    ).df()
    got = b.sort_values("o_orderkey")["price_rank"].to_numpy()
    assert got.tolist() == exp["r"].astype(int).tolist()
    # ranks: a -> 1,1,3,3,5 ; b -> 1,1,1
    assert got.tolist() == [1, 1, 3, 3, 5, 1, 1, 1]


def test_containment_catches_quote_that_jaccard_misses(ray_session):
    import ray.data as rd

    from rdf_canon_ray.stages.dedup import _shingle_set, containment_pairs

    quote = "the quick brown fox jumps over the lazy dog again and again"
    filler = " ".join(f"word{i}" for i in range(200))
    df = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], np.int64),
            "text": [quote, quote + " " + filler, "totally unrelated text here"],
        }
    )
    got = containment_pairs(
        rd.from_pandas(df), threshold=0.8, num_buckets=4
    ).to_pandas()
    # doc1 is fully contained in doc2 → overlap ≈ 1.0 …
    assert [(1, 2)] == list(zip(got["id_a"], got["id_b"]))
    assert got["overlap"].iloc[0] >= 0.9
    # … while the symmetric Jaccard of the same pair is far below 0.5
    sa = _shingle_set(quote, 3, "word")
    sb = _shingle_set(df["text"][1], 3, "word")
    jac = len(sa & sb) / len(sa | sb)
    assert jac < 0.2


def test_global_median_multi_round_narrowing(ray_session):
    from rdf_canon_ray.pipelines.analytics import global_value_median

    got = global_value_median(SF, collect_threshold=10).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["value"])
    v = np.sort(ev["value"].to_numpy(np.float64))
    k = int(np.ceil(0.5 * len(v)))
    assert got["n"].iloc[0] == len(v)
    assert got["median"].iloc[0] == round(float(v[k - 1]), 6)


def test_render_conversations_byte_equal(ray_session):
    from rdf_canon_ray.pipelines import kg

    got = (
        kg.render_conversations(SF)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    ts = pd.read_parquet(kg.transcripts_parquet(SF))
    exp_rows = []
    for conv, sub in ts.groupby("conv_id"):
        s = sub.sort_values(["turn_idx", "text"], kind="mergesort")
        exp_rows.append(
            (conv, "\n".join(r + ": " + t for r, t in zip(s["role"], s["text"])), len(s))
        )
    exp = (
        pd.DataFrame(exp_rows, columns=["conv_id", "text", "n_turns"])
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert got["conv_id"].tolist() == exp["conv_id"].tolist()
    assert got["text"].tolist() == exp["text"].tolist()  # byte equality
    assert got["n_turns"].tolist() == exp["n_turns"].tolist()


def test_bloom_empty_keyset_prunes_everything(ray_session):
    import ray.data as rd

    from rdf_canon_ray.stages.joins import bloom_prefilter, build_bloom

    empty = rd.from_pandas(pd.DataFrame({"k": pd.Series([], dtype=np.int64)}))
    bits_ref = build_bloom(empty, "k", n_bits=1 << 12, k=4)
    probe = rd.from_pandas(pd.DataFrame({"k": np.arange(50, dtype=np.int64)}))
    kept = bloom_prefilter(probe, "k", bits_ref, n_bits=1 << 12, k=4).to_pandas()
    assert len(kept) == 0


def test_zone_read_out_of_range_keeps_schema(ray_session, tmp_path):
    import ray.data as rd

    from rdf_canon_ray.sources import zonemap

    df = pd.DataFrame({"k": np.arange(100, dtype=np.int64), "v": np.arange(100)})
    path = str(tmp_path / "zs")
    zonemap.zone_export(rd.from_pandas(df).repartition(4), path, "k")
    out = zonemap.zone_read(path, 10_000, 20_000)
    assert out.count() == 0
    # schema-stable at the Dataset level (this Ray build's to_pandas
    # drops columns for fully-empty datasets; schema() does not)
    assert out.schema().names == ["k", "v"]
    # and further Dataset ops on the empty result keep working
    assert out.select_columns(["k"]).count() == 0


def test_zone_export_rebuilds_on_changed_input(ray_session, tmp_path):
    import ray.data as rd

    from rdf_canon_ray.sources import zonemap

    path = str(tmp_path / "zf")
    df1 = pd.DataFrame({"k": np.arange(50, dtype=np.int64), "v": np.arange(50)})
    zonemap.zone_export(rd.from_pandas(df1).repartition(2), path, "k")
    assert zonemap.zone_read(path, 0, 1000).count() == 50
    # same path, CHANGED input → must rebuild, not serve the stale copy
    df2 = pd.DataFrame(
        {"k": np.arange(80, dtype=np.int64), "v": np.arange(80)}
    )
    zonemap.zone_export(rd.from_pandas(df2).repartition(2), path, "k")
    assert zonemap.zone_read(path, 0, 1000).count() == 80
    # unchanged input → idempotent (manifest fingerprint matches)
    zonemap.zone_export(rd.from_pandas(df2).repartition(2), path, "k")
    assert zonemap.zone_read(path, 0, 1000).count() == 80


def test_incremental_bucket_cap_prefers_new_ids():
    from rdf_canon_ray.stages.dedup import _pairs_from_buckets

    # one hot band group: 30 old ids (0..29) + 2 new ids (100, 101);
    # cap 10 would previously keep ids[:10] = all-old and then skip the
    # group as old-only, losing the new-new/new-old candidate pairs
    bucket = pd.DataFrame(
        {
            "band_id": np.zeros(32, np.int32),
            "band_hash": np.zeros(32, np.int64),
            "doc_id": np.r_[np.arange(30), [100, 101]].astype(np.int64),
        }
    )
    out = _pairs_from_buckets(
        bucket, "doc_id", bucket_cap=10, min_new_id=100
    )
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (100, 101) in pairs  # new×new pair survives
    # new ids pair with the kept old ids too
    assert any(b == 100 for _, b in pairs if _ < 100)


def test_global_median_max_heavy_large_magnitude(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from rdf_canon_ray.pipelines.analytics import global_value_median

    # mass at the exact column max, magnitude where an absolute 1e-9
    # epsilon is sub-ulp — the case the nextafter fix covers
    vals = np.array([1e7] * 5 + [1.0], np.float64)
    pq_.write_table(
        pa.table({"value": vals}), str(tmp_path / "events.parquet")
    )
    got = global_value_median(str(tmp_path)).to_pandas()
    k = int(np.ceil(0.5 * len(vals)))
    assert got["median"].iloc[0] == round(float(np.sort(vals)[k - 1]), 6)
    assert got["n"].iloc[0] == len(vals)


def test_events_type_ntile_matches_pandas_ntile(ray_session):
    from rdf_canon_ray.pipelines.analytics import events_type_ntile

    sf = "/root/testdata/sf0.001"
    got = (
        events_type_ntile(sf, k=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    rows = []
    for _, sub in ev.groupby("event_type"):
        s = sub.sort_values(["value", "event_id"]).reset_index(drop=True)
        n, k = len(s), 4
        big, rem = n // k + 1, n % k
        for i in range(n):
            tile = i // big if i < big * rem else rem + (i - big * rem) // max(n // k, 1)
            rows.append((int(s["event_id"][i]), tile + 1))
    exp = (
        pd.DataFrame(rows, columns=["event_id", "tile"])
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got["event_id"].tolist() == exp["event_id"].tolist()
    assert got["tile"].tolist() == exp["tile"].tolist()
    # SQL NTILE invariant: per type, tile sizes differ by at most 1
    # and are non-increasing in tile index
    m = got.merge(ev[["event_id", "event_type"]], on="event_id")
    for _, sub in m.groupby("event_type"):
        sizes = sub.groupby("tile").size()
        assert sizes.max() - sizes.min() <= 1
        assert (sizes.diff().dropna() <= 0).all()


def test_audience_setops_matches_python_sets(ray_session):
    from rdf_canon_ray.pipelines.analytics import audience_setops

    sf = "/root/testdata/sf0.001"
    got = audience_setops(sf, t1="purchase", t2="error").to_pandas()
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "event_type"])
    a = set(ev.loc[ev["event_type"] == "purchase", "user_id"])
    b = set(ev.loc[ev["event_type"] == "error", "user_id"])
    inter = set(got.loc[got["op"] == "intersect", "user_id"])
    exc = set(got.loc[got["op"] == "except", "user_id"])
    assert inter == (a & b)
    assert exc == (a - b)
    assert len(got) == len(inter) + len(exc)


def test_chunk_documents_overlap_and_reconstruction(ray_session):
    from rdf_canon_ray.pipelines.corpus import chunk_documents

    sf = "/root/testdata/sf0.001"
    chunk, stride = 32, 24
    got = chunk_documents(sf, chunk=chunk, stride=stride).to_pandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    assert set(got["doc_id"]) == set(docs["doc_id"])
    by_doc = dict(zip(docs["doc_id"], docs["text"]))
    for did, sub in got.groupby("doc_id"):
        s = sub.sort_values("chunk_idx")
        toks = by_doc[did].split()
        # stride-prefixes of every chunk but the last reconstruct the doc
        parts = [c.split()[:stride] for c in s["chunk_text"][:-1]]
        rebuilt = [t for p in parts for t in p] + s["chunk_text"].iloc[-1].split()
        assert rebuilt == toks
        # consecutive chunks overlap by chunk - stride tokens
        texts = s["chunk_text"].tolist()
        for a, b in zip(texts, texts[1:]):
            at, bt = a.split(), b.split()
            if len(at) == chunk:
                assert at[stride:] == bt[: chunk - stride]
        assert (s["n_tokens"].to_numpy() == [len(t.split()) for t in texts]).all()
        # no chunk is fully contained in its predecessor: each chunk's
        # end offset (start + n_tokens) strictly increases
        ends = s["chunk_idx"].to_numpy() * stride + s["n_tokens"].to_numpy()
        assert (np.diff(ends) > 0).all()
        # the final chunk reaches end-of-doc and no start lies past it
        assert ends[-1] == len(toks)


def test_snapshot_upsert_merge_semantics(ray_session):
    import hashlib

    from rdf_canon_ray.pipelines.corpus import snapshot_upsert

    sf = "/root/testdata/sf0.001"
    got = snapshot_upsert(sf).to_pandas().set_index("doc_id")["merged_hash"]
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    base = dict(zip(docs["doc_id"], docs["text"]))
    # scalar MERGE replay: delete %13, update %7 (of survivors), insert %11
    exp = {}
    for did, txt in base.items():
        if did % 13 == 0:
            continue
        exp[did] = md5(txt + " v2") if did % 7 == 0 else md5(txt)
    for did, txt in base.items():
        if did % 11 == 0:
            exp[did + 1_000_000] = md5(txt)
    assert dict(got) == exp
    # MERGE invariants: no deleted id survives, every insert id present
    assert not any(k % 13 == 0 and k < 1_000_000 for k in got.index)
    assert {k for k in got.index if k >= 1_000_000} == {
        k + 1_000_000 for k in base if k % 11 == 0
    }


def test_search_bm25_matches_scalar_reference(ray_session):
    from collections import Counter

    from rdf_canon_ray.pipelines.analytics import search_bm25

    sf = "/root/testdata/sf0.001"
    k1, b = 1.2, 0.75
    got = search_bm25(sf, k=10, k1=k1, b=b).to_pandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    toks = {d: t.split() for d, t in zip(docs["doc_id"], docs["text"])}
    n = float(len(docs))
    avgdl = sum(len(t) for t in toks.values()) / n
    df = Counter()
    for t in toks.values():
        df.update(set(t))
    qterms = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    scores = {}
    for did, t in toks.items():
        tf = Counter(w for w in t if w in dict(qterms))
        s = 0.0
        for term, d in qterms:
            f = tf.get(term, 0)
            if f:
                idf = np.log((n - d + 0.5) / (d + 0.5) + 1.0)
                s += idf * f * (k1 + 1.0) / (
                    f + k1 * (1.0 - b + b * len(t) / avgdl)
                )
        if s > 0:
            scores[did] = round(s, 6)
    exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["doc_id"], got["score"])) == exp
    # BM25 sanity: tf saturation means score < idf * (k1 + 1) per term
    max_possible = sum(
        np.log((n - d + 0.5) / (d + 0.5) + 1.0) * (k1 + 1.0) for _, d in qterms
    )
    assert (got["score"] < max_possible).all()


def test_doc_unigram_xent_matches_scalar_lm(ray_session):
    from collections import Counter

    from rdf_canon_ray.pipelines.analytics import doc_unigram_xent

    sf = "/root/testdata/sf0.001"
    got = doc_unigram_xent(sf).to_pandas().set_index("doc_id")["xent"]
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    toks = {d: t.split() for d, t in zip(docs["doc_id"], docs["text"])}
    counts = Counter(w for t in toks.values() for w in t)
    total = float(sum(counts.values()))
    for did, t in toks.items():
        xent = sum(-np.log(counts[w] / total) for w in t) / len(t)
        assert got[did] == round(xent, 6), did
    # information-theoretic floor: mean xent >= distribution entropy is
    # not guaranteed per-doc, but every xent is positive and bounded by
    # the rarest token's surprisal
    assert (got > 0).all()
    assert got.max() <= -np.log(1.0 / total) + 1e-9


def test_shipping_priority_matches_pandas_q3(ray_session):
    from rdf_canon_ray.pipelines.analytics import shipping_priority

    sf = "/root/testdata/sf0.001"
    seg, d, k = "BUILDING", pd.Timestamp("1998-06-01"), 10
    got = shipping_priority(sf, segment=seg, cutoff=str(d.date()), k=k).to_pandas()
    cust = pd.read_parquet(f"{sf}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    orders = pd.read_parquet(f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = pd.read_parquet(f"{sf}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
    o = orders[orders["o_orderdate"] < d].merge(
        cust[cust["c_mktsegment"] == seg], left_on="o_custkey", right_on="c_custkey"
    )
    l = li[li["l_shipdate"] > d].copy()
    l["revenue"] = l["l_extendedprice"] * (1 - l["l_discount"])
    j = l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    g = j.groupby(["l_orderkey", "o_orderdate"])["revenue"].sum().reset_index()
    g["revenue"] = g["revenue"].round(4)
    exp = g.sort_values(
        ["revenue", "o_orderdate", "l_orderkey"], ascending=[False, True, True]
    ).head(k).reset_index(drop=True)
    assert got["l_orderkey"].tolist() == exp["l_orderkey"].tolist()
    assert got["revenue"].tolist() == exp["revenue"].tolist()
    assert got["o_orderdate"].tolist() == exp["o_orderdate"].tolist()
