"""Kill/resume test: a failed run leaves completed partitions; the rerun
skips them (mtime-stable) and completes the output."""

import os

import pytest

SF = "/root/testdata/sf0.001"


def test_resume_skips_completed_partitions(ray_session, tmp_path):
    from rdf_canon_ray.pipelines import kg
    from rdf_canon_ray.state.lineage import completed_buckets, read_output

    out = str(tmp_path / "kgout")
    # first run: inject failures in two buckets → run aborts partway
    with pytest.raises(Exception):
        kg.run_kg_resumable(
            SF, out, num_buckets=8, _fail_buckets={2, 5}
        )
    done_after_fail = completed_buckets(os.path.join(out, "graphs"))
    assert 2 not in done_after_fail and 5 not in done_after_fail
    assert len(done_after_fail) >= 1  # some partitions completed

    mtimes = {
        b: os.path.getmtime(os.path.join(out, "graphs", f"bucket={b}"))
        for b in done_after_fail
    }

    # resume without failure injection: completes the remaining buckets
    summary = kg.run_kg_resumable(SF, out, num_buckets=8)
    assert set(summary["bucket"]) == set(range(8))
    skipped = set(summary[summary["status"] == "skipped"]["bucket"])
    assert skipped == done_after_fail
    for b in done_after_fail:  # untouched partitions
        assert (
            os.path.getmtime(os.path.join(out, "graphs", f"bucket={b}"))
            == mtimes[b]
        )

    # final output is complete and matches the in-memory pipeline
    got = read_output(os.path.join(out, "graphs")).to_pandas()
    assert len(got) == 1500
    assert (got["status"] == "ok").all()

    expect = kg.canonical_graphs_dataset(SF).to_pandas()
    a = got.sort_values("graph_id")["canon_nquads"].reset_index(drop=True)
    b = expect.sort_values("graph_id")["canon_nquads"].reset_index(drop=True)
    assert a.equals(b)


def test_stale_lineage_not_skipped(ray_session, tmp_path):
    """Partitions from a different bucket count or input are rewritten,
    not silently mixed into the output."""
    from rdf_canon_ray.pipelines import kg
    from rdf_canon_ray.state.lineage import completed_buckets

    out = str(tmp_path / "kgout2")
    kg.run_kg_resumable(SF, out, num_buckets=4)
    root = os.path.join(out, "graphs")
    assert completed_buckets(root, num_buckets=4, input_tag=SF) == set(range(4))
    # different bucket count or input → stale, nothing skippable
    assert completed_buckets(root, num_buckets=8, input_tag=SF) == set()
    assert completed_buckets(root, num_buckets=4, input_tag="/other") == set()

    # a rerun under a different bucket count rewrites every partition
    summary = kg.run_kg_resumable(SF, out, num_buckets=8)
    assert (summary["status"] == "written").all()


def test_exact_dedup_resumable(ray_session, tmp_path):
    """Corpus dedup writes resumable bucket partitions; a rerun skips
    every completed partition and the output matches the in-memory
    operator."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from rdf_canon_ray.stages.dedup import exact_dedup, run_exact_dedup_resumable
    from rdf_canon_ray.state.lineage import read_output

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    out = str(tmp_path / "dedup_out")
    summary = run_exact_dedup_resumable(docs, out, num_buckets=8, input_tag=SF)
    assert (summary["status"] == "written").all()

    got = read_output(out).to_pandas().sort_values("content_hash")
    expect = exact_dedup(docs).to_pandas().sort_values("content_hash")
    assert got.reset_index(drop=True)[["content_hash", "doc_id", "n_dups"]].equals(
        expect.reset_index(drop=True)[["content_hash", "doc_id", "n_dups"]]
    )

    # rerun: everything skipped, partitions untouched
    summary2 = run_exact_dedup_resumable(docs, out, num_buckets=8, input_tag=SF)
    assert (summary2["status"] == "skipped").all()
