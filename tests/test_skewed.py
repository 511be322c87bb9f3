"""Skew + escaping torture: Zipf conversation lengths, hot conversations,
unicode/control chars surviving byte-identical through canonicalization."""

import numpy as np


def test_skewed_corpus_canonicalizes(ray_session):
    from rdf_canon_ray.core import nquads
    from rdf_canon_ray.transcripts.gen_skewed import (
        build_skewed_transcripts,
        skewed_canonical_graphs,
    )

    df = build_skewed_transcripts(n_convs=300, hot_convs=2, hot_len=800)
    assert df.groupby("conv_id").size().max() == 800

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rdf_canon_ray.stages.canonicalize import canonicalize_graphs
    from rdf_canon_ray.transcripts.gen_skewed import skewed_quads

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    quads = ds.map_batches(skewed_quads, batch_format="pandas", batch_size=8192)
    out = canonicalize_graphs(quads, num_buckets=8, structure=True).to_pandas()
    assert len(out) == 300
    assert (out["status"] == "ok").all()

    # per-turn text equality: every source text round-trips byte-identical
    # through canonical N-Quads escaping (parse the docs back).
    texts_by_conv = df.groupby("conv_id")["text"].apply(set)
    checked = 0
    for _, row in out.head(50).iterrows():
        got = {
            q[4]
            for q in nquads.parse(row["canon_nquads"])
            if q[2] == "urn:rel:text"
        }
        assert got == texts_by_conv[row["graph_id"]]
        checked += 1
    assert checked == 50

    # determinism under skew
    out2 = canonicalize_graphs(quads, num_buckets=8, structure=True).to_pandas()
    a = out.sort_values("graph_id")["canon_nquads"].reset_index(drop=True)
    b = out2.sort_values("graph_id")["canon_nquads"].reset_index(drop=True)
    assert a.equals(b)
