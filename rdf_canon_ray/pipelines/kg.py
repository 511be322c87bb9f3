"""Flagship pipeline: transcripts → triples → canonical graphs → entities.

Ray-Data-first lifecycle (SURVEY.md §3.4):

    read_parquet(transcripts)                 # or build_transcripts (map-only)
    → map_batches(MentionExtractor)           # actor pool, compiled regexes
    → map_batches(EntityLinker)               # actor pool, broadcast dicts
    → [triples view]  (map-only)              # SQL-oracle-checkable
    → groupby(graph_id).map_groups(canonicalize)   # THE shuffle
    → write_parquet sinks (partitioned, resumable)

Cross-partition entity canonicalization: entity IRIs are already
corpus-canonical (linking resolves surfaces to keys), so the cross-graph
step is a groupby-aggregate over entity IRIs (mention counts / degree),
not a join.
"""

from __future__ import annotations

import os
from typing import Optional

import ray
import ray.data as rd

from ..stages.canonicalize import canonicalize_graphs
from ..transcripts.extract import EntityLinker, MentionExtractor, build_link_maps
from ..transcripts.gen import build_transcripts, transcripts_parquet

_EXTRACT_KW = dict(batch_format="pandas", batch_size=8192)


def transcripts_dataset(sf_dir: str, materialized: bool = True) -> rd.Dataset:
    """Transcript table for ``sf_dir`` — from the parquet cache when
    materialized (bench path; lets reruns skip generation), else built
    inline (map-only)."""
    if materialized:
        return rd.read_parquet(transcripts_parquet(sf_dir))
    return build_transcripts(sf_dir)


def mentions_dataset(sf_dir: str, transcripts: Optional[rd.Dataset] = None) -> rd.Dataset:
    ds = transcripts if transcripts is not None else transcripts_dataset(sf_dir)
    return ds.map_batches(MentionExtractor, concurrency=(1, 8), **_EXTRACT_KW)


def quads_dataset(sf_dir: str, transcripts: Optional[rd.Dataset] = None) -> rd.Dataset:
    maps_ref = ray.put(build_link_maps(sf_dir))
    return mentions_dataset(sf_dir, transcripts).map_batches(
        EntityLinker,
        fn_constructor_kwargs={"maps_ref": maps_ref, "output": "quads"},
        concurrency=(1, 8),
        **_EXTRACT_KW,
    )


def links_dataset(sf_dir: str, transcripts: Optional[rd.Dataset] = None) -> rd.Dataset:
    maps_ref = ray.put(build_link_maps(sf_dir))
    return mentions_dataset(sf_dir, transcripts).map_batches(
        EntityLinker,
        fn_constructor_kwargs={"maps_ref": maps_ref, "output": "links"},
        concurrency=(1, 8),
        **_EXTRACT_KW,
    )


def triples_dataset(sf_dir: str, transcripts: Optional[rd.Dataset] = None) -> rd.Dataset:
    """Distinct extracted (conv_id, subj, pred, obj) IRI/literal triples —
    the SQL-oracle-checked extraction product.  Set semantics via
    per-batch dedup (cheap combiner) then a grouped global dedup."""
    import pandas as pd

    quads = quads_dataset(sf_dir, transcripts)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        sel = batch[batch["s_kind"] == 0]  # IRI-subject rows only
        out = pd.DataFrame(
            {
                "conv_id": sel["graph_id"],
                "subj": sel["s"],
                "pred": sel["p"],
                "obj": sel["o"],
            }
        )
        return out.drop_duplicates()

    from ..stages.shuffle import distinct

    projected = quads.map_batches(project, batch_format="pandas", batch_size=16384)
    return distinct(projected, ["conv_id", "subj", "pred", "obj"])


def distinct_links_dataset(
    sf_dir: str, transcripts: Optional[rd.Dataset] = None
) -> rd.Dataset:
    """Distinct (conv_id, surface, entity_iri) resolved entity links —
    SQL-oracle-checkable (score dropped; ambiguity scores are in
    ``links_dataset``)."""
    from ..stages.shuffle import distinct

    links = links_dataset(sf_dir, transcripts).drop_columns(["score"])
    return distinct(links, ["conv_id", "surface", "entity_iri"])


def canonical_graphs_dataset(
    sf_dir: str,
    transcripts: Optional[rd.Dataset] = None,
    hash_name: str = "sha256",
    hndq_call_limit: Optional[int] = None,
) -> rd.Dataset:
    """Per-conversation canonical graphs via the fused fast path: the
    all-to-all exchange moves the compact mentions table; quad expansion
    and RDFC-1.0 run post-shuffle inside each bucket.  (The generic
    quads-table path is ``stages.canonicalize.canonicalize_graphs``,
    used by the N-Quads source and tests.)"""
    from ..stages.canonicalize import canonicalize_mentions

    maps_ref = ray.put(build_link_maps(sf_dir))
    return canonicalize_mentions(
        mentions_dataset(sf_dir, transcripts),
        maps_ref,
        hash_name=hash_name,
        hndq_call_limit=hndq_call_limit,
    )


def entity_mention_counts(sf_dir: str) -> rd.Dataset:
    """Cross-partition entity canonicalization stats: mentions per entity
    IRI across all conversations (groupby-aggregate shuffle on the
    canonical key)."""
    import pandas as pd

    quads = quads_dataset(sf_dir)

    import numpy as np

    from ..stages.shuffle import grouped_agg

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        sel = batch[(batch["p"] == "urn:rel:mentions")]
        return pd.DataFrame(
            {"entity_iri": sel["o"], "n_mentions": np.ones(len(sel), np.int64)}
        )

    projected = quads.map_batches(project, batch_format="pandas", batch_size=32768)
    return grouped_agg(projected, ["entity_iri"], {"n_mentions": "sum"})


def run_kg_pipeline(
    sf_dir: str,
    output_root: Optional[str] = None,
    hndq_call_limit: Optional[int] = None,
) -> rd.Dataset:
    """End-to-end flagship run. When ``output_root`` is given, writes the
    partitioned triple table and the canonical-graph table as resumable
    parquet sinks and returns the canonical graphs Dataset."""
    transcripts = transcripts_dataset(sf_dir)
    graphs = canonical_graphs_dataset(
        sf_dir, transcripts, hndq_call_limit=hndq_call_limit
    )
    if output_root:
        triples = triples_dataset(sf_dir, transcripts)
        triples.write_parquet(os.path.join(output_root, "triples"))
        graphs = graphs.materialize()
        graphs.write_parquet(os.path.join(output_root, "graphs"))
    return graphs
