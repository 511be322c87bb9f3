"""Per-graph RDFC-1.0 canonicalization as a Ray Data grouped transform.

The unit of work is one conversation subgraph (``graph_id``); the RDFC-1.0
state is function-local per group, mirroring the reference's
per-invocation ``CanonicalizationState`` (`/root/reference/src/canon.rs:208`)
— two graphs never share issuer state, which is exactly why this operator
is embarrassingly parallel.

``canonicalize_graphs(quads_ds)`` =
``quads_ds.groupby("graph_id").map_groups(_canonicalize_group)`` — the one
all-to-all shuffle of the KG pipeline.  Graphs whose HNDQ cost exceeds the
call limit are routed to ``status="quarantined"`` instead of failing the
job (the reference's ``HndqCallLimitExceeded`` made recoverable,
`/root/reference/src/error.rs:14-15`).
"""

from __future__ import annotations

import json
from typing import Optional

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..core.canon import (
    CanonicalizationError,
    HndqCallLimitExceeded,
    canonicalize_quads_with_map,
)
from ..core.terms import BNODE, DEFAULT, IRI, LITERAL
from ..transcripts.extract import EntityLinker

# canonical-graph row schema (canonicalize_one's dict): declared
# explicitly so empty buckets never infer null-typed columns
_GRAPH_COLS = (
    "graph_id",
    "canon_nquads",
    "label_map",
    "n_quads",
    "n_bnodes",
    "status",
    "error",
)
_GRAPH_SCHEMA = pa.schema(
    [
        ("graph_id", pa.string()),
        ("canon_nquads", pa.string()),
        ("label_map", pa.string()),
        ("n_quads", pa.int64()),
        ("n_bnodes", pa.int64()),
        ("status", pa.string()),
        ("error", pa.string()),
    ]
)

REL_IDX = "urn:rel:idx"
REL_NEXT = "urn:rel:next"
REL_PART_OF = "urn:rel:partOf"
REL_IN_CONV = "urn:rel:inConversation"
SESSION_LABEL = "session"


def iter_graph_tuples(df: pd.DataFrame):
    """Yield ``(graph_id, quad_tuples)`` per graph from a flat quads
    DataFrame — column arrays are materialized ONCE for the whole frame
    and sliced per graph (pandas per-group ``__getitem__`` was ~36% of
    kernel wall time)."""
    import numpy as np

    if len(df) == 0:
        return
    order = np.argsort(df["graph_id"].to_numpy(), kind="stable")
    gids = df["graph_id"].to_numpy()[order]
    has_g = "g_kind" in df.columns
    names = ["s_kind", "s", "p", "o_kind", "o", "o_dt", "o_lang"]
    if has_g:
        names += ["g_kind", "g"]
    cols = [df[c].to_numpy()[order] for c in names]
    bounds = np.flatnonzero(gids[1:] != gids[:-1]) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(gids)]])
    for a, b in zip(starts, ends):
        if has_g:
            tuples = [
                (int(sk), s, p, int(ok), o, dt or "", lang or "", int(gk), g or "")
                for sk, s, p, ok, o, dt, lang, gk, g in zip(
                    *(c[a:b] for c in cols)
                )
            ]
        else:
            tuples = [
                (int(sk), s, p, int(ok), o, dt or "", lang or "", DEFAULT, "")
                for sk, s, p, ok, o, dt, lang in zip(*(c[a:b] for c in cols))
            ]
        yield gids[a], tuples


def group_to_quads(group: pd.DataFrame) -> list:
    """Flat quad rows → core 9-tuples. Graph-name columns (``g_kind``,
    ``g``) are honored when present (generic N-Quads datasets); KG
    conversation graphs omit them (default graph)."""
    if "g_kind" in group.columns:
        return [
            (int(sk), s, p, int(ok), o, dt or "", lang or "", int(gk), g or "")
            for sk, s, p, ok, o, dt, lang, gk, g in zip(
                group["s_kind"],
                group["s"],
                group["p"],
                group["o_kind"],
                group["o"],
                group["o_dt"],
                group["o_lang"],
                group["g_kind"],
                group["g"],
            )
        ]
    return [
        (int(sk), s, p, int(ok), o, dt or "", lang or "", DEFAULT, "")
        for sk, s, p, ok, o, dt, lang in zip(
            group["s_kind"],
            group["s"],
            group["p"],
            group["o_kind"],
            group["o"],
            group["o_dt"],
            group["o_lang"],
        )
    ]


def add_structure_quads(quads: list, conv_id: str) -> list:
    """Conversation-structure quads built once the group is assembled:
    session hub + stable turn chain.

    Turn nodes are ordered by ``(idx, label)`` — the stable turn ordering
    of the assembly invariant (ties broken by the text-hash label, and
    duplicate turns have already collapsed to one node under set
    semantics).
    """
    turns = sorted(
        {
            (int(q[4]), q[1])
            for q in quads
            if q[2] == REL_IDX and q[0] == BNODE and q[3] == LITERAL
        }
    )
    conv_iri = "urn:conv:" + conv_id
    extra = [
        (BNODE, SESSION_LABEL, REL_IN_CONV, IRI, conv_iri, "", "", DEFAULT, "")
    ]
    for _idx, label in turns:
        extra.append(
            (BNODE, label, REL_PART_OF, BNODE, SESSION_LABEL, "", "", DEFAULT, "")
        )
    for (_, a), (_, b) in zip(turns, turns[1:]):
        extra.append((BNODE, a, REL_NEXT, BNODE, b, "", "", DEFAULT, ""))
    return quads + extra


def canonicalize_one(
    graph_id: str,
    group: pd.DataFrame,
    hash_name: str = "sha256",
    hndq_call_limit: Optional[int] = None,
    structure: bool = False,
) -> dict:
    """Canonicalize one subgraph → one result row (dict).

    ``structure=True`` adds the KG conversation-structure quads (session
    hub + turn chain) before canonicalization; generic RDF datasets pass
    ``False`` and are canonicalized exactly as given.  ``group`` may be a
    quads DataFrame or a prebuilt list of core 9-tuples."""
    quads = group if isinstance(group, list) else group_to_quads(group)
    if structure:
        quads = add_structure_quads(quads, graph_id)
    n_bnodes = len(
        {q[1] for q in quads if q[0] == BNODE}
        | {q[4] for q in quads if q[3] == BNODE}
        | {q[8] for q in quads if q[7] == BNODE}  # bnode graph names
    )
    try:
        doc, label_map = canonicalize_quads_with_map(
            quads, hash_name=hash_name, hndq_call_limit=hndq_call_limit
        )
        status, err = "ok", ""
    except HndqCallLimitExceeded as e:
        doc, label_map, status, err = "", {}, "quarantined", str(e)
    except CanonicalizationError as e:  # pragma: no cover - defensive
        doc, label_map, status, err = "", {}, "error", str(e)
    return {
        "graph_id": graph_id,
        "canon_nquads": doc,
        "label_map": json.dumps(label_map, sort_keys=True),
        "n_quads": len(quads),
        "n_bnodes": n_bnodes,
        "status": status,
        "error": err,
    }


def canonicalize_graphs(
    quads_ds: rd.Dataset,
    hash_name: str = "sha256",
    hndq_call_limit: Optional[int] = None,
    num_buckets: int = 64,
    structure: bool = False,
) -> rd.Dataset:
    """Generic per-graph RDFC-1.0 canonicalization shuffle.

    Graphs are hash-bucketed (``num_buckets`` ≈ 4× total cores at scale)
    so Ray's per-group dispatch cost is paid once per *bucket*; within a
    bucket a pandas groupby loop hands each conversation to the RDFC-1.0
    kernel.  Skewed/poisoned graphs are bounded by ``hndq_call_limit``
    and land in the quarantine status instead of stalling the stage.
    """
    from .shuffle import bucketed_map_groups

    def run_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = [
            canonicalize_one(gid, tuples, hash_name, hndq_call_limit, structure)
            for gid, tuples in iter_graph_tuples(bucket)
        ]
        return pd.DataFrame(rows)

    return bucketed_map_groups(
        quads_ds, ["graph_id"], run_bucket, num_buckets=num_buckets
    )


_LINKER_CACHE: dict = {}


def _cached_linker(maps_ref):
    """Deserialize the broadcast link maps once per worker process (the
    cache key is the object ref), not once per bucket task.

    NOTE: ``EntityLinker`` must be imported at module scope — a lazy
    relative import here would execute on the worker, where the package
    may not be importable (UDFs ship by value, modules don't)."""
    key = maps_ref.hex() if hasattr(maps_ref, "hex") else id(maps_ref)
    linker = _LINKER_CACHE.get(key)
    if linker is None:
        linker = EntityLinker(maps_ref, output="quads")
        _LINKER_CACHE[key] = linker
    return linker


def canonicalize_mentions(
    mentions_ds: rd.Dataset,
    maps_ref,
    hash_name: str = "sha256",
    hndq_call_limit: Optional[int] = None,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Fused fast path: shuffle the COMPACT mentions table (one row per
    mention) by conversation bucket, then expand to quads and
    canonicalize inside the bucket.

    Versus ``canonicalize_graphs`` over a pre-expanded quads table this
    moves ~6× fewer rows/bytes through the all-to-all exchange — the
    quad expansion is recomputed post-shuffle where it is cheap and
    local.  Link maps are broadcast (``ray.put``) and deserialized once
    per worker via ``_cached_linker``.

    Bucket output is an ARROW table (explicit schema): the canonical
    documents are ~0.5 GB of strings at sf0.1 — Arrow blocks store and
    ship them zero-copy through the object store, where pandas object
    columns would pickle (measured ~0.7 s off the sf0.1 headline)."""

    def run_bucket(bucket: pd.DataFrame):
        linker = _cached_linker(maps_ref)
        quads = linker(bucket)
        rows = [
            canonicalize_one(gid, tuples, hash_name, hndq_call_limit, structure=True)
            for gid, tuples in iter_graph_tuples(quads)
        ]
        return pa.table(
            {c: [r[c] for r in rows] for c in _GRAPH_COLS},
            schema=_GRAPH_SCHEMA,
        )

    from .shuffle import bucketed_map_groups

    return bucketed_map_groups(
        mentions_ds, ["conv_id"], run_bucket, num_buckets=num_buckets
    )
