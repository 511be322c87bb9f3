"""Mention detection, triple extraction and entity linking over transcript
batches.

Two Ray stages (both vectorized, both actor pools so regexes/dictionaries
are built once per worker, per SURVEY.md §2.4 "stateful stages"):

* ``MentionExtractor`` — compiled-regex mention detection over the ``text``
  column; emits one mention row per detected pattern with a deterministic
  per-turn blank-node label ``t<idx>-<hash64(text)>`` (so duplicate turns
  collapse to the same turn node under RDF set semantics).
* ``EntityLinker`` — resolves mention surfaces to canonical entity IRIs
  against broadcast dimension dictionaries (``ray.put`` once, ``ray.get``
  in ``__init__``). Ambiguous part names resolve deterministically to the
  MINIMUM matching ``p_partkey`` — the rule the DuckDB oracle reproduces.
  Emits either the flat quads table (``output="quads"``) or a scored link
  table (``output="links"``).

The quads table uses the flat term layout from
``rdf_canon_ray.core.terms`` plus a ``graph_id`` partition key; graph name
is always the default graph (one RDF graph per conversation).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..core.terms import BNODE, IRI, LITERAL

REL = "urn:rel:"
ENT = "urn:e:"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"

RE_USER = re.compile(
    r"^Hello, I am (?P<cust>Customer#\d+)\. Please review order ord-(?P<okey>\d+) from (?P<date>\d{4}-\d{2}-\d{2})\.$"
)
RE_ASSISTANT = re.compile(
    r"^Order ord-(?P<okey>\d+) is (?P<status>\w+) at priority (?P<prio>.+?) with total (?P<total>[0-9.]+)\.$"
)
RE_ITEM = re.compile(
    r'^item (?P<ln>\d+): part "(?P<pname>[^"]+)" brand (?P<brand>\S+) from supplier "(?P<sname>[^"]+)" qty (?P<qty>\d+)$'
)

MENTION_COLS = ["conv_id", "turn_idx", "turn_label", "role", "mtype", "a", "b", "c", "d"]

# Process-level singletons: stateless-task stages reuse these across
# batches within a worker process (same amortization as an actor pool,
# but tasks scale out instantly instead of waiting for pool ramp-up).
_EXTRACTOR_SINGLETON = None


def extract_mentions_batch(batch: pd.DataFrame) -> pd.DataFrame:
    global _EXTRACTOR_SINGLETON
    if _EXTRACTOR_SINGLETON is None:
        _EXTRACTOR_SINGLETON = MentionExtractor()
    return _EXTRACTOR_SINGLETON(batch)


# (role, RE2 pattern, mtype, struct fields, mention slots)
_ARROW_SPECS = [
    ("user", RE_USER.pattern, "order_open", ["cust", "okey"], ["a", "b"]),
    (
        "assistant",
        RE_ASSISTANT.pattern,
        "order_status",
        ["okey", "status", "prio"],
        ["a", "b", "c"],
    ),
    (
        "tool",
        RE_ITEM.pattern,
        "item",
        ["pname", "brand", "sname", "qty"],
        ["a", "b", "c", "d"],
    ),
]


_MENTION_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("turn_label", pa.string()),
        ("role", pa.string()),
        ("mtype", pa.string()),
        ("a", pa.string()),
        ("b", pa.string()),
        ("c", pa.string()),
        ("d", pa.string()),
    ]
)


def extract_mentions_arrow(batch) -> pa.Table:
    """Arrow-native mention extraction: role filter + RE2
    ``pc.extract_regex`` (C++ vectorized, ~3× pandas ``str.extract``);
    output stays an Arrow table end to end — only the text column
    crosses into pandas, for the stable label hash. Used with
    ``batch_format="pyarrow"``."""
    outs = []
    role_arr = batch["role"]
    for role, pattern, mtype, fields, slots in _ARROW_SPECS:
        sub = batch.filter(pc.equal(role_arr, role))
        if sub.num_rows == 0:
            continue
        ext = pc.extract_regex(sub["text"], pattern=pattern)
        valid = pc.is_valid(ext)
        if not pc.any(valid).as_py():
            continue
        sub = sub.filter(valid)
        ext = ext.filter(valid)
        n = sub.num_rows
        labels = turn_labels(
            sub["turn_idx"].to_pandas(), sub["text"].to_pandas()
        )
        cols = {
            "conv_id": pc.cast(sub["conv_id"], pa.string()),
            "turn_idx": pc.cast(sub["turn_idx"], pa.int32()),
            "turn_label": pa.array(labels, pa.string()),
            "role": pa.array([role] * n, pa.string()),
            "mtype": pa.array([mtype] * n, pa.string()),
        }
        for field, slot in zip(fields, slots):
            cols[slot] = pc.cast(pc.struct_field(ext, field), pa.string())
        for slot in ("a", "b", "c", "d"):
            if slot not in cols:
                cols[slot] = pa.array([""] * n, pa.string())
        outs.append(
            pa.table({name: cols[name] for name in MENTION_COLS})
        )
    if not outs:
        return _MENTION_SCHEMA.empty_table()
    return pa.concat_tables(
        [t.cast(_MENTION_SCHEMA) for t in outs]
    )


def turn_labels(turn_idx: pd.Series, text: pd.Series) -> pd.Series:
    """Deterministic per-turn bnode labels: t<idx>-<16-hex hash of text>.

    ``hash_pandas_object`` with the default fixed key is stable across
    processes and runs, so labels agree between workers."""
    h = pd.util.hash_pandas_object(text, index=False)
    return (
        "t"
        + turn_idx.astype(str).to_numpy(dtype=object)
        + "-"
        + np.char.mod("%016x", h.to_numpy())
    )


class MentionExtractor:
    """Regex mention detection; one output row per mention tuple."""

    def __init__(self):
        self.re_user = RE_USER
        self.re_assistant = RE_ASSISTANT
        self.re_item = RE_ITEM

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"]
        labels = turn_labels(batch["turn_idx"], text)
        base = pd.DataFrame(
            {
                "conv_id": batch["conv_id"].to_numpy(dtype=object),
                "turn_idx": batch["turn_idx"].to_numpy(),
                "turn_label": labels,
                "role": batch["role"].to_numpy(dtype=object),
            }
        )
        # Pre-filter by role before the regex pass: each pattern only
        # matches one speaker role, so this cuts regex work ~3×.
        role = batch["role"].to_numpy(dtype=object)
        outs = []

        def run(mask, regex, mtype, slots):
            if not mask.any():
                return
            sub_text = text[mask]
            ext = sub_text.str.extract(regex)
            hit = ext[slots[0][1]].notna()
            if not hit.any():
                return
            part = base[mask][hit.to_numpy()].copy()
            part["mtype"] = mtype
            for col, group in slots:
                part[col] = ext.loc[hit, group].to_numpy(dtype=object)
            for col in ("a", "b", "c", "d"):
                if col not in part.columns:
                    part[col] = ""
            outs.append(part)

        run(role == "user", self.re_user, "order_open",
            [("a", "cust"), ("b", "okey")])
        run(role == "assistant", self.re_assistant, "order_status",
            [("a", "okey"), ("b", "status"), ("c", "prio")])
        run(role == "tool", self.re_item, "item",
            [("a", "pname"), ("b", "brand"), ("c", "sname"), ("d", "qty")])

        if not outs:
            return pd.DataFrame({c: [] for c in MENTION_COLS})
        return pd.concat(outs, ignore_index=True)[MENTION_COLS]


def build_link_maps(sf_dir: str):
    """Dimension dictionaries for entity linking (driver side, broadcast).

    part resolution: (p_name, p_brand) → MIN(p_partkey); part names are
    intentionally ambiguous in the corpus, the min-key rule is the
    deterministic tie-break the oracle replicates. Also records the
    candidate-set size for the link score (1/n_candidates)."""
    import os

    import pyarrow.parquet as pq

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    )
    cust_map = dict(zip(cust["c_name"].to_pylist(), cust["c_custkey"].to_pylist()))

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_name", "p_brand"],
    )
    part_map: dict = {}
    part_count: dict = {}
    for k, n, b in zip(
        part["p_partkey"].to_pylist(),
        part["p_name"].to_pylist(),
        part["p_brand"].to_pylist(),
    ):
        key = (n, b)
        part_count[key] = part_count.get(key, 0) + 1
        if key not in part_map or k < part_map[key]:
            part_map[key] = k

    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
    )
    supp_map = dict(zip(supp["s_name"].to_pylist(), supp["s_suppkey"].to_pylist()))
    return {
        "cust": cust_map,
        "part": part_map,
        "part_count": part_count,
        "supp": supp_map,
    }


_RESOLVED_COLS = ["cust_key", "part_key", "part_cnt", "supp_key"]


def resolve_mentions_partitioned(
    mentions_ds, sf_dir: str, num_buckets: int | None = None
):
    """Mentions + resolved entity keys via CO-PARTITIONED hash joins on
    the surface keys — the above-the-gate linker path where the
    dimension tables are too large for driver dicts (``build_link_maps``
    reads every dimension row to the driver and ``ray.put``s the result;
    at 100 TB the customer/part/supplier dims stream instead).

    Semantics match the broadcast dictionaries exactly: part surfaces
    resolve to MIN(p_partkey) per (p_name, p_brand) with the candidate
    count attached (one small grouped aggregate on the dim side);
    customer/supplier names are unique by construction, so a plain left
    join is the dict lookup.  Output: the mention rows plus nullable
    ``cust_key/part_key/part_cnt/supp_key`` columns (NaN = unresolved),
    which every ``EntityLinker`` emitter prefers over its dicts."""
    import os

    import ray.data as rd

    from ..stages.joins import hash_join
    from ..stages.shuffle import grouped_agg
    from ..util import default_buckets

    nb = num_buckets or default_buckets()

    def pad(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        for c in _RESOLVED_COLS:
            if c not in out.columns:
                out[c] = np.nan
        # the join's internal side-union NaN-pads non-key int columns
        # to float64 (standing trap) — cast turn_idx back before the
        # emitters stringify it
        out["turn_idx"] = out["turn_idx"].astype(np.int32)
        return out[MENTION_COLS + _RESOLVED_COLS]

    # one materialized pass: three filtered branches below would
    # otherwise re-run extraction once per reference
    ments = mentions_ds.materialize()

    def subset(mtype: str):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[batch["mtype"] == mtype]

        return ments.map_batches(f, batch_format="pandas", batch_size=32768)

    cust_dim = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"],
    ).map_batches(
        lambda b: pd.DataFrame(
            {"a": b["c_name"], "cust_key": b["c_custkey"]}
        ),
        batch_format="pandas",
        batch_size=32768,
    )
    part_raw = rd.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_name", "p_brand"],
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "a": b["p_name"],
                "b": b["p_brand"],
                "part_key": b["p_partkey"],
                "part_cnt": np.ones(len(b), np.int64),
            }
        ),
        batch_format="pandas",
        batch_size=32768,
    )
    part_dim = grouped_agg(
        part_raw, ["a", "b"], {"part_key": "min", "part_cnt": "sum"}, nb
    )
    supp_dim = rd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"],
    ).map_batches(
        lambda b: pd.DataFrame(
            {"c": b["s_name"], "supp_key": b["s_suppkey"]}
        ),
        batch_format="pandas",
        batch_size=32768,
    )

    opened = hash_join(
        subset("order_open"), cust_dim, on="a", how="left", num_buckets=nb
    )
    items = hash_join(
        subset("item"), part_dim, on=["a", "b"], how="left", num_buckets=nb
    )
    items = hash_join(items, supp_dim, on="c", how="left", num_buckets=nb)
    status = subset("order_status")

    branches = [
        ds.map_batches(pad, batch_format="pandas", batch_size=32768)
        for ds in (opened, status, items)
    ]
    out = branches[0]
    for b in branches[1:]:
        out = out.union(b)
    return out


QUAD_COLS = ["graph_id", "s_kind", "s", "p", "o_kind", "o", "o_dt", "o_lang"]


def _empty_quads() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "graph_id": pd.Series([], dtype=object),
            "s_kind": pd.Series([], dtype=np.uint8),
            "s": pd.Series([], dtype=object),
            "p": pd.Series([], dtype=object),
            "o_kind": pd.Series([], dtype=np.uint8),
            "o": pd.Series([], dtype=object),
            "o_dt": pd.Series([], dtype=object),
            "o_lang": pd.Series([], dtype=object),
        }
    )


_TRIPLES_SCHEMA = pa.schema(
    [("conv_id", pa.string()), ("subj", pa.string()),
     ("pred", pa.string()), ("obj", pa.string())]
)
_MENTION_IRI_SCHEMA = pa.schema(
    [("conv_id", pa.string()), ("entity_iri", pa.string())]
)
_LINKS_SCHEMA = pa.schema(
    [("conv_id", pa.string()), ("surface", pa.string()),
     ("entity_iri", pa.string()), ("score", pa.float64())]
)


class EntityLinker:
    """Mentions → quads (or scored links). Dictionaries broadcast once.

    Pandas emission (``_quads``/``_triples``/…) is used post-shuffle in
    the flagship bucket kernel; the ``*_arrow`` twins keep the
    pre-shuffle link stage zero-copy Arrow end to end (C++ ``index_in``
    dictionary lookups, no Python-object column boxing)."""

    def __init__(self, maps_ref, output: str = "quads"):
        maps = ray.get(maps_ref) if not isinstance(maps_ref, dict) else maps_ref
        self.cust = maps["cust"]
        self.part = maps["part"]
        self.part_count = maps["part_count"]
        self.supp = maps["supp"]
        self.output = output
        self._arrow_tables = None  # built lazily: only the *_arrow
        # emitters need them; the post-shuffle quads path never does

    def _arrow(self):
        if self._arrow_tables is None:
            part_items = list(self.part.items())
            self._arrow_tables = {
                "cust_keys": pa.array(list(self.cust.keys()), pa.string()),
                "cust_vals": pa.array(list(self.cust.values()), pa.int64()),
                "part_keys": pa.array(
                    [f"{n}|{b}" for (n, b), _ in part_items], pa.string()
                ),
                "part_vals": pa.array(
                    [v for _, v in part_items], pa.int64()
                ),
                "part_cnts": pa.array(
                    [float(self.part_count[k]) for k, _ in part_items],
                    pa.float64(),
                ),
                "supp_keys": pa.array(list(self.supp.keys()), pa.string()),
                "supp_vals": pa.array(list(self.supp.values()), pa.int64()),
            }
        return self._arrow_tables

    # _cust_keys/_cust_vals/_part_keys/_part_vals/_part_cnts/
    # _supp_keys/_supp_vals resolve through the lazy dict; __getattr__
    # only fires for attributes NOT set in __init__, so the hot quads
    # path never builds the Arrow tables
    def __getattr__(self, name):
        if name.startswith("_") and name[1:] in (
            "cust_keys", "cust_vals", "part_keys", "part_vals",
            "part_cnts", "supp_keys", "supp_vals",
        ):
            return self._arrow()[name[1:]]
        raise AttributeError(name)

    # -- surface resolution -------------------------------------------
    # Each helper prefers a PRE-RESOLVED key column when the batch
    # carries one (``resolve_mentions_partitioned`` attached it via
    # co-partitioned hash joins — the above-the-gate path where the
    # dimension tables are too large for driver dicts) and falls back
    # to the broadcast dictionaries otherwise.  Both paths produce the
    # same nullable float series (NaN = unresolved), so every emitter
    # below is resolution-agnostic.
    def _resolve_cust(self, sub: pd.DataFrame) -> pd.Series:
        if "cust_key" in sub.columns:
            return sub["cust_key"]
        return sub["a"].map(self.cust)

    def _resolve_part(self, sub: pd.DataFrame) -> pd.Series:
        if "part_key" in sub.columns:
            return sub["part_key"]
        return pd.Series(
            list(zip(sub["a"], sub["b"])), index=sub.index
        ).map(self.part)

    def _resolve_part_count(self, sub: pd.DataFrame) -> pd.Series:
        if "part_cnt" in sub.columns:
            return sub["part_cnt"]
        return pd.Series(
            list(zip(sub["a"], sub["b"])), index=sub.index
        ).map(self.part_count)

    def _resolve_supp(self, sub: pd.DataFrame) -> pd.Series:
        if "supp_key" in sub.columns:
            return sub["supp_key"]
        return sub["c"].map(self.supp)

    # -- helpers ------------------------------------------------------
    @staticmethod
    def _rows(graph_id, s_kind, s, p, o_kind, o, o_dt=""):
        n = len(graph_id)
        return pd.DataFrame(
            {
                "graph_id": np.asarray(graph_id, dtype=object),
                "s_kind": np.full(n, s_kind, np.uint8),
                "s": np.asarray(s, dtype=object),
                "p": np.full(n, p, dtype=object),
                "o_kind": np.full(n, o_kind, np.uint8),
                "o": np.asarray(o, dtype=object),
                "o_dt": np.full(n, o_dt, dtype=object),
                "o_lang": np.full(n, "", dtype=object),
            }
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.output == "links":
            return self._links(batch)
        if self.output == "triples":
            return self._triples(batch)
        return self._quads(batch)

    def _triples(self, batch: pd.DataFrame) -> pd.DataFrame:
        """IRI-subject triples only (conv_id, subj, pred, obj) — skips
        the turn-node quad rows entirely (~3.5× fewer rows than the full
        quads table when only the triple product is needed)."""
        if len(batch) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype=object) for c in
                 ["conv_id", "subj", "pred", "obj"]}
            )
        conv = batch["conv_id"].to_numpy(dtype=object)
        okey = np.array([c[5:] for c in conv], dtype=object)
        order_iri = np.char.add(ENT + "order:", okey.astype(str))
        m = batch["mtype"].to_numpy(dtype=object)
        out = []

        def rows(idx, pred, obj):
            out.append(
                pd.DataFrame(
                    {
                        "conv_id": conv[idx],
                        "subj": order_iri[idx],
                        "pred": pred,
                        "obj": obj,
                    }
                )
            )

        sel = m == "order_open"
        if sel.any():
            custkey = self._resolve_cust(batch.loc[sel])
            ok = custkey.notna().to_numpy()
            idx = np.flatnonzero(sel)[ok]
            rows(idx, REL + "placedBy",
                 (ENT + "cust:" + custkey[ok].astype("int64").astype(str)
                  ).to_numpy(dtype=object))

        sel = m == "order_status"
        if sel.any():
            idx = np.flatnonzero(sel)
            sub = batch.iloc[idx]
            rows(idx, REL + "status", sub["b"].to_numpy(dtype=object))
            rows(idx, REL + "priority", sub["c"].to_numpy(dtype=object))

        sel = m == "item"
        if sel.any():
            idx = np.flatnonzero(sel)
            sub = batch.iloc[idx]
            pkeys = self._resolve_part(sub)
            skeys = self._resolve_supp(sub)
            pok = pkeys.notna().to_numpy()
            if pok.any():
                rows(idx[pok], REL + "hasPart",
                     (ENT + "part:" + pkeys[pok].astype("int64").astype(str)
                      ).to_numpy(dtype=object))
            sok = skeys.notna().to_numpy()
            if sok.any():
                rows(idx[sok], REL + "suppliedBy",
                     (ENT + "supp:" + skeys[sok].astype("int64").astype(str)
                      ).to_numpy(dtype=object))

        res = pd.concat(out, ignore_index=True)
        return res.drop_duplicates()

    def _quads(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return _empty_quads()
        conv = batch["conv_id"].to_numpy(dtype=object)
        tl = batch["turn_label"].to_numpy(dtype=object)
        okey_from_conv = np.array(
            [c[5:] for c in conv], dtype=object
        )  # "conv-<k>" → "<k>"
        order_iri = np.char.add(ENT + "order:", okey_from_conv.astype(str))
        out = [
            # turn metadata: role + idx literal (idx drives chain building
            # inside the per-graph canonicalization group).
            self._rows(conv, BNODE, tl, REL + "role", LITERAL,
                       batch["role"].to_numpy(dtype=object)),
            self._rows(conv, BNODE, tl, REL + "idx", LITERAL,
                       batch["turn_idx"].astype(str).to_numpy(dtype=object),
                       XSD_INT),
            self._rows(conv, BNODE, tl, REL + "mentions", IRI, order_iri),
        ]

        m = batch["mtype"].to_numpy(dtype=object)

        sel = m == "order_open"
        if sel.any():
            custkey = self._resolve_cust(batch.loc[sel])
            ok = custkey.notna().to_numpy()
            idx = np.flatnonzero(sel)[ok]
            cust_iri = (
                ENT + "cust:" + custkey[ok].astype("int64").astype(str)
            ).to_numpy(dtype=object)
            out.append(self._rows(conv[idx], IRI, order_iri[idx],
                                  REL + "placedBy", IRI, cust_iri))
            out.append(self._rows(conv[idx], BNODE, tl[idx],
                                  REL + "mentions", IRI, cust_iri))

        sel = m == "order_status"
        if sel.any():
            idx = np.flatnonzero(sel)
            sub = batch.iloc[idx]
            out.append(self._rows(conv[idx], IRI, order_iri[idx],
                                  REL + "status", LITERAL,
                                  sub["b"].to_numpy(dtype=object)))
            out.append(self._rows(conv[idx], IRI, order_iri[idx],
                                  REL + "priority", LITERAL,
                                  sub["c"].to_numpy(dtype=object)))

        sel = m == "item"
        if sel.any():
            idx = np.flatnonzero(sel)
            sub = batch.iloc[idx]
            pkeys = self._resolve_part(sub)
            skeys = self._resolve_supp(sub)
            pok = pkeys.notna().to_numpy()
            if pok.any():
                pi = idx[pok]
                part_iri = (
                    ENT + "part:" + pkeys[pok].astype("int64").astype(str)
                ).to_numpy(dtype=object)
                out.append(self._rows(conv[pi], IRI, order_iri[pi],
                                      REL + "hasPart", IRI, part_iri))
                out.append(self._rows(conv[pi], BNODE, tl[pi],
                                      REL + "mentions", IRI, part_iri))
            sok = skeys.notna().to_numpy()
            if sok.any():
                si = idx[sok]
                supp_iri = (
                    ENT + "supp:" + skeys[sok].astype("int64").astype(str)
                ).to_numpy(dtype=object)
                out.append(self._rows(conv[si], IRI, order_iri[si],
                                      REL + "suppliedBy", IRI, supp_iri))
                out.append(self._rows(conv[si], BNODE, tl[si],
                                      REL + "mentions", IRI, supp_iri))

        return pd.concat(out, ignore_index=True)

    def _mention_rows(self, batch: pd.DataFrame) -> pd.DataFrame:
        """(conv_id, entity_iri) per entity mention — exactly the object
        multiset of the ``urn:rel:mentions`` quads, WITHOUT expanding the
        7-quad-per-row table first (the entity-aggregate queries only
        need this projection; ~3× less work and shuffle volume)."""
        if len(batch) == 0:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype=object),
                    "entity_iri": pd.Series([], dtype=object),
                }
            )
        conv = batch["conv_id"].to_numpy(dtype=object)
        okey = np.array([c[5:] for c in conv], dtype=object)
        order_iri = np.char.add(ENT + "order:", okey.astype(str))
        convs = [conv]
        iris = [order_iri.astype(object)]
        m = batch["mtype"].to_numpy(dtype=object)

        sel = m == "order_open"
        if sel.any():
            custkey = self._resolve_cust(batch.loc[sel])
            ok = custkey.notna().to_numpy()
            idx = np.flatnonzero(sel)[ok]
            convs.append(conv[idx])
            iris.append(
                (ENT + "cust:" + custkey[ok].astype("int64").astype(str))
                .to_numpy(dtype=object)
            )

        sel = m == "item"
        if sel.any():
            idx = np.flatnonzero(sel)
            sub = batch.iloc[idx]
            pkeys = self._resolve_part(sub)
            skeys = self._resolve_supp(sub)
            pok = pkeys.notna().to_numpy()
            if pok.any():
                convs.append(conv[idx[pok]])
                iris.append(
                    (ENT + "part:" + pkeys[pok].astype("int64").astype(str))
                    .to_numpy(dtype=object)
                )
            sok = skeys.notna().to_numpy()
            if sok.any():
                convs.append(conv[idx[sok]])
                iris.append(
                    (ENT + "supp:" + skeys[sok].astype("int64").astype(str))
                    .to_numpy(dtype=object)
                )

        return pd.DataFrame(
            {
                "conv_id": np.concatenate(convs),
                "entity_iri": np.concatenate(iris),
            }
        )

    def _links(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Scored link table: one row per entity mention surface with its
        resolved IRI and an ambiguity score = 1 / |candidate set|."""
        rows = {"conv_id": [], "surface": [], "entity_iri": [], "score": []}
        m = batch["mtype"].to_numpy(dtype=object)

        sel = m == "order_open"
        if sel.any():
            sub = batch.loc[sel]
            keys = self._resolve_cust(sub)
            ok = keys.notna()
            rows["conv_id"].extend(sub.loc[ok, "conv_id"])
            rows["surface"].extend(sub.loc[ok, "a"])
            rows["entity_iri"].extend(
                ENT + "cust:" + keys[ok].astype("int64").astype(str)
            )
            rows["score"].extend([1.0] * int(ok.sum()))

        sel = m == "item"
        if sel.any():
            sub = batch.loc[sel]
            pkeys = self._resolve_part(sub)
            counts = self._resolve_part_count(sub)
            ok = pkeys.notna()
            rows["conv_id"].extend(sub.loc[ok, "conv_id"])
            rows["surface"].extend(sub.loc[ok, "a"] + "|" + sub.loc[ok, "b"])
            rows["entity_iri"].extend(
                ENT + "part:" + pkeys[ok].astype("int64").astype(str)
            )
            rows["score"].extend((1.0 / counts[ok]).tolist())

            skeys = self._resolve_supp(sub)
            ok = skeys.notna()
            rows["conv_id"].extend(sub.loc[ok, "conv_id"])
            rows["surface"].extend(sub.loc[ok, "c"])
            rows["entity_iri"].extend(
                ENT + "supp:" + skeys[ok].astype("int64").astype(str)
            )
            rows["score"].extend([1.0] * int(ok.sum()))

        return pd.DataFrame(rows)

    # -- Arrow-native emission (pre-shuffle zero-copy path) -----------
    @staticmethod
    def _iri(prefix: str, keys: pa.Array) -> pa.Array:
        return pc.binary_join_element_wise(
            prefix, pc.cast(keys, pa.string()), ""
        )

    @staticmethod
    def _resolve(surface, keys, vals):
        """surface → (found mask, resolved values) via C++ index_in."""
        idx = pc.index_in(surface, value_set=keys)
        found = pc.is_valid(idx)
        return found, pc.take(vals, pc.filter(idx, found))

    def _order_iris(self, batch: pa.Table):
        conv = pc.cast(batch["conv_id"], pa.string())
        okey = pc.replace_substring_regex(
            conv, pattern="^conv-", replacement=""
        )
        return conv, self._iri(ENT + "order:", okey)

    def _triples_arrow(self, batch: pa.Table) -> pa.Table:
        """Arrow twin of ``_triples``: per-batch-distinct
        (conv_id, subj, pred, obj) without leaving Arrow."""
        if batch.num_rows == 0:
            return _TRIPLES_SCHEMA.empty_table()
        conv, order_iri = self._order_iris(batch)
        m = batch["mtype"]
        pieces = []

        def piece(conv_a, subj_a, pred, obj_a):
            n = len(obj_a)
            pieces.append(
                pa.table(
                    {
                        "conv_id": conv_a,
                        "subj": subj_a,
                        "pred": pa.array([pred] * n, pa.string()),
                        "obj": obj_a,
                    }
                ).cast(_TRIPLES_SCHEMA)
            )

        mask = pc.equal(m, "order_open")
        if pc.any(mask).as_py():
            cf, of = conv.filter(mask), order_iri.filter(mask)
            found, ck = self._resolve(
                batch["a"].filter(mask), self._cust_keys, self._cust_vals
            )
            piece(
                cf.filter(found), of.filter(found),
                REL + "placedBy", self._iri(ENT + "cust:", ck),
            )

        mask = pc.equal(m, "order_status")
        if pc.any(mask).as_py():
            cf, of = conv.filter(mask), order_iri.filter(mask)
            piece(cf, of, REL + "status",
                  pc.cast(batch["b"].filter(mask), pa.string()))
            piece(cf, of, REL + "priority",
                  pc.cast(batch["c"].filter(mask), pa.string()))

        mask = pc.equal(m, "item")
        if pc.any(mask).as_py():
            cf, of = conv.filter(mask), order_iri.filter(mask)
            pair = pc.binary_join_element_wise(
                batch["a"].filter(mask), batch["b"].filter(mask), "|"
            )
            found, pk = self._resolve(pair, self._part_keys, self._part_vals)
            piece(
                cf.filter(found), of.filter(found),
                REL + "hasPart", self._iri(ENT + "part:", pk),
            )
            found, sk = self._resolve(
                batch["c"].filter(mask), self._supp_keys, self._supp_vals
            )
            piece(
                cf.filter(found), of.filter(found),
                REL + "suppliedBy", self._iri(ENT + "supp:", sk),
            )

        if not pieces:
            return _TRIPLES_SCHEMA.empty_table()
        out = pa.concat_tables(pieces)
        # per-batch DISTINCT (the combiner before the global shuffle)
        return out.group_by(_TRIPLES_SCHEMA.names).aggregate([])

    def _mention_rows_arrow(self, batch: pa.Table) -> pa.Table:
        """Arrow twin of ``_mention_rows``: (conv_id, entity_iri) per
        entity mention — the projection the entity aggregates consume."""
        if batch.num_rows == 0:
            return _MENTION_IRI_SCHEMA.empty_table()
        conv, order_iri = self._order_iris(batch)
        m = batch["mtype"]
        pieces = [
            pa.table({"conv_id": conv, "entity_iri": order_iri}).cast(
                _MENTION_IRI_SCHEMA
            )
        ]

        def piece(conv_a, iri_a):
            pieces.append(
                pa.table({"conv_id": conv_a, "entity_iri": iri_a}).cast(
                    _MENTION_IRI_SCHEMA
                )
            )

        mask = pc.equal(m, "order_open")
        if pc.any(mask).as_py():
            cf = conv.filter(mask)
            found, ck = self._resolve(
                batch["a"].filter(mask), self._cust_keys, self._cust_vals
            )
            piece(cf.filter(found), self._iri(ENT + "cust:", ck))

        mask = pc.equal(m, "item")
        if pc.any(mask).as_py():
            cf = conv.filter(mask)
            pair = pc.binary_join_element_wise(
                batch["a"].filter(mask), batch["b"].filter(mask), "|"
            )
            found, pk = self._resolve(pair, self._part_keys, self._part_vals)
            piece(cf.filter(found), self._iri(ENT + "part:", pk))
            found, sk = self._resolve(
                batch["c"].filter(mask), self._supp_keys, self._supp_vals
            )
            piece(cf.filter(found), self._iri(ENT + "supp:", sk))

        return pa.concat_tables(pieces)

    def _links_arrow(self, batch: pa.Table) -> pa.Table:
        """Arrow twin of ``_links``: scored surface→IRI link rows."""
        if batch.num_rows == 0:
            return _LINKS_SCHEMA.empty_table()
        conv = pc.cast(batch["conv_id"], pa.string())
        m = batch["mtype"]
        pieces = []

        def piece(conv_a, surf_a, iri_a, score_a):
            pieces.append(
                pa.table(
                    {
                        "conv_id": conv_a,
                        "surface": surf_a,
                        "entity_iri": iri_a,
                        "score": score_a,
                    }
                ).cast(_LINKS_SCHEMA)
            )

        def ones(n):
            return pa.array(np.ones(n, np.float64))

        mask = pc.equal(m, "order_open")
        if pc.any(mask).as_py():
            cf = conv.filter(mask)
            surf = pc.cast(batch["a"].filter(mask), pa.string())
            found, ck = self._resolve(surf, self._cust_keys, self._cust_vals)
            piece(
                cf.filter(found), surf.filter(found),
                self._iri(ENT + "cust:", ck), ones(len(ck)),
            )

        mask = pc.equal(m, "item")
        if pc.any(mask).as_py():
            cf = conv.filter(mask)
            pair = pc.binary_join_element_wise(
                batch["a"].filter(mask), batch["b"].filter(mask), "|"
            )
            idx = pc.index_in(pair, value_set=self._part_keys)
            found = pc.is_valid(idx)
            hit = pc.filter(idx, found)
            piece(
                cf.filter(found), pair.filter(found),
                self._iri(ENT + "part:", pc.take(self._part_vals, hit)),
                pc.divide(1.0, pc.take(self._part_cnts, hit)),
            )
            surf = pc.cast(batch["c"].filter(mask), pa.string())
            found, sk = self._resolve(surf, self._supp_keys, self._supp_vals)
            piece(
                cf.filter(found), surf.filter(found),
                self._iri(ENT + "supp:", sk), ones(len(sk)),
            )

        if not pieces:
            return _LINKS_SCHEMA.empty_table()
        return pa.concat_tables(pieces)
