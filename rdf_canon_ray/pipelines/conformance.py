"""W3C rdfc10 conformance as a *distributed* pipeline: every manifest
test dataset becomes one graph in a single quads Dataset; one bucketed
canonicalization shuffle runs them all; results compare against the
broadcast golden outputs.

This is the generic-graph path (named graphs honored, no KG structure
quads) — the same operator chain a user would run over arbitrary
N-Quads corpora.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import ray
import ray.data as rd

from ..core import nquads
from ..stages.canonicalize import canonicalize_graphs

REF_TESTS = "/root/reference/tests"


def _load_manifest():
    with open(os.path.join(REF_TESTS, "manifest.jsonld")) as f:
        return json.load(f)["entries"]


def conformance_quads() -> tuple:
    """All manifest inputs as one flat quads DataFrame + expectations."""
    rows = {
        k: []
        for k in [
            "graph_id",
            "s_kind",
            "s",
            "p",
            "o_kind",
            "o",
            "o_dt",
            "o_lang",
            "g_kind",
            "g",
        ]
    }
    expect = {}
    for e in _load_manifest():
        tid = e["id"].lstrip("#")
        alg = (e.get("hashAlgorithm") or "SHA256").lower().replace("-", "")
        quads = nquads.parse_file(os.path.join(REF_TESTS, e["action"]))
        for q in quads:
            rows["graph_id"].append(tid)
            for name, v in zip(
                ["s_kind", "s", "p", "o_kind", "o", "o_dt", "o_lang", "g_kind", "g"],
                q,
            ):
                rows[name].append(v)
        if e["type"] == "rdfc:RDFC10EvalTest":
            with open(os.path.join(REF_TESTS, e["result"]), encoding="utf-8") as f:
                expect[tid] = {"kind": "eval", "golden": f.read(), "alg": alg,
                               "n_quads": len(quads)}
        elif e["type"] == "rdfc:RDFC10MapTest":
            with open(os.path.join(REF_TESTS, e["result"])) as f:
                expect[tid] = {
                    "kind": "map",
                    "golden": json.dumps(json.load(f), sort_keys=True),
                    "alg": alg,
                    "n_quads": len(quads),
                }
        else:
            expect[tid] = {"kind": "negative", "golden": "", "alg": alg,
                           "n_quads": len(quads)}
    return pd.DataFrame(rows), expect


def run_conformance(sf_dir: str = "") -> rd.Dataset:
    """(sf_dir ignored — fixture-driven.) Returns one row per manifest
    entry: (test_id, kind, passed)."""
    quads_df, expect = conformance_quads()
    # empty-input tests (test001) have no quads → handled driver-side
    expect_ref = ray.put(expect)

    sha256_ids = {t for t, e in expect.items() if e["alg"] == "sha256"}
    sha384_ids = set(expect) - sha256_ids
    results = []
    for alg, ids in [("sha256", sha256_ids), ("sha384", sha384_ids)]:
        sub = quads_df[quads_df["graph_id"].isin(ids)]
        if not len(sub):
            continue
        ds = rd.from_pandas(sub)
        out = canonicalize_graphs(
            ds, hash_name=alg, num_buckets=8, structure=False
        )

        def check(batch: pd.DataFrame) -> pd.DataFrame:
            exp = ray.get(expect_ref)
            res = []
            for _, r in batch.iterrows():
                e = exp[r["graph_id"]]
                if e["kind"] == "eval":
                    ok = r["status"] == "ok" and r["canon_nquads"] == e["golden"]
                elif e["kind"] == "map":
                    ok = (
                        r["status"] == "ok"
                        and r["label_map"] == e["golden"]
                    )
                else:
                    ok = r["status"] == "quarantined"
                res.append((r["graph_id"], e["kind"], bool(ok)))
            return pd.DataFrame(res, columns=["test_id", "kind", "passed"])

        results.append(out.map_batches(check, batch_format="pandas").to_pandas())

    got = pd.concat(results, ignore_index=True)
    # entries with zero quads never reach the shuffle; they pass iff the
    # golden output is empty (the spec's empty-dataset case).
    seen = set(got["test_id"])
    extra = []
    for tid, e in expect.items():
        if tid in seen:
            continue
        if e["kind"] == "eval":
            ok = e["golden"] == ""
        elif e["kind"] == "map":
            ok = e["golden"] == "{}"
        else:
            ok = False
        extra.append((tid, e["kind"], ok))
    if extra:
        got = pd.concat(
            [got, pd.DataFrame(extra, columns=["test_id", "kind", "passed"])],
            ignore_index=True,
        )
    return rd.from_pandas(got.sort_values("test_id").reset_index(drop=True))
