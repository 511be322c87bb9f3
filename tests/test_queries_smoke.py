"""Driver-contract smoke: every ``queries()`` entry must execute at
sf0.001 and return a well-formed result; deterministic queries must be
stable across two runs (the driver hash-compares values, so instability
is a correctness failure even without an oracle)."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"

# queries whose output is fully deterministic (checked for run-to-run
# byte stability here; the oracle-checked ones are verified against
# DuckDB by tools/check_oracles.py and the driver)
DETERMINISTIC = [
    "kg_canonical_graphs",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "media_features",
]


def _to_pandas(res):
    return res.to_pandas() if hasattr(res, "to_pandas") else res


@pytest.fixture(scope="module")
def registry(ray_session):
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


def test_every_query_runs_at_sf0001(registry):
    qs, _ = registry
    failures = []
    for name, fn in qs.items():
        try:
            df = _to_pandas(fn(SF))
            assert len(df.columns) > 0
            assert len(df) >= 0
        except Exception as ex:  # pragma: no cover - failure reporting
            failures.append(f"{name}: {ex}")
    assert not failures, "\n".join(failures)


def test_oracle_keys_subset_of_queries(registry):
    qs, osql = registry
    assert set(osql) <= set(qs)


@pytest.mark.parametrize("name", DETERMINISTIC)
def test_deterministic_queries_stable(registry, name):
    qs, _ = registry
    a = _to_pandas(qs[name](SF))
    b = _to_pandas(qs[name](SF))
    cols = sorted(a.columns)
    a = a[cols].astype(str).sort_values(cols).reset_index(drop=True)
    b = b[cols].astype(str).sort_values(cols).reset_index(drop=True)
    assert a.equals(b), f"{name} unstable across runs"
