"""Bucketed shuffle primitives — scalable replacements for per-group ops.

Ray Data's ``groupby(keys).aggregate(...)`` / ``map_groups`` pay a
per-group Python cost (~ms); with millions of tiny groups (distinct
triples, per-entity counts, per-conversation graphs) that dominates
wall-time.  The scalable idiom used throughout this engine is:

    1. map_batches: local combine (drop_duplicates / partial aggregate)
       + add ``_bucket = hash64(keys) % num_buckets``
    2. groupby("_bucket").map_groups: vectorized pandas combine within
       each bucket (num_buckets groups total, each a big batch)

``num_buckets`` bounds shuffle fan-in and is the knob that scales to a
cluster: pick ~4× total cores (or data_size / target_partition_size).
Hashing uses ``pd.util.hash_pandas_object`` with its fixed default key,
deterministic across processes — two workers always agree on a row's
bucket.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

DEFAULT_NUM_BUCKETS = 64  # static fallback; call sites may pass
                          # util.default_buckets() for cluster-adaptive


def add_bucket(
    batch: pd.DataFrame, keys: Sequence[str], num_buckets: int
) -> pd.DataFrame:
    h = pd.util.hash_pandas_object(batch[list(keys)], index=False).to_numpy()
    batch = batch.copy()
    batch["_bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
    return batch


def bucketed_map_groups(
    ds: rd.Dataset,
    keys: Sequence[str],
    bucket_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    local_combine: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    batch_size: int = 32768,
) -> rd.Dataset:
    """Generic bucketed shuffle: all rows sharing ``keys`` meet in one
    bucket; ``bucket_fn`` sees the bucket as one DataFrame (without the
    ``_bucket`` column) and returns its combined result."""
    keys = list(keys)

    def run_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return bucket_fn(group.drop(columns=["_bucket"]))

    if local_combine is None:
        # Zero-copy pre-shuffle path: only the key columns cross into
        # pandas for hashing; every other column stays Arrow through the
        # exchange (no full-table pandas round trip before the sort).
        def prepare(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch.append_column(
                    "_bucket", pa.array([], pa.int32())
                )
            h = pd.util.hash_pandas_object(
                batch.select(keys).to_pandas(), index=False
            ).to_numpy()
            b = (h % np.uint64(num_buckets)).astype(np.int32)
            return batch.append_column("_bucket", pa.array(b))

        prepared = ds.map_batches(
            prepare, batch_format="pyarrow", batch_size=batch_size
        )
    else:

        def prepare_pd(batch: pd.DataFrame) -> pd.DataFrame:
            batch = local_combine(batch)
            if len(batch) == 0:
                out = batch.copy()
                out["_bucket"] = pd.Series([], dtype=np.int32)
                return out
            return add_bucket(batch, keys, num_buckets)

        prepared = ds.map_batches(
            prepare_pd, batch_format="pandas", batch_size=batch_size
        )

    return prepared.groupby("_bucket").map_groups(
        run_bucket, batch_format="pandas"
    )


def single_bucket_merge(
    ds: rd.Dataset,
    merge_fn: Callable[[pd.DataFrame], pd.DataFrame],
    batch_size: int = 65536,
) -> rd.Dataset:
    """Funnel a (pre-reduced, small) dataset into ONE task and apply
    ``merge_fn`` to the whole thing — the final merge of a two-level
    top-k / global-reduce.  Callers MUST have already shrunk the stream
    (per-batch local top-k / partial aggregate); this stage is the tiny
    tail, not the wide body."""

    def const_key(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["_k"] = np.zeros(len(out), np.int8)
        return out

    return bucketed_map_groups(
        ds.map_batches(const_key, batch_format="pandas", batch_size=batch_size),
        ["_k"],
        lambda b: merge_fn(b.drop(columns=["_k"])),
        num_buckets=1,
        batch_size=batch_size,
    )


def distinct(
    ds: rd.Dataset,
    keys: Sequence[str],
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    batch_size: int = 32768,
) -> rd.Dataset:
    """Exact multi-column DISTINCT: per-batch Arrow group_by dedup
    (zero-copy C++ combiner) then bucketed global drop_duplicates."""
    keys = list(keys)

    def local(batch: pa.Table) -> pa.Table:
        return batch.select(keys).group_by(keys).aggregate([])

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.drop_duplicates()

    deduped = ds.map_batches(
        local, batch_format="pyarrow", batch_size=batch_size
    )
    return bucketed_map_groups(
        deduped, keys, combine, num_buckets, batch_size=batch_size
    )


def grouped_agg(
    ds: rd.Dataset,
    keys: Sequence[str],
    aggs: Dict[str, str],
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    batch_size: int = 32768,
) -> rd.Dataset:
    """Scalable grouped aggregation: per-batch pandas partial aggregate,
    then bucketed merge of partials.  ``aggs`` maps column → one of
    ``sum | count | min | max`` (count re-aggregates as sum of partial
    counts)."""
    keys = list(keys)
    # re-aggregation function for merging partials
    merge_aggs = {c: ("sum" if a == "count" else a) for c, a in aggs.items()}

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, sort=False, observed=True).agg(aggs).reset_index()
        return g

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(keys, sort=False, observed=True)
            .agg(merge_aggs)
            .reset_index()
        )

    return bucketed_map_groups(
        ds, keys, combine, num_buckets, local_combine=local, batch_size=batch_size
    )


def per_key_map_groups(
    ds: rd.Dataset,
    key: str,
    group_fn: Callable[[str, pd.DataFrame], pd.DataFrame],
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    batch_size: int = 32768,
) -> rd.Dataset:
    """Apply ``group_fn(key_value, group_df)`` once per key value, but pay
    Ray's per-group cost only once per *bucket*: inside each bucket a
    pandas groupby loop dispatches the per-key calls (µs each)."""

    def run_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        outs: List[pd.DataFrame] = [
            group_fn(k, sub) for k, sub in bucket.groupby(key, sort=False)
        ]
        return pd.concat(outs, ignore_index=True)

    return bucketed_map_groups(
        ds, [key], run_bucket, num_buckets, batch_size=batch_size
    )
