"""Join family, Ray-Data-first (SURVEY.md §2.4 "Joins / lookups").

* ``broadcast_join``  — small side shipped once via ``ray.put``, pandas
  merge per batch. No shuffle. The right tool whenever one side fits the
  object store (dimension tables, vocabularies, blocklists).
* ``hash_join``       — both sides large: bucket rows by key hash, tag
  the side, exchange once, merge per bucket. The explicit partitioned
  hash join; skewed keys can be salted by raising ``num_buckets``.
* ``asof_prev``       — ordered per-key operator (previous row by time):
  bucket by key, sort within bucket, vectorized shift per key. The same
  shape implements merge_asof/range joins (sort + ``pd.merge_asof`` in
  the bucket).
* ``semi_join_filter`` / ``anti_join_filter`` — broadcast key set,
  vectorized ``isin`` inside ``map_batches``.
"""

from __future__ import annotations

from typing import List, Sequence

import pandas as pd
import ray
import ray.data as rd

from .shuffle import bucketed_map_groups


def broadcast_join(
    ds: rd.Dataset,
    small_df: pd.DataFrame,
    on: Sequence[str] | str,
    how: str = "inner",
) -> rd.Dataset:
    ref = ray.put(small_df)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(ray.get(ref), on=on, how=how)

    return ds.map_batches(merge, batch_format="pandas", batch_size=32768)


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: Sequence[str] | str,
    how: str = "inner",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Partitioned hash join: rows from both sides meet in their key's
    bucket; pandas merge runs per bucket."""
    on_cols: List[str] = [on] if isinstance(on, str) else list(on)
    left_cols = [c for c in left.schema().names]
    right_cols = [c for c in right.schema().names]
    overlap = (set(left_cols) & set(right_cols)) - set(on_cols)
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")

    combined = list(
        dict.fromkeys(on_cols + left_cols + right_cols + ["_side"])
    )

    def tag(side: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            batch["_side"] = side
            # union needs one schema: absent columns ride as nulls
            # (integer columns widen to nullable through the exchange).
            return batch.reindex(columns=combined)

        return fn

    tagged = left.map_batches(tag("l"), batch_format="pandas").union(
        right.map_batches(tag("r"), batch_format="pandas")
    )

    def merge_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        l = bucket.loc[bucket["_side"] == "l", left_cols]
        r = bucket.loc[bucket["_side"] == "r", right_cols]
        return l.merge(r, on=on_cols, how=how)

    return bucketed_map_groups(tagged, on_cols, merge_bucket, num_buckets)


def asof_prev(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    value_cols: Sequence[str],
    num_buckets: int = 32,
) -> rd.Dataset:
    """For every row: the previous row's values within the same ``key``,
    ordered by ``ts_col`` (ties broken by the value columns for
    determinism). Emits the input columns plus ``prev_<col>``."""
    value_cols = list(value_cols)

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(
            [key, ts_col] + value_cols, kind="mergesort"
        ).reset_index(drop=True)
        g = b.groupby(key, sort=False)
        for c in value_cols:
            b["prev_" + c] = g[c].shift(1)
        return b

    return bucketed_map_groups(ds, [key], per_bucket, num_buckets)


def semi_join_filter(ds: rd.Dataset, col: str, keys_ref) -> rd.Dataset:
    """Keep rows whose ``col`` is in the broadcast key set."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(keys_ref)
        return batch[batch[col].isin(keys)]

    return ds.map_batches(fn, batch_format="pandas", batch_size=32768)


def anti_join_filter(ds: rd.Dataset, col: str, keys_ref) -> rd.Dataset:
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(keys_ref)
        return batch[~batch[col].isin(keys)]

    return ds.map_batches(fn, batch_format="pandas", batch_size=32768)
