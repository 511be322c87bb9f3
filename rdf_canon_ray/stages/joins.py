"""Join family, Ray-Data-first (SURVEY.md §2.4 "Joins / lookups").

* ``broadcast_join``  — small side shipped once via ``ray.put``, pandas
  merge per batch. No shuffle. The right tool whenever one side fits the
  object store (dimension tables, vocabularies, blocklists).
* ``hash_join``       — both sides large: bucket rows by key hash, tag
  the side, exchange once, merge per bucket.  A hot key hashes to ONE
  bucket no matter how many buckets exist; true skew handling is
  ``salt > 1`` (replicate the right side across salt sub-buckets and
  spread the left side's hot-key rows over them) or
  ``broadcast_threshold`` (automatic broadcast fallback when the right
  side is small enough to ship whole).
* ``asof_prev``       — ordered per-key operator (previous row by time):
  bucket by key, sort within bucket, vectorized shift per key. The same
  shape implements merge_asof/range joins (sort + ``pd.merge_asof`` in
  the bucket).
* ``semi_join_filter`` / ``anti_join_filter`` — broadcast key set,
  vectorized ``isin`` inside ``map_batches``.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..state import metrics
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
    salt: int = 1,
    broadcast_threshold: int | None = None,
) -> rd.Dataset:
    """Partitioned hash join: rows from both sides meet in their key's
    bucket; pandas merge runs per bucket.

    Skew handling:
    * ``salt > 1`` — the right side is replicated once per salt value
      and the left side's rows are spread over the salts, so a hot
      key's work lands in up to ``salt`` different buckets instead of
      one straggler.  Replication duplicates unmatched right rows, so
      salting is restricted to ``inner``/``left`` joins.
    * ``broadcast_threshold`` — if the right side has at most this many
      rows (one cheap count), skip the shuffle entirely and broadcast
      it (``broadcast_join``).
    """
    on_cols: List[str] = [on] if isinstance(on, str) else list(on)
    if salt > 1 and how not in ("inner", "left"):
        raise ValueError(
            f"salt>1 replicates the right side; only inner/left joins "
            f"keep their semantics (got how={how!r})"
        )
    if broadcast_threshold is not None and how in ("inner", "left"):
        # broadcast_join merges per LEFT batch, so right/outer semantics
        # (emit unmatched right rows exactly once) cannot be preserved —
        # those fall through to the partitioned join below.
        if right.count() <= broadcast_threshold:
            return broadcast_join(ds=left, small_df=right.to_pandas(),
                                  on=on_cols, how=how)
    left_schema, right_schema = left.schema(), right.schema()
    left_cols = [c for c in left_schema.names]
    right_cols = [c for c in right_schema.names]
    overlap = (set(left_cols) & set(right_cols)) - set(on_cols)
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")

    # The bucket hash (pd.util.hash_pandas_object) is dtype-sensitive:
    # int64(7) and float64(7.0) hash differently, and each side's blocks
    # keep their own dtype through the union.  If the sides disagree on
    # a key dtype (e.g. one side's key was null-widened to float64 by an
    # upstream join), equal keys would land in different buckets and the
    # match would silently drop — so promote keys to one dtype up front.
    def _pandas_dtypes(schema) -> dict:
        base = getattr(schema, "base_schema", schema)
        if hasattr(base, "field"):  # pyarrow schema
            return {
                n: base.field(n).type.to_pandas_dtype() for n in base.names
            }
        # PandasBlockSchema: numpy dtypes ride in .types
        return dict(zip(base.names, base.types))

    ldt, rdt = _pandas_dtypes(left_schema), _pandas_dtypes(right_schema)
    key_cast = {}
    for k in on_cols:
        lt, rt = np.dtype(ldt[k]), np.dtype(rdt[k])
        if lt != rt and lt.kind in "iuf" and rt.kind in "iuf":
            key_cast[k] = np.result_type(lt, rt)

    def align_keys(batch: pd.DataFrame) -> pd.DataFrame:
        for k, dt in key_cast.items():
            batch[k] = batch[k].astype(dt)
        return batch

    combined = list(
        dict.fromkeys(on_cols + left_cols + right_cols + ["_side", "_salt"])
    )

    def tag_left(batch: pd.DataFrame) -> pd.DataFrame:
        batch = align_keys(batch.copy())
        batch["_side"] = "l"
        # positional spread is enough: the salt only routes rows, the
        # merge result is salt-invariant
        batch["_salt"] = (
            np.arange(len(batch)) % salt if salt > 1 else 0
        )
        # union needs one schema: absent columns ride as nulls
        # (integer columns widen to nullable through the exchange).
        return batch.reindex(columns=combined)

    def tag_right(batch: pd.DataFrame) -> pd.DataFrame:
        batch = align_keys(batch.copy())
        batch["_side"] = "r"
        if salt > 1:
            batch = pd.concat(
                [batch.assign(_salt=s) for s in range(salt)],
                ignore_index=True,
            )
        else:
            batch["_salt"] = 0
        return batch.reindex(columns=combined)

    tagged = left.map_batches(tag_left, batch_format="pandas").union(
        right.map_batches(tag_right, batch_format="pandas")
    )

    def merge_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        l = bucket.loc[bucket["_side"] == "l", left_cols]
        r = bucket.loc[bucket["_side"] == "r", right_cols + ["_salt"]]
        if salt > 1:
            # each (key, salt) pair owns exactly one right replica set
            l = bucket.loc[bucket["_side"] == "l", left_cols + ["_salt"]]
            merged = l.merge(r, on=on_cols + ["_salt"], how=how)
            return merged[
                [c for c in merged.columns if c != "_salt"]
            ]
        return l.merge(r.drop(columns=["_salt"]), on=on_cols, how=how)

    return bucketed_map_groups(
        tagged, on_cols + ["_salt"], merge_bucket, num_buckets
    )


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


def partitioned_anti_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: Sequence[str] | str,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Anti join for a LARGE right side: keep left rows whose key does
    not appear in ``right``.  Both sides co-partition by key hash (the
    right side ships only its key columns), and an ``isin`` filter runs
    per bucket — no driver-side key set, unlike ``anti_join_filter``."""
    on_cols: List[str] = [on] if isinstance(on, str) else list(on)
    left_cols = list(left.schema().names)
    combined = left_cols + ["_side"]

    def tag_left(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_side"] = "l"
        return batch.reindex(columns=combined)

    def tag_right(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[on_cols].drop_duplicates().copy()
        out["_side"] = "r"
        return out.reindex(columns=combined)

    tagged = left.map_batches(tag_left, batch_format="pandas").union(
        right.map_batches(tag_right, batch_format="pandas")
    )

    def bucket_fn(bucket: pd.DataFrame) -> pd.DataFrame:
        l = bucket.loc[bucket["_side"] == "l", left_cols]
        r = bucket.loc[bucket["_side"] == "r", on_cols]
        if len(on_cols) == 1:
            keep = ~l[on_cols[0]].isin(r[on_cols[0]])
            return l.loc[keep]
        m = l.merge(r, on=on_cols, how="left", indicator=True)
        return m.loc[m["_merge"] == "left_only", left_cols]

    return bucketed_map_groups(tagged, on_cols, bucket_fn, num_buckets)


def broadcast_asof_floor(
    ds: rd.Dataset,
    probe_col: str,
    axis_vals: np.ndarray,
    payload: np.ndarray,
    out_key: str,
    out_val: str,
    scale: float = 1.0,
    missing_key: int = -1,
    missing_val: float = -1.0,
) -> rd.Dataset:
    """As-of (nearest-below) join against a broadcast sorted axis: for
    every row, the greatest ``axis_vals`` entry ≤ ``scale·probe_col``
    and its payload. The dimension side ships once via ``ray.put`` as a
    sorted array; each batch is one vectorized ``searchsorted`` — the
    map-only shape for dimension-side as-of joins (big-big keyed as-of
    is ``asof_prev``'s bucket-sort shape).  Ties on the axis must be
    pre-aggregated by the caller (e.g. max payload per axis value).

    Emits the input columns plus ``out_key`` (payload, ``missing_key``
    when no axis value qualifies) and ``out_val`` (the matched axis
    value, ``missing_val`` when none)."""
    order = np.argsort(axis_vals, kind="stable")
    ref = ray.put(
        (
            np.asarray(axis_vals, np.float64)[order],
            np.asarray(payload)[order],
        )
    )

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        axis, pay = ray.get(ref)
        probe = batch[probe_col].to_numpy(dtype=np.float64) * scale
        idx = np.searchsorted(axis, probe, side="right") - 1
        ok = idx >= 0
        out = batch.copy()
        key = np.full(len(batch), missing_key, dtype=pay.dtype)
        val = np.full(len(batch), missing_val, np.float64)
        key[ok] = pay[idx[ok]]
        val[ok] = axis[idx[ok]]
        out[out_key] = key
        out[out_val] = val
        return out

    return ds.map_batches(fn, batch_format="pandas", batch_size=32768)


def range_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_val: str,
    right_val: str,
    radius: float,
    num_buckets: int = 64,
) -> rd.Dataset:
    """1-D range (interval) join: pairs where
    ``right_val ∈ [left_val - radius, left_val + radius)``.

    Distributed shape: the value axis is cut into grid cells of width
    ``radius``; every right row lands in its single cell, every left row
    replicates to the ≤3 cells its window overlaps, cells hash into
    buckets, and the exact window predicate filters inside the bucket —
    no all-pairs comparison, bounded ×3 replication of one side, and the
    pattern generalizes to time-interval and as-of joins."""
    left_cols = list(left.schema().names)
    right_cols = list(right.schema().names)
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"column collision: {sorted(overlap)}")
    w = float(radius)

    def tag_left(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[left_val].to_numpy(dtype=np.float64)
        lo = np.floor((v - w) / w).astype(np.int64)
        hi = np.floor((v + w) / w).astype(np.int64)
        frames = []
        for off in range(3):  # window width 2w spans at most 3 w-cells
            cell = lo + off
            keep = cell <= hi
            sub = batch.loc[keep].copy()
            sub["_cell"] = cell[keep]
            sub["_side"] = "l"
            frames.append(sub)
        out = pd.concat(frames, ignore_index=True)
        return out.reindex(columns=left_cols + right_cols + ["_cell", "_side"])

    def tag_right(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[right_val].to_numpy(dtype=np.float64)
        out = batch.copy()
        out["_cell"] = np.floor(v / w).astype(np.int64)
        out["_side"] = "r"
        return out.reindex(columns=left_cols + right_cols + ["_cell", "_side"])

    tagged = left.map_batches(tag_left, batch_format="pandas").union(
        right.map_batches(tag_right, batch_format="pandas")
    )

    def merge_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        l = bucket.loc[bucket["_side"] == "l", left_cols + ["_cell"]]
        r = bucket.loc[bucket["_side"] == "r", right_cols + ["_cell"]]
        m = l.merge(r, on="_cell").drop(columns=["_cell"])
        if len(m) == 0:
            return m
        v = m[left_val].to_numpy(dtype=np.float64)
        rv = m[right_val].to_numpy(dtype=np.float64)
        return m.loc[(rv >= v - w) & (rv < v + w)]

    return bucketed_map_groups(tagged, ["_cell"], merge_bucket, num_buckets)


def _bloom_hashes(
    values: pd.Series, n_bits: int, k: int
) -> "np.ndarray":
    """k Kirsch-Mitzenmacher bit positions per value, shape (k, n):
    pos_i = (h1 + i·h2) mod n_bits with h1 = the pandas 64-bit column
    hash and h2 an odd derivative — both sides of a join MUST present
    the key at the same dtype (the hash is dtype-sensitive, same
    contract as ``hash_join``'s bucket hash)."""
    h1 = pd.util.hash_pandas_object(values, index=False).to_numpy().astype(
        np.uint64
    )
    h2 = (h1 >> np.uint64(33)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(n_bits)).astype(
        np.int64
    )


def build_bloom(
    ds: rd.Dataset, col: str, n_bits: int = 1 << 20, k: int = 4
):
    """Distributed Bloom-filter build over ``ds[col]`` → an object-store
    ref to the packed bitset (``n_bits/8`` bytes — 128 KiB at the
    default, a broadcastable constant regardless of key cardinality).
    Per-batch partial bitsets OR-merge through ``single_bucket_merge``;
    only fixed-size bitsets cross the wire, never keys."""
    from .shuffle import single_bucket_merge

    nbytes = n_bits // 8

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(nbytes, np.uint8)
        if len(batch):
            pos = _bloom_hashes(batch[col], n_bits, k).ravel()
            np.bitwise_or.at(
                bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
            )
        return pd.DataFrame({"bits": [bits.tobytes()]})

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        stacked = np.stack(
            [np.frombuffer(x, np.uint8) for x in b["bits"]]
        )
        return pd.DataFrame(
            {"bits": [np.bitwise_or.reduce(stacked, axis=0).tobytes()]}
        )

    merged = single_bucket_merge(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        merge,
    ).to_pandas()
    if len(merged) == 0:
        # empty key set → all-zero filter (prunes everything), not a crash
        return ray.put(np.zeros(nbytes, np.uint8))
    return ray.put(np.frombuffer(merged["bits"].iloc[0], np.uint8))


def bloom_prefilter(
    ds: rd.Dataset, col: str, bits_ref, n_bits: int = 1 << 20, k: int = 4
) -> rd.Dataset:
    """Map-only Bloom probe: drop rows whose key is definitely absent
    from the set the filter was built over.  NO false negatives (every
    true match survives); false positives pass through and MUST be
    removed by the exact join that follows — the standard shuffle-volume
    reducer for large⋈large joins at 100 TB (the exchange then carries
    only probable matches).  Kept/total row counts are metrics-reported
    (``bloom_kept`` / ``bloom_seen``)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        bits: np.ndarray = ray.get(bits_ref)
        if not len(batch):
            return batch
        pos = _bloom_hashes(batch[col], n_bits, k)
        hit = (
            (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        ).all(axis=0)
        metrics.incr("bloom_seen", len(batch))
        metrics.incr("bloom_kept", int(hit.sum()))
        return batch[hit.astype(bool)]

    return ds.map_batches(fn, batch_format="pandas", batch_size=32768)
