"""JSONL (newline-delimited JSON) source/sink — the interchange format
corpora usually arrive in before parquet conversion.

Writer: hash-partitioned layout (``part=N/data.jsonl``, one ingest-time
shuffle) with an atomic tmp-dir rename — the same resumable-output
doctrine as the parquet sinks: partition contents are a pure function of
the key, independent of block order, so reruns and consumers can address
partitions deterministically.

Reader: ``ray.data.read_json`` over the partition directory (newline-
delimited JSON is Ray's native JSON flavor) — streaming, splittable,
schema inferred per block.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
import ray.data as rd

from ..stages.shuffle import add_bucket


def write_jsonl_partitioned(
    ds: rd.Dataset,
    out_dir: str,
    key_cols: list[str],
    num_buckets: int = 64,
    if_exists: str = "error",
) -> str:
    """Write ``ds`` as hash-partitioned JSONL under ``out_dir`` (atomic:
    written to a tmp dir, renamed on success).  Rows land in
    ``part=hash(key) % num_buckets`` regardless of input block order.

    ``if_exists``: ``"error"`` (default — a sink must never silently
    leave old data in place of what it claims to have written) or
    ``"skip"`` for deterministic-cache callers, where an existing
    non-empty target is the SAME content and concurrent builders may
    race benignly (the atomic publish resolves the race)."""
    if if_exists not in ("error", "skip"):
        raise ValueError(f"if_exists must be 'error' or 'skip', got {if_exists!r}")
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        if if_exists == "skip":
            return out_dir
        raise FileExistsError(
            f"write_jsonl_partitioned: {out_dir} already exists and is "
            "non-empty — remove it (or write elsewhere) first"
        )
    tmp = out_dir + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)

    def write_bucket(group: pd.DataFrame) -> pd.DataFrame:
        b = int(group["_bucket"].iloc[0])
        pdir = os.path.join(tmp, f"part={b}")
        os.makedirs(pdir, exist_ok=True)
        group.drop(columns=["_bucket"]).sort_values(
            key_cols, kind="mergesort"
        ).to_json(
            os.path.join(pdir, "data.jsonl"),
            orient="records",
            lines=True,
            force_ascii=False,
        )
        return pd.DataFrame({"bucket": [b], "rows": [len(group)]})

    (
        ds.map_batches(
            lambda b: add_bucket(b, key_cols, num_buckets),
            batch_format="pandas",
            batch_size=32768,
        )
        .groupby("_bucket")
        .map_groups(write_bucket, batch_format="pandas")
        .count()
    )
    from ..util import atomic_publish_dir

    return atomic_publish_dir(tmp, out_dir)


def read_jsonl(path: str) -> rd.Dataset:
    """Streaming JSONL read over a partition directory (or single file)."""
    return rd.read_json(path, file_extensions=["jsonl"])
