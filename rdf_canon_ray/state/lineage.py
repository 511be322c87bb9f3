"""Resumable partitioned output with per-partition lineage.

"Resumable from checkpoint" for a batch pipeline means: output is laid
out as one directory per key-range partition, each written atomically
(temp dir + rename, ``_SUCCESS`` marker + ``manifest.json`` lineage),
so a rerun after a crash

  1. lists completed partitions (cheap metadata scan),
  2. filters them out of the *input* before the shuffle (no recompute,
     no reshuffle of finished work),
  3. processes only the remaining buckets.

The partition key is the same hash bucket used by the engine's bucketed
shuffles — one partitioning decision reused across stages.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable, Sequence, Set

import numpy as np
import pandas as pd
import ray.data as rd

from ..stages.shuffle import add_bucket


def completed_buckets(
    out_root: str,
    num_buckets: int | None = None,
    input_tag: str | None = None,
) -> Set[int]:
    """Buckets with a ``_SUCCESS`` marker whose manifest matches the
    current run.  When ``num_buckets``/``input_tag`` are given, a
    partition written under a different bucket count or input is NOT
    treated as complete (it would silently mix stale rows into the
    output) — it gets rewritten instead."""
    done = set()
    if not os.path.isdir(out_root):
        return done
    for name in os.listdir(out_root):
        part_dir = os.path.join(out_root, name)
        if not name.startswith("bucket=") or not os.path.exists(
            os.path.join(part_dir, "_SUCCESS")
        ):
            continue
        if num_buckets is not None or input_tag is not None:
            try:
                with open(os.path.join(part_dir, "manifest.json")) as f:
                    manifest = json.load(f)
            except (OSError, ValueError):
                continue  # unreadable lineage → rewrite
            if num_buckets is not None and manifest.get("num_buckets") != num_buckets:
                continue
            if input_tag is not None and manifest.get("input") != input_tag:
                continue
        done.add(int(name.split("=", 1)[1]))
    return done


def read_output(out_root: str) -> rd.Dataset:
    parts = [
        os.path.join(out_root, name, "part.parquet")
        for name in sorted(os.listdir(out_root))
        if name.startswith("bucket=")
        and os.path.exists(os.path.join(out_root, name, "_SUCCESS"))
    ]
    return rd.read_parquet(parts)


def resumable_bucket_run(
    ds: rd.Dataset,
    keys: Sequence[str],
    bucket_fn: Callable[[pd.DataFrame], pd.DataFrame],
    out_root: str,
    num_buckets: int = 64,
    input_tag: str = "",
) -> pd.DataFrame:
    """Run ``bucket_fn`` per hash bucket, writing each bucket's result as
    an atomic parquet partition; buckets already marked complete are
    skipped at the *input filter*, before any shuffle work.

    Returns the run summary (bucket, rows, status, seconds) including
    previously-completed partitions (status="skipped")."""
    keys = list(keys)
    os.makedirs(out_root, exist_ok=True)
    done = completed_buckets(out_root, num_buckets=num_buckets, input_tag=input_tag)

    def prepare(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            out = batch.copy()
            out["_bucket"] = pd.Series([], dtype=np.int32)
            return out
        out = add_bucket(batch, keys, num_buckets)
        if done:
            out = out[~out["_bucket"].isin(done)]
        return out

    def run_and_write(group: pd.DataFrame) -> pd.DataFrame:
        bucket = int(group["_bucket"].iloc[0])
        t0 = time.time()
        result = bucket_fn(group.drop(columns=["_bucket"]))
        part_dir = os.path.join(out_root, f"bucket={bucket}")
        tmp_dir = part_dir + ".tmp"
        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir)
        os.makedirs(tmp_dir)
        result.to_parquet(os.path.join(tmp_dir, "part.parquet"), index=False)
        with open(os.path.join(tmp_dir, "manifest.json"), "w") as f:
            json.dump(
                {
                    "bucket": bucket,
                    "rows_in": int(len(group)),
                    "rows_out": int(len(result)),
                    "input": input_tag,
                    "keys": keys,
                    "num_buckets": num_buckets,
                    "wall_sec": round(time.time() - t0, 3),
                },
                f,
            )
        open(os.path.join(tmp_dir, "_SUCCESS"), "w").close()
        if os.path.isdir(part_dir):
            shutil.rmtree(part_dir)
        os.rename(tmp_dir, part_dir)
        return pd.DataFrame(
            {
                "bucket": [bucket],
                "rows": [len(result)],
                "status": ["written"],
                "seconds": [round(time.time() - t0, 3)],
            }
        )

    summary = (
        ds.map_batches(prepare, batch_format="pandas", batch_size=32768)
        .groupby("_bucket")
        .map_groups(run_and_write, batch_format="pandas")
        .to_pandas()
    )
    skipped = pd.DataFrame(
        {
            "bucket": sorted(done),
            "rows": [-1] * len(done),
            "status": ["skipped"] * len(done),
            "seconds": [0.0] * len(done),
        }
    )
    return pd.concat([summary, skipped], ignore_index=True)
