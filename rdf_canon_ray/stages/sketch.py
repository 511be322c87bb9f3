"""Mergeable sketches for corpus monitoring at scale.

At 100 TB, "how many distinct terms per source" must not shuffle the
distinct pairs themselves when only the COUNT is needed.  A mergeable
sketch gives the counter in one pass: per-batch partial sketches →
one tiny keyed exchange of fixed-size register blocks → merge is
elementwise max.  The exchange volume is ``|groups| × 2^p bytes ×
num_blocks`` regardless of corpus size.

The sketch is a standard dense HyperLogLog (Flajolet et al. 2007,
with the linear-counting small-range correction): ``2^p`` one-byte
registers, register index = low ``p`` bits of a 64-bit hash, rho =
position of the first set bit of the remaining bits.  Hashing is
``pd.util.hash_pandas_object`` (vectorized siphash with a fixed key —
deterministic across processes and runs, no PYTHONHASHSEED
dependence), so partials merge associatively and repeated runs agree
bit-for-bit; the estimate is approximate by design → the query is
rows-only, bounded against the EXACT oracle-checked companion in
pytest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .shuffle import bucketed_map_groups


def _hash64(values: pd.Series) -> np.ndarray:
    """Deterministic vectorized 64-bit hashes of a string Series."""
    return pd.util.hash_pandas_object(values, index=False).to_numpy()


def _registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """Dense HLL register block from a hash array."""
    m = 1 << p
    idx = (hashes & np.uint64(m - 1)).astype(np.int64)
    rest = hashes >> np.uint64(p)
    # rho = 1-based position of first set bit in the top (64-p) bits;
    # rest == 0 → all zeros → rho = 64 - p + 1
    width = 64 - p
    nz = rest != 0
    # exact bit_length without float rounding risk: split into 32-bit
    # halves (float64 frexp is exact below 2^53, 32-bit is safe)
    hi = (rest >> np.uint64(32)).astype(np.int64)
    lo = (rest & np.uint64(0xFFFFFFFF)).astype(np.int64)
    bl_hi = np.where(hi > 0, np.frexp(np.maximum(hi, 1).astype(np.float64))[1], 0)
    bl_lo = np.where(lo > 0, np.frexp(np.maximum(lo, 1).astype(np.float64))[1], 0)
    bitlen = np.where(hi > 0, bl_hi + 32, bl_lo)
    rho = np.where(nz, width - bitlen + 1, width + 1).astype(np.int64)
    regs = np.zeros(m, np.uint8)
    np.maximum.at(regs, idx, rho.astype(np.uint8))
    return regs


def _estimate(regs: np.ndarray, p: int) -> int:
    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    r = regs.astype(np.float64)
    est = alpha * m * m / np.sum(np.power(2.0, -r))
    if est <= 2.5 * m:
        zeros = int((regs == 0).sum())
        if zeros:
            est = m * np.log(m / zeros)
    return int(round(est))


def approx_distinct(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    p: int = 12,
    num_buckets: int = 8,
) -> rd.Dataset:
    """Per-key approximate distinct count of ``value_col`` via HLL:
    per-batch register partials, one keyed exchange of register blocks,
    elementwise-max merge + estimate in-bucket.  Output:
    (key_col, approx_distinct)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, sub in batch.groupby(key_col, sort=False):
            vals = sub[value_col].drop_duplicates()
            regs = _registers(_hash64(vals), p)
            rows.append({key_col: key, "regs": regs.tobytes()})
        return pd.DataFrame(rows)

    partials = ds.map_batches(
        partial, batch_format="pandas", batch_size=32768
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, sub in bucket.groupby(key_col, sort=False):
            blocks = np.stack(
                [np.frombuffer(b, np.uint8) for b in sub["regs"]]
            )
            regs = blocks.max(axis=0)
            rows.append(
                {key_col: key, "approx_distinct": _estimate(regs, p)}
            )
        out = pd.DataFrame(rows)
        out["approx_distinct"] = out["approx_distinct"].astype("int64")
        return out

    return bucketed_map_groups(partials, [key_col], merge, num_buckets)
