"""Deduplication family over document corpora.

Exact and near-dup operators, each expressed Ray-Data-first:

* ``exact_dedup``      — content-hash partition + per-group min-id keep.
* ``minhash_lsh_pairs``/``minhash_dup_groups`` — shingle → minhash
  signature → banded LSH buckets → candidate pairs → exact-Jaccard
  verification → min-label representative assignment.
* ``simhash_pairs``    — 64-bit simhash, 16-bit band blocking, Hamming
  verification.

Scale notes (the partitioning assumptions each operator relies on):
- signature/banding stages are map-only; the only shuffles are the
  bucketed groupbys on (band_id, band_hash) — bounded fan-in, skew-safe
  because identical band hashes ARE the near-dup signal.
- pair verification needs both texts; at corpus scale that is a
  hash-partitioned self-join on doc id (co-locate pair with both docs by
  bucketing pairs on each side). In-sandbox the text side is broadcast
  (``ray.put`` once) — swap ``_TextLookup`` for the partitioned join when
  the corpus no longer fits the object store.
- connected components for groups: min-label propagation over pair
  edges, iterated to fixpoint (bounded rounds); each round is one
  bucketed grouped min.
"""

from __future__ import annotations

import hashlib
import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .shuffle import bucketed_map_groups, grouped_agg

_MERSENNE = (1 << 61) - 1


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


# ---------------------------------------------------------------- exact
def exact_dedup(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Exact dedup: md5(text) → grouped min(id). Returns one row per
    distinct content: ``(doc_id=min id, content_hash, n_dups)``."""

    def hash_batch(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "content_hash": batch[text_col].map(_md5_hex),
                id_col: batch[id_col].to_numpy(),
                "n_dups": np.ones(len(batch), np.int64),
            }
        )

    hashed = ds.map_batches(hash_batch, batch_format="pandas", batch_size=8192)
    return grouped_agg(
        hashed,
        ["content_hash"],
        {id_col: "min", "n_dups": "sum"},
        num_buckets=num_buckets,
    )


# -------------------------------------------------------------- minhash
def _shingle_set(text: str, k: int, mode: str) -> set:
    if mode == "word":
        w = text.split()
        if len(w) < k:
            return {text}
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}
    if len(text) < k:
        return {text}
    return {text[i : i + k] for i in range(len(text) - k + 1)}


_FNV = np.uint64(1099511628211)


def _shingle_hashes(text: str, k: int, mode: str = "char") -> np.ndarray:
    """64-bit hashes of the unique k-shingles.

    Char mode is fully vectorized: UTF-8 byte windows × a polynomial
    rolling hash in natural uint64 wraparound (any deterministic 64-bit
    hash serves minhash; the md5-per-shingle Python loop was ~100× the
    cost of the rest of the signature). Word mode (few shingles per doc)
    keeps md5."""
    if mode == "word":
        shingles = _shingle_set(text, k, mode)
        return np.fromiter(
            (
                int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
                for s in shingles
            ),
            dtype=np.uint64,
            count=len(shingles),
        )
    data = text.encode("utf-8")
    if len(data) < k:
        return np.array(
            [int.from_bytes(hashlib.md5(data).digest()[:8], "big")],
            dtype=np.uint64,
        )
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    windows = np.lib.stride_tricks.sliding_window_view(b, k)
    powers = np.empty(k, dtype=np.uint64)
    acc = np.uint64(1)
    for i in range(k - 1, -1, -1):
        powers[i] = acc
        acc = acc * _FNV  # uint64 wraparound
    with np.errstate(over="ignore"):
        h = (windows * powers[None, :]).sum(axis=1, dtype=np.uint64)
    return np.unique(h)


class MinHasher:
    """Per-doc minhash signatures (n_perm universal hashes, vectorized
    over each doc's shingle set). Hash parameters derive from a fixed
    seed → identical across workers and runs."""

    def __init__(
        self,
        id_col: str = "doc_id",
        text_col: str = "text",
        n_perm: int = 128,
        shingle_k: int = 5,
        shingle_mode: str = "char",
        seed: int = 1234,
    ):
        rng = np.random.RandomState(seed)
        self.a = (
            rng.randint(1, _MERSENNE, size=n_perm, dtype=np.int64)
            .astype(np.uint64)
        )
        self.b = (
            rng.randint(0, _MERSENNE, size=n_perm, dtype=np.int64)
            .astype(np.uint64)
        )
        self.id_col = id_col
        self.text_col = text_col
        self.n_perm = n_perm
        self.k = shingle_k
        self.mode = shingle_mode

    def signature(self, text: str) -> np.ndarray:
        x = _shingle_hashes(text, self.k, self.mode)
        # (n_shingles, n_perm) universal hashing in uint64 modular space
        hv = (x[:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(
            _MERSENNE
        )
        return hv.min(axis=0)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in batch[self.text_col]])
        out = pd.DataFrame({self.id_col: batch[self.id_col].to_numpy()})
        out["sig"] = list(sigs)
        return out


class BandEmitter:
    """Signature → (band_id, band_hash, doc_id) rows for LSH blocking."""

    def __init__(self, id_col: str = "doc_id", n_bands: int = 32, n_perm: int = 128):
        assert n_perm % n_bands == 0
        self.id_col = id_col
        self.n_bands = n_bands
        self.rows_per_band = n_perm // n_bands

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, bands, hashes = [], [], []
        r = self.rows_per_band
        for doc_id, sig in zip(batch[self.id_col], batch["sig"]):
            sig = np.asarray(sig, dtype=np.uint64)
            for band in range(self.n_bands):
                chunk = sig[band * r : (band + 1) * r]
                hashes.append(hashlib.md5(chunk.tobytes()).hexdigest()[:16])
                bands.append(band)
                ids.append(doc_id)
        return pd.DataFrame(
            {
                "band_id": np.asarray(bands, np.int32),
                "band_hash": hashes,
                self.id_col: ids,
            }
        )


def _pairs_from_buckets(bucket: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """Within each (band_id, band_hash) group emit candidate id pairs."""
    outs_a, outs_b = [], []
    for _, sub in bucket.groupby(["band_id", "band_hash"], sort=False):
        if len(sub) < 2:
            continue
        ids = np.sort(sub[id_col].to_numpy())
        if len(ids) > 200:  # safety valve on degenerate buckets
            ids = ids[:200]
        ia, ib = np.triu_indices(len(ids), k=1)
        outs_a.append(ids[ia])
        outs_b.append(ids[ib])
    if not outs_a:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64")})
    return pd.DataFrame(
        {"id_a": np.concatenate(outs_a), "id_b": np.concatenate(outs_b)}
    ).drop_duplicates()


class _TextLookup:
    """Broadcast doc_id → text lookup (sandbox scale). At corpus scale
    replace with a bucketed self-join (see module docstring)."""

    def __init__(self, texts_ref):
        self.texts = ray.get(texts_ref)


class JaccardVerifier(_TextLookup):
    """Two-phase candidate verification:

    1. vectorized minhash-signature agreement estimate over the whole
       batch (broadcast signature matrix) — drops the vast majority of
       LSH collisions without touching text;
    2. exact character-shingle Jaccard for the survivors.

    The prefilter margin (threshold − 0.15) keeps estimator variance
    from rejecting true positives (σ ≈ 0.035 at n_perm=128 → 4σ)."""

    def __init__(
        self,
        texts_ref,
        shingle_k: int = 5,
        shingle_mode: str = "char",
        threshold: float = 0.8,
        sigs_ref=None,
    ):
        super().__init__(texts_ref)
        self.k = shingle_k
        self.mode = shingle_mode
        self.threshold = threshold
        if sigs_ref is not None:
            ids, mat = ray.get(sigs_ref) if not isinstance(sigs_ref, tuple) else sigs_ref
            self.sig_index = {i: j for j, i in enumerate(ids)}
            self.sig_matrix = mat
        else:
            self.sig_index = None
            self.sig_matrix = None

    def _shingles(self, text: str) -> set:
        return _shingle_set(text, self.k, self.mode)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            out = batch.copy()
            out["jaccard"] = pd.Series([], dtype=float)
            return out
        if self.sig_index is not None:
            ia = batch["id_a"].map(self.sig_index).to_numpy()
            ib = batch["id_b"].map(self.sig_index).to_numpy()
            est = (self.sig_matrix[ia] == self.sig_matrix[ib]).mean(axis=1)
            batch = batch[est >= self.threshold - 0.15]
        jac = []
        for a, b in zip(batch["id_a"], batch["id_b"]):
            sa, sb = self._shingles(self.texts[a]), self._shingles(self.texts[b])
            inter = len(sa & sb)
            jac.append(inter / (len(sa) + len(sb) - inter))
        out = batch.copy()
        out["jaccard"] = np.round(jac, 6)
        return out[out["jaccard"] >= self.threshold]


def minhash_lsh_pairs(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int = 128,
    n_bands: int = 32,
    shingle_k: int = 5,
    shingle_mode: str = "char",
    threshold: float = 0.8,
    num_buckets: int = 64,
    texts_ref=None,
) -> rd.Dataset:
    """Verified near-duplicate pairs (id_a < id_b, jaccard ≥ threshold)."""
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={
            "id_col": id_col,
            "text_col": text_col,
            "n_perm": n_perm,
            "shingle_k": shingle_k,
            "shingle_mode": shingle_mode,
        },
        batch_format="pandas",
        batch_size=1024,
        concurrency=(1, 8),
    )
    bands = sigs.map_batches(
        BandEmitter,
        fn_constructor_kwargs={
            "id_col": id_col,
            "n_bands": n_bands,
            "n_perm": n_perm,
        },
        batch_format="pandas",
        batch_size=1024,
        concurrency=(1, 4),
    )
    candidates = bucketed_map_groups(
        bands,
        ["band_id", "band_hash"],
        lambda bucket: _pairs_from_buckets(bucket, id_col),
        num_buckets=num_buckets,
    )
    from .shuffle import distinct

    candidates = distinct(candidates, ["id_a", "id_b"], num_buckets=num_buckets)
    if texts_ref is None:
        raise ValueError("texts_ref (ray.put of {doc_id: text}) is required")
    # broadcast the signature matrix for the vectorized prefilter
    # (n_docs × n_perm × 8B; at corpus scale swap for a bucketed join of
    # signatures onto pairs — same two-phase shape)
    sig_df = sigs.to_pandas()
    sigs_ref = ray.put(
        (sig_df[id_col].to_numpy(), np.stack(sig_df["sig"].to_numpy()))
    )
    return candidates.map_batches(
        JaccardVerifier,
        fn_constructor_kwargs={
            "texts_ref": texts_ref,
            "shingle_k": shingle_k,
            "shingle_mode": shingle_mode,
            "threshold": threshold,
            "sigs_ref": sigs_ref,
        },
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, 8),
    )


def dup_groups_from_pairs(pairs: rd.Dataset) -> rd.Dataset:
    """Connected components over verified near-dup pairs → one row per
    member node with its min-id representative: ``(doc_id, rep_id)``.

    The verified pair set is sparse (threshold-filtered), so union-find
    runs on the driver; if a corpus ever produces a pair set too large to
    collect, switch to iterated min-label propagation (each round one
    bucketed grouped min over the edge list)."""
    edges = pairs.to_pandas()
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(edges["id_a"], edges["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    nodes = sorted(set(edges["id_a"]) | set(edges["id_b"]))
    out = pd.DataFrame(
        {"doc_id": nodes, "rep_id": [find(n) for n in nodes]}
    )
    return rd.from_pandas(out) if len(out) else rd.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                      "rep_id": pd.Series([], dtype="int64")})
    )


# -------------------------------------------------------------- simhash
class SimHasher:
    """64-bit simhash over word tokens."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        import re

        self.id_col = id_col
        self.text_col = text_col
        self.word_re = re.compile(r"[A-Za-z0-9]+")

    _SHIFTS = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> np.uint64:
        toks = self.word_re.findall(text.lower())
        if not toks:
            return np.uint64(0)
        # vectorized: deterministic 64-bit token hashes (fixed-key
        # pandas hashing), bit-expand, signed sum per bit position
        h = pd.util.hash_pandas_object(
            pd.Series(toks, dtype=object), index=False
        ).to_numpy()
        bits = (h[:, None] >> self._SHIFTS[None, :]) & np.uint64(1)
        acc = np.where(bits == 1, 1, -1).sum(axis=0)
        out = np.uint64(0)
        for i in np.flatnonzero(acc > 0):
            out |= np.uint64(1) << np.uint64(i)
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col].to_numpy(),
                "simhash": [self.simhash(t) for t in batch[self.text_col]],
            }
        )


def simhash_pairs(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Near-dup pairs by simhash: block on each of the four 16-bit bands
    (pigeonhole: hamming ≤ 3 ⇒ at least one band identical), verify
    Hamming distance within candidate buckets."""
    sigs = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col},
        batch_format="pandas",
        batch_size=1024,
        concurrency=(1, 8),
    )

    def emit_bands(batch: pd.DataFrame) -> pd.DataFrame:
        sh = batch["simhash"].to_numpy().astype(np.uint64)
        ids = batch[id_col].to_numpy()
        frames = []
        for band in range(4):
            chunk = (sh >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            frames.append(
                pd.DataFrame(
                    {
                        "band_id": np.full(len(ids), band, np.int32),
                        "band_hash": chunk.astype("int64"),
                        id_col: ids,
                        "simhash": sh,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    bands = sigs.map_batches(emit_bands, batch_format="pandas")

    def pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, sub in bucket.groupby(["band_id", "band_hash"], sort=False):
            if len(sub) < 2 or len(sub) > 500:
                continue
            ids = sub[id_col].to_numpy()
            shs = sub["simhash"].to_numpy().astype(np.uint64)
            order = np.argsort(ids)
            ids, shs = ids[order], shs[order]
            ia, ib = np.triu_indices(len(ids), k=1)
            x = shs[ia] ^ shs[ib]
            ham = np.array([bin(int(v)).count("1") for v in x], np.int32)
            keep = ham <= 3
            outs.append(
                pd.DataFrame(
                    {
                        "id_a": ids[ia[keep]],
                        "id_b": ids[ib[keep]],
                        "hamming": ham[keep],
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype="int64"),
                    "id_b": pd.Series([], dtype="int64"),
                    "hamming": pd.Series([], dtype="int32"),
                }
            )
        return pd.concat(outs, ignore_index=True).drop_duplicates(
            subset=["id_a", "id_b"]
        )

    cand = bucketed_map_groups(
        bands, ["band_id", "band_hash"], pairs, num_buckets=num_buckets
    )
    from .shuffle import bucketed_map_groups as bmg

    return bmg(
        cand,
        ["id_a", "id_b"],
        lambda b: b.drop_duplicates(subset=["id_a", "id_b"]),
        num_buckets=num_buckets,
    )
