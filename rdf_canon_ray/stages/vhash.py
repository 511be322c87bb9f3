"""Vectorized MD5 for short keys (RFC 1321, single-block fast path).

Several operators derive content-stable routing/ordering keys as
``md5(str(doc_id))`` because the DuckDB oracles replay the exact same
bytes with SQL ``md5()`` — so the hash FUNCTION is pinned and cannot be
swapped for a cheaper vectorized hash.  A per-row ``hashlib.md5`` loop
costs ~1 µs/row of pure Python dispatch plus hex parsing at most call
sites; this module instead runs the md5 compression function itself in
numpy across the whole batch (a ≤55-byte message is exactly one 64-byte
block, so the 64 rounds vectorize row-wise over (n,) uint32 lanes; the
message words are kept transposed (16, n) so each round's word gather
is contiguous).  Byte-identical to ``hashlib.md5`` — property-tested
against it in ``tests/test_vhash.py``.

Inputs longer than 55 bytes, with trailing NULs, or non-ASCII fall back
to ``hashlib`` row-wise (document TEXT hashing keeps using ``hashlib``
directly — multi-block vectorization isn't worth it there).

Sort-key call sites should prefer ``md5_u128be`` (two uint64 columns,
full 128-bit digest order == hexdigest lexicographic order) over
``md5_hex`` — boxing 32-char Python strings costs more than the hash."""

from __future__ import annotations

import binascii
import hashlib
from typing import Iterable

import numpy as np

# round constants K[i] = floor(|sin(i+1)| * 2^32) — the RFC 1321 table,
# derived (libm doubles are exact here: verified against hashlib)
_K = np.floor(
    np.abs(np.sin(np.arange(1, 65, dtype=np.float64))) * 2.0**32
).astype(np.uint64).astype(np.uint32)
_S = (
    [7, 12, 17, 22] * 4
    + [5, 9, 14, 20] * 4
    + [4, 11, 16, 23] * 4
    + [6, 10, 15, 21] * 4
)
_INIT = (0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476)


def _compress_t(MT: np.ndarray) -> np.ndarray:
    """One md5 compression over n single-block messages.
    ``MT``: (16, n) uint32 little-endian words (transposed so ``MT[g]``
    is contiguous) → (n, 4) uint32 state."""
    n = MT.shape[1]
    A = np.full(n, _INIT[0], np.uint32)
    B = np.full(n, _INIT[1], np.uint32)
    C = np.full(n, _INIT[2], np.uint32)
    D = np.full(n, _INIT[3], np.uint32)
    for i in range(64):
        if i < 16:
            F = (B & C) | (~B & D)
            g = i
        elif i < 32:
            F = (D & B) | (~D & C)
            g = (5 * i + 1) % 16
        elif i < 48:
            F = B ^ C ^ D
            g = (3 * i + 5) % 16
        else:
            F = C ^ (B | ~D)
            g = (7 * i) % 16
        x = A + F + _K[i] + MT[g]  # uint32 wrap-around adds
        s = _S[i]
        rot = (x << np.uint32(s)) | (x >> np.uint32(32 - s))
        A, D, C, B = D, C, B, B + rot
    out = np.empty((n, 4), np.uint32)
    out[:, 0] = A + np.uint32(_INIT[0])
    out[:, 1] = B + np.uint32(_INIT[1])
    out[:, 2] = C + np.uint32(_INIT[2])
    out[:, 3] = D + np.uint32(_INIT[3])
    return out


def _digest_fixed(b: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Digest (m, 16) uint8 for an S-dtype array whose true byte
    lengths are ``lens`` (every row ≤ 55 bytes — caller-checked)."""
    m = len(b)
    width = b.dtype.itemsize
    buf = np.zeros((m, 64), np.uint8)
    buf[:, :width] = np.frombuffer(b.tobytes(), np.uint8).reshape(m, width)
    buf[np.arange(m), lens] = 0x80
    bits = lens * 8  # ≤ 440 < 2^16
    buf[:, 56] = bits & 0xFF
    buf[:, 57] = bits >> 8
    MT = np.ascontiguousarray(buf.view("<u4").reshape(m, 16).T)
    state = _compress_t(MT)
    return state.astype("<u4").view(np.uint8).reshape(m, 16)


def md5_digest16(values) -> np.ndarray:
    """(n, 16) uint8 md5 digests, byte-identical to
    ``hashlib.md5(v.encode("utf-8")).digest()`` per row.  ``values``:
    array-like of str, OR an int64 ndarray (hashed as ``str(v)`` with a
    C-speed decimal conversion, no Python boxing)."""
    if isinstance(values, np.ndarray):
        arr = values
    elif hasattr(values, "to_numpy"):
        arr = values.to_numpy()
    else:
        # NEVER np.asarray(list_of_str): a U-dtype array silently strips
        # trailing NULs — build the object array directly
        vlist = list(values)
        arr = np.empty(len(vlist), object)
        arr[:] = vlist
    n = len(arr)
    if n == 0:
        return np.empty((0, 16), np.uint8)
    if arr.dtype.kind in "iu":
        b = arr.astype("S21")  # int64 decimal repr ≤ 20 chars
        return _digest_fixed(b, np.char.str_len(b).astype(np.int64))
    if arr.dtype.kind == "U":
        arr = arr.astype(object)
    out = np.empty((n, 16), np.uint8)
    try:
        b = arr.astype("S56")  # ASCII-strict; truncates ≥56-byte rows
    except UnicodeEncodeError:
        # non-ASCII somewhere: row-wise fallback for the whole batch
        for j, v in enumerate(arr):
            out[j] = np.frombuffer(
                hashlib.md5(str(v).encode("utf-8")).digest(), np.uint8
            )
        return out
    lens = np.char.str_len(b).astype(np.int64)
    orig = np.fromiter((len(v) for v in arr), np.int64, count=n)
    # slow rows: ≥56 bytes (won't fit one padded block / S56 truncated)
    # or trailing NULs (str_len understates; embedded NULs are FINE —
    # the fixed-width buffer preserves them and lens stays exact)
    slow = (orig >= 56) | (orig != lens)
    fast = ~slow
    if fast.any():
        out[fast] = _digest_fixed(b[fast], lens[fast])
    if slow.any():
        for j in np.flatnonzero(slow):
            out[j] = np.frombuffer(
                hashlib.md5(str(arr[j]).encode("utf-8")).digest(), np.uint8
            )
    return out


def md5_hex(values) -> np.ndarray:
    """Object array of 32-char lowercase hexdigests (``hexdigest()``
    parity)."""
    d = md5_digest16(values)
    if len(d) == 0:
        return np.asarray([], dtype=object)
    return np.frombuffer(
        binascii.hexlify(d.tobytes()), dtype="S32"
    ).astype("U32").astype(object)


def md5_u64be(values) -> np.ndarray:
    """uint64 array equal to ``int.from_bytes(digest[:8], "big")`` per
    row (the ``_md5_64`` convention: top 16 hex chars as one integer)."""
    d = md5_digest16(values)
    if len(d) == 0:
        return np.empty(0, np.uint64)
    return np.ascontiguousarray(d[:, :8]).view(">u8").ravel().astype(
        np.uint64
    )


def md5_u128be(values) -> tuple[np.ndarray, np.ndarray]:
    """(hi, lo) uint64 pair covering the WHOLE digest big-endian:
    sorting by (hi, lo) == sorting by ``hexdigest()`` lexicographically
    — the allocation-free replacement for hex-string sort keys."""
    d = md5_digest16(values)
    if len(d) == 0:
        e = np.empty(0, np.uint64)
        return e, e
    c = np.ascontiguousarray(d).view(">u8")
    return (
        c[:, 0].astype(np.uint64),
        c[:, 1].astype(np.uint64),
    )
