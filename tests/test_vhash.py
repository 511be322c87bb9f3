"""Vectorized md5 must be byte-identical to hashlib on every input."""

import hashlib

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rdf_canon_ray.stages import vhash


def _ref_hex(values):
    return [hashlib.md5(str(v).encode("utf-8")).hexdigest() for v in values]


def test_known_vectors():
    vals = ["", "a", "abc", "message digest", "12345", str(2**62), "x" * 55]
    assert list(vhash.md5_hex(vals)) == _ref_hex(vals)


def test_u64be_matches_int_from_bytes():
    vals = [str(i) for i in range(1000)]
    got = vhash.md5_u64be(vals)
    exp = [
        int.from_bytes(hashlib.md5(v.encode()).digest()[:8], "big")
        for v in vals
    ]
    assert got.tolist() == exp


def test_slow_paths_long_nul_unicode():
    vals = [
        "y" * 56,          # exactly at the truncation width
        "z" * 200,         # multi-block
        "a\x00b",          # embedded NUL
        "q" * 54 + "\x00", # trailing NUL at the fast-path boundary
        "héllo wörld",     # non-ASCII → whole-batch fallback
        "plain",
    ]
    assert list(vhash.md5_hex(vals)) == _ref_hex(vals)


def test_empty_batch():
    assert vhash.md5_hex([]).shape == (0,)
    assert vhash.md5_u64be([]).shape == (0,)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="ascii"),
            max_size=80,
        ),
        max_size=30,
    )
)
def test_property_matches_hashlib(vals):
    assert list(vhash.md5_hex(vals)) == _ref_hex(vals)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(max_size=120), max_size=20))
def test_property_unicode_fallback(vals):
    assert list(vhash.md5_hex(vals)) == _ref_hex(vals)


def test_digest_dtype_and_shape():
    d = vhash.md5_digest16(np.asarray(["a", "b"], dtype=object))
    assert d.shape == (2, 16) and d.dtype == np.uint8
