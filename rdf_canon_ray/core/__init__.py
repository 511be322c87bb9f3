"""Pure-Python RDFC-1.0 core: quad model, N-Quads I/O, canonicalization.

No Ray dependency — this package is the per-graph kernel that the
distributed stages drop into ``map_groups`` / ``map_batches``.
"""

from .canon import (
    CanonicalizationError,
    CanonicalIdentifierNotExist,
    HndqCallLimitExceeded,
    IdentifierIssuer,
    QuadsNotExist,
    canonicalize,
    dedup_quads,
    issue,
    relabel,
    serialize,
    sort_quads,
)
from .terms import (
    BNODE,
    DEFAULT,
    IRI,
    LITERAL,
    Quad,
    make_quad,
    quad_to_line,
    quad_to_string,
    term_to_string,
)
from . import nquads

__all__ = [
    "BNODE",
    "DEFAULT",
    "IRI",
    "LITERAL",
    "Quad",
    "make_quad",
    "quad_to_line",
    "quad_to_string",
    "term_to_string",
    "nquads",
    "CanonicalizationError",
    "CanonicalIdentifierNotExist",
    "HndqCallLimitExceeded",
    "QuadsNotExist",
    "IdentifierIssuer",
    "canonicalize",
    "dedup_quads",
    "issue",
    "relabel",
    "serialize",
    "sort_quads",
]
