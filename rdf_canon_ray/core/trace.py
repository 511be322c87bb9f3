"""Structured canonicalization trace — the engine's equivalent of the
reference's optional YAML debug logger (`/root/reference/src/logger.rs`,
``log`` cargo feature; golden examples in `tests/rdfc10_supplement/`).

Same spec log points (``ca``, ``ca.2`` … ``ca.6``, ``h1dq``, ``hndq``),
rendered as indented YAML.  Quad order inside lists follows this engine's
deterministic input order (the reference's traces follow oxrdf's internal
index order and are not asserted by its tests, so byte-parity is neither
possible nor meaningful — structural parity is).
"""

from __future__ import annotations

from typing import Any, Dict, List


class CanonTrace:
    """Collects the canonicalization steps for one dataset."""

    def __init__(self):
        self.mention_map: Dict[str, List[str]] = {}
        self.h1dq: List[dict] = []
        self.unique_assignments: List[dict] = []
        self.shared_groups: List[dict] = []
        self.final_map: Dict[str, str] = {}

    # -- renderers -----------------------------------------------------
    def to_dict(self) -> dict:
        return {
            "ca": {
                "log point": "Entering the canonicalization function (4.4.3).",
                "ca.2": {
                    "log point": "Extract quads for each bnode (4.4.3 (2)).",
                    "Bnode to quads": self.mention_map,
                },
                "ca.3": {
                    "log point": "Calculated first degree hashes (4.4.3 (3)).",
                    "with": self.h1dq,
                },
                "ca.4": {
                    "log point": (
                        "Create canonical replacements for hashes mapping"
                        " to a single node (4.4.3 (4))."
                    ),
                    "with": self.unique_assignments,
                },
                "ca.5": {
                    "log point": (
                        "Calculate hashes for identifiers with shared"
                        " hashes (4.4.3 (5))."
                    ),
                    "with": self.shared_groups,
                },
                "ca.6": {
                    "log point": (
                        "Replace original with canonical labels (4.4.3 (6))."
                    ),
                    "issued identifiers map": dict(self.final_map),
                },
            }
        }

    def to_yaml(self) -> str:
        out: List[str] = []
        _render(self.to_dict(), out, 0)
        return "\n".join(out) + "\n"


def _render(obj: Any, out: List[str], indent: int) -> None:
    pad = "  " * indent
    if isinstance(obj, dict):
        for k, v in obj.items():
            if isinstance(v, (dict, list)) and v:
                out.append(f"{pad}{k}:")
                _render(v, out, indent + 1)
            else:
                out.append(f"{pad}{k}: {_scalar(v)}")
    elif isinstance(obj, list):
        for item in obj:
            if isinstance(item, dict) and item:
                first = True
                for k, v in item.items():
                    lead = f"{pad}- " if first else f"{pad}  "
                    if isinstance(v, (dict, list)) and v:
                        out.append(f"{lead}{k}:")
                        _render(v, out, indent + 2)
                    else:
                        out.append(f"{lead}{k}: {_scalar(v)}")
                    first = False
            else:
                out.append(f"{pad}- {_scalar(item)}")


def _scalar(v: Any) -> str:
    if isinstance(v, dict) and not v:
        return "{}"
    if isinstance(v, list) and not v:
        return "[]"
    return str(v)
