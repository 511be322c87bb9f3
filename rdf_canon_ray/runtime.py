"""Runtime robustness helpers (no ``ray.init`` here — the driver owns the
session)."""

from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ensure_importable() -> None:
    """Make rdf_canon_ray UDFs runnable on Ray workers regardless of the
    driver's cwd / PYTHONPATH.

    Workers resolve by-reference-pickled classes via their own import
    path; when the driver found this package through a ``sys.path`` edit
    the workers would fail with ModuleNotFoundError.  Registering the
    package's loaded modules for cloudpickle *by-value* serialization
    ships the code with each task instead."""
    if _REPO_ROOT not in sys.path:
        sys.path.insert(0, _REPO_ROOT)
    try:
        from ray import cloudpickle as cp
    except Exception:  # pragma: no cover - ray not installed
        return
    # Load every UDF-bearing module up front so the registration below
    # covers them even when callers import lazily.
    import importlib

    for name in (
        "rdf_canon_ray.core",
        "rdf_canon_ray.transcripts.gen",
        "rdf_canon_ray.transcripts.extract",
        "rdf_canon_ray.stages.shuffle",
        "rdf_canon_ray.stages.canonicalize",
        "rdf_canon_ray.sources.nquads",
        "rdf_canon_ray.pipelines.kg",
    ):
        try:
            importlib.import_module(name)
        except Exception:
            pass
    for name, mod in list(sys.modules.items()):
        if mod is None or not name.startswith("rdf_canon_ray"):
            continue
        try:
            cp.register_pickle_by_value(mod)
        except Exception:
            pass
