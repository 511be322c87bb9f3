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
    # Load EVERY package module up front so the registration below covers
    # them even when callers import lazily (a module imported after
    # registration would ship by reference and fail on workers).
    import importlib
    import pkgutil

    import rdf_canon_ray

    for mod_info in pkgutil.walk_packages(
        rdf_canon_ray.__path__, prefix="rdf_canon_ray."
    ):
        if mod_info.name.endswith("__main__"):
            continue  # CLI module; importing it under runpy warns
        try:
            importlib.import_module(mod_info.name)
        except Exception:
            pass
    for name, mod in list(sys.modules.items()):
        if mod is None or not name.startswith("rdf_canon_ray"):
            continue
        try:
            cp.register_pickle_by_value(mod)
        except Exception:
            pass
