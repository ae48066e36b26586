"""Worker-import robustness.

Ray serializes task functions by module reference; a worker whose
interpreter can't import `parallel_louvain_method_ray` (driver launched from
another cwd, no install step allowed in this environment) would fail to
unpickle them. Registering the package's modules for pickle-BY-VALUE ships
the (tiny) module code with each task graph instead — no install, no
PYTHONPATH coupling. Idempotent; call again after importing new submodules.
"""

from __future__ import annotations

import sys

_registered: set[str] = set()


def ensure_registered() -> None:
    try:
        from ray import cloudpickle
    except Exception:  # pragma: no cover - ray always present here
        return
    for name, mod in list(sys.modules.items()):
        if (
            name.startswith("parallel_louvain_method_ray")
            and mod is not None
            and name not in _registered
        ):
            try:
                cloudpickle.register_pickle_by_value(mod)
                _registered.add(name)
            except Exception:
                pass
