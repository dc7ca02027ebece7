"""Plugin framework: user-dropped operator packages, Spark-first.

Mirrors the reference's plugin contract
(/root/reference/howard/functions/plugins.py:1-124 and
/root/reference/plugins/*/__init__.py): a plugin is a directory with an
``__init__.py`` declaring ``__description__``, ``__version__``,
``__enabled__``, ``__main_file__`` and ``__main_function__``, gated by
the plugin root's ``__init__.py`` ``__all__`` list — BOTH flags must be
on for a plugin to load. Where the reference hands plugins a DuckDB
``Variants`` object, ours receive the :class:`~howard_spark.engine.
Engine` facade (so a plugin body is ordinary lazy DataFrame code and
composes with the whole pipeline before one execution).

The built-in ``minimalize`` operation ships as a first-class Engine
method (engine.py) rather than a plugin — the framework here is for
user extensions.
"""

from __future__ import annotations

import importlib.util
import os
from typing import Any

_META_KEYS = ("__description__", "__version__", "__enabled__",
              "__main_file__", "__main_function__")


def _load_module(qualname: str, path: str):
    spec = importlib.util.spec_from_file_location(qualname, path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def discover_plugins(plugins_dir: str) -> dict[str, dict[str, Any]]:
    """Scan ``plugins_dir`` for plugin packages and return
    name -> metadata (the reference's ``plugins_infos`` +
    ``plugins_list`` in one pass: module attributes plus the root
    ``__all__`` 'enabled' gate)."""
    root_init = os.path.join(plugins_dir, "__init__.py")
    enabled_names: list[str] = []
    if os.path.exists(root_init):
        enabled_names = getattr(
            _load_module("hs_plugins", root_init), "__all__", [])

    plugins: dict[str, dict[str, Any]] = {}
    if not os.path.isdir(plugins_dir):
        return plugins
    for name in sorted(os.listdir(plugins_dir)):
        init = os.path.join(plugins_dir, name, "__init__.py")
        if not os.path.exists(init):
            continue
        module = _load_module(f"hs_plugins.{name}", init)
        meta = {k: getattr(module, k, None) for k in _META_KEYS}
        meta["enabled"] = bool(name in enabled_names
                               and meta.get("__enabled__"))
        plugins[name] = meta
    return plugins


def loadable_plugins(plugins_dir: str) -> dict[str, dict[str, Any]]:
    """Only the plugins with BOTH enable flags on (the reference's
    ``plugins_to_load`` filter)."""
    return {n: m for n, m in discover_plugins(plugins_dir).items()
            if m["enabled"]}


def run_plugin(plugins_dir: str, name: str, engine, **kwargs):
    """Dispatch a plugin's main function against an Engine.

    Loads ``<plugins_dir>/<name>/<__main_file__>.py`` and calls its
    ``__main_function__`` as ``fn(engine, **kwargs)``; returns whatever
    the plugin returns (conventionally the Engine, for chaining)."""
    meta = discover_plugins(plugins_dir).get(name)
    if meta is None:
        raise ValueError(f"unknown plugin {name!r} in {plugins_dir}")
    if not meta["enabled"]:
        raise ValueError(f"plugin {name!r} is disabled "
                         f"(root __all__ + __enabled__ must both be on)")
    main_file = meta.get("__main_file__") or "__main__"
    fn_name = meta.get("__main_function__") or "main"
    mod = _load_module(
        f"hs_plugins.{name}.{main_file}",
        os.path.join(plugins_dir, name, f"{main_file}.py"))
    fn = getattr(mod, fn_name, None)
    if fn is None:
        raise ValueError(
            f"plugin {name!r}: {main_file}.py has no {fn_name}()")
    return fn(engine, **kwargs)
