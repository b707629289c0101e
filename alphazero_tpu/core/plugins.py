"""Game plugin loading.

Parity target: the reference ``PluginLoader`` (dlopen'd shared objects
registering into GameRegistry via a C ABI,
``include/alphazero/core/plugin_loader.h:19-72``, ``plugin_api.h``).  The
TPU-framework analog: a plugin is any importable module (or installed
package advertising the ``alphazero_tpu.games`` entry point) that exposes
``register(register_game)`` — it registers env factories into the same
registry the built-ins use.
"""
from __future__ import annotations

import importlib
import importlib.metadata
import logging
import os
import sys
from typing import List

from alphazero_tpu.core.registry import register_game

log = logging.getLogger("alphazero_tpu.plugins")

ENTRY_POINT_GROUP = "alphazero_tpu.games"


def load_plugin(module_name: str) -> bool:
    """Import a module and call its ``register(register_game)`` hook
    (the dlopen + registerPlugin equivalent)."""
    mod = importlib.import_module(module_name)
    hook = getattr(mod, "register", None)
    if hook is None:
        raise AttributeError(
            f"plugin module {module_name!r} has no register() hook"
        )
    hook(register_game)
    log.info("loaded game plugin %s", module_name)
    return True


def load_directory(path: str) -> List[str]:
    """Import every ``*_plugin.py`` in a directory (PluginLoader::
    loadDirectory equivalent)."""
    loaded = []
    if not os.path.isdir(path):
        return loaded
    sys.path.insert(0, path)
    try:
        for fname in sorted(os.listdir(path)):
            if fname.endswith("_plugin.py"):
                name = fname[:-3]
                load_plugin(name)
                loaded.append(name)
    finally:
        sys.path.pop(0)
    return loaded


def load_entry_points() -> List[str]:
    """Discover installed plugin packages via the entry-point group."""
    loaded = []
    try:
        eps = importlib.metadata.entry_points(group=ENTRY_POINT_GROUP)
    except TypeError:  # older API
        eps = importlib.metadata.entry_points().get(ENTRY_POINT_GROUP, [])
    for ep in eps:
        hook = ep.load()
        hook(register_game)
        loaded.append(ep.name)
        log.info("loaded game plugin entry point %s", ep.name)
    return loaded
