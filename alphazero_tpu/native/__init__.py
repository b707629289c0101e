"""Native host-side helpers.

The reference implements its runtime in C++ (SURVEY.md §2); on TPU the
compute path is jitted XLA, but host-side serialization still benefits from
native code.  This package builds the ``_azrecord`` CPython extension on
first use (g++, no external deps) and transparently falls back to pure
Python when a toolchain is unavailable.
"""
from __future__ import annotations

import logging
import os
import subprocess
import sys
import sysconfig

log = logging.getLogger("alphazero_tpu.native")

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "azrecord.cpp")
_SO = os.path.join(_DIR, f"_azrecord{sysconfig.get_config_var('EXT_SUFFIX')}")

_azrecord = None
_build_attempted = False


def _build() -> bool:
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        log.debug("native build failed: %s", e)
        return False


def get_azrecord():
    """The compiled module, building it on demand; None if unavailable."""
    global _azrecord, _build_attempted
    if _azrecord is not None:
        return _azrecord
    # Rebuild when the source is newer than the compiled extension.
    if (os.path.exists(_SO)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
        try:
            os.remove(_SO)
        except OSError:
            pass
    if not os.path.exists(_SO):
        if _build_attempted:
            return None
        _build_attempted = True
        if not _build():
            return None
    if _DIR not in sys.path:
        sys.path.insert(0, _DIR)
    try:
        import _azrecord as mod  # noqa: PLC0415

        _azrecord = mod
        return mod
    except ImportError as e:
        log.debug("native import failed: %s", e)
        return None
