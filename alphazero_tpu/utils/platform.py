"""Platform selection helper.

The axon container's sitecustomize registers the tunneled TPU backend and
programmatically sets ``jax_platforms="axon,cpu"`` — overriding the
``JAX_PLATFORMS`` env var.  CLI entry points call ``apply_env_platform()``
first so ``JAX_PLATFORMS=cpu python -m alphazero_tpu...`` behaves as
documented (fast CPU drives without touching the chip)."""
from __future__ import annotations

import os


def apply_env_platform() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
