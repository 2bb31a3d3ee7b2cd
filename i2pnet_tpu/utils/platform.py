"""Platform selection workaround.

On images whose sitecustomize force-registers a TPU PJRT plugin, the
JAX_PLATFORMS env var alone does not deselect it; honor it explicitly
before the backend initializes. Call first thing in CLI mains.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    want = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if want and want != "axon":
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except RuntimeError:
            pass  # backend already initialized
