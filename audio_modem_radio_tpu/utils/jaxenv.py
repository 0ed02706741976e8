"""JAX platform-selection helpers for the host entry points.

Some PJRT plugins register themselves from ``sitecustomize`` and ignore the
standard ``JAX_PLATFORMS`` environment variable (the axon TPU tunnel in this
image does). Entry points call :func:`honor_jax_platforms_env` so an operator
can still force a host-only run — e.g. when the accelerator link is down —
with the env var JAX users already know.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("audio_modem_radio_tpu")


def honor_jax_platforms_env() -> None:
    """Apply ``JAX_PLATFORMS=cpu`` through jax.config if the env asks for it.

    Must run before the process's first jnp use to take effect; afterwards
    jax raises, which is logged and swallowed (the backend is already up —
    nothing useful to do).
    """
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() != "cpu":
        return
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception as exc:  # backend already initialized, or no jax
        logger.warning("could not honor JAX_PLATFORMS=cpu: %s", exc)
