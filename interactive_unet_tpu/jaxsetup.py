"""Process-wide JAX runtime setup (persistent compilation cache).

Interactive latency lives or dies on avoiding recompiles (SURVEY hard part
#2): the packed-slice gather program alone costs minutes to compile on the
TPU runtime, and the app runs training in a *fresh subprocess* per click
(reference app.py:719 process model), so in-process jit caches never help
across clicks.  The JAX persistent compilation cache makes every compile a
once-per-machine cost: measured on the v5e runtime, a cached program loads
in ~20 ms vs ~0.7 s (small) / minutes (scan programs) to recompile.

Opt out with IUNET_JAX_CACHE=0; override the location with
IUNET_JAX_CACHE=/path or JAX's own JAX_COMPILATION_CACHE_DIR.
"""

from __future__ import annotations

import os

_DONE = False


def enable_compile_cache() -> None:
    """Idempotent; called from every jax-using subpackage's __init__."""
    global _DONE
    if _DONE:
        return
    _DONE = True

    loc = os.environ.get("IUNET_JAX_CACHE", "")
    if loc.lower() in ("0", "off", "none", "disabled"):
        return

    import jax

    if jax.config.jax_compilation_cache_dir:
        return  # user already configured one; respect it
    # NOTE: this jax build does NOT honor the JAX_COMPILATION_CACHE_DIR env
    # var by itself (verified: config stays None with it exported) — apply it
    # explicitly so the standard env contract still works.
    cache_dir = (loc or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "interactive_unet_tpu", "jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never fail startup over it
