"""Persistent XLA compile cache, pinned INSIDE the repo working tree.

Round-3 post-mortem (VERDICT r3 item 3): the driver's BENCH_r03 run paid
1225 s of compiles despite a warm /tmp/jax_cache, for two stacked reasons:
  1. the round-3 bench programs (chained-reps fwd/attack bodies) were new
     code, so no cache could have had them — the builder session must run
     the final bench.py once before the round ends; and
  2. /tmp does not reliably survive into the driver environment, while the
     repo checkout does.
Round-4 correction: the VM filesystem resets to the last-COMMITTED git
state between sessions, so a gitignored `.cache/jax` dies with the session
too. The live cache stays at `<repo>/.cache/jax` (fast, local), and the
entries for the driver-run programs are COMMITTED under `<repo>/bench_cache`
(tracked), which configure_compile_cache() seeds into the live dir at
startup. Entries are content-addressed by (jax version, backend, HLO), so
pre-seeding from another directory is safe.

Override with PAIF_JAX_CACHE=<dir> (e.g. a tmpfs for throwaway runs).
"""

from __future__ import annotations

import os
from pathlib import Path

_LEGACY_DIR = "/tmp/jax_cache"  # rounds 1-3 location: adopt its entries once


def _repo_root() -> Path:
    return Path(__file__).resolve().parents[2]


def cache_dir() -> str:
    env = os.environ.get("PAIF_JAX_CACHE")
    if env:
        return env
    return str(_repo_root() / ".cache" / "jax")


def _seed_from(src_dir, dst: str) -> None:
    """Hardlink (same fs) or copy entries from another cache dir, once."""
    try:
        src = Path(src_dir)
        if not src.is_dir():
            return
        dpath = Path(dst)
        for f in src.iterdir():
            if not f.is_file():
                continue
            target = dpath / f.name
            if target.exists():
                continue
            try:
                os.link(f, target)
            except OSError:
                import shutil

                shutil.copy2(f, target)
    except OSError:
        pass  # seeding is best-effort; a cold cache is correct, just slower


def configure_compile_cache() -> str:
    """Point jax's persistent compile cache at the repo-local directory.

    Call after `import jax` and before the first compile. Idempotent."""
    import jax

    d = cache_dir()
    os.makedirs(d, exist_ok=True)
    _seed_from(_LEGACY_DIR, d)
    # bench_cache/ is COMMITTED (round-4 discovery: the VM filesystem resets
    # to the last git commit between sessions, so a gitignored cache never
    # reaches the driver's bench run; only tracked entries survive). It holds
    # the driver-run programs (bench.py fwd/attack legs + graft entry).
    _seed_from(_repo_root() / "bench_cache", d)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return d
