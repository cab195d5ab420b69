"""Compile-cache plumbing (utils/jax_cache): the driver cold-start fix
(VERDICT r3 item 3) depends on entries committed under bench_cache/ being
seeded into the live cache dir at startup — exercised here without any
XLA compile."""

import os

from paif_tpu.utils import jax_cache


def test_cache_dir_env_override(monkeypatch, tmp_path):
    monkeypatch.setenv("PAIF_JAX_CACHE", str(tmp_path / "x"))
    assert jax_cache.cache_dir() == str(tmp_path / "x")


def test_seed_from_copies_new_entries_only(tmp_path):
    src = tmp_path / "bench_cache"
    dst = tmp_path / "live"
    src.mkdir()
    dst.mkdir()
    (src / "entry_a").write_bytes(b"compiled-a")
    (src / "entry_b").write_bytes(b"compiled-b")
    (src / "subdir").mkdir()  # non-files must be skipped, not crash
    (dst / "entry_b").write_bytes(b"already-present")

    jax_cache._seed_from(src, str(dst))

    assert (dst / "entry_a").read_bytes() == b"compiled-a"
    # existing entries are never overwritten
    assert (dst / "entry_b").read_bytes() == b"already-present"


def test_seed_from_missing_src_is_noop(tmp_path):
    jax_cache._seed_from(tmp_path / "nope", str(tmp_path))  # no raise


def test_configure_seeds_bench_cache(monkeypatch, tmp_path):
    """configure_compile_cache must pull tracked bench_cache/ entries into
    the live dir so the driver's first bench.py run starts warm."""
    live = tmp_path / "live"
    monkeypatch.setenv("PAIF_JAX_CACHE", str(live))
    bench = jax_cache._repo_root() / "bench_cache"
    pre = set(os.listdir(bench)) if bench.is_dir() else set()
    d = jax_cache.configure_compile_cache()
    assert d == str(live)
    got = set(os.listdir(live))
    assert pre <= got  # every committed entry was seeded
