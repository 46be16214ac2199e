"""Persistent XLA compilation cache wiring (`tensoralloy_tpu/cache.py`).

The cold one-shot serving call pays 83–177 s of TPU compile
(`artifacts/bench_oneshot_r5.json`); the persistent cache makes every
process after the first start warm. These tests pin the *wiring*
(backend gating, env opt-out, idempotence, config propagation) — the
actual executable reuse is a jax feature exercised on chip.
"""
import importlib
import os

import jax


def _fresh():
    import tensoralloy_tpu.cache as c
    importlib.reload(c)
    return c


def test_cpu_backend_skipped_by_default():
    c = _fresh()
    assert c.enable_compilation_cache() is False   # conftest pins cpu


def test_env_opt_out(monkeypatch):
    c = _fresh()
    monkeypatch.setenv("TENSORALLOY_NO_CACHE", "1")
    assert c.enable_compilation_cache(include_cpu=True) is False


def test_enable_sets_config_and_is_idempotent(tmp_path):
    c = _fresh()
    old = jax.config.jax_compilation_cache_dir
    try:
        assert c.enable_compilation_cache(
            cache_dir=str(tmp_path / "xla"), include_cpu=True) is True
        assert jax.config.jax_compilation_cache_dir == \
            str(tmp_path / "xla")
        assert os.path.isdir(tmp_path / "xla")
        # second call is a no-op (does not re-point the cache)
        assert c.enable_compilation_cache(
            cache_dir=str(tmp_path / "other"), include_cpu=True) is True
        assert jax.config.jax_compilation_cache_dir == \
            str(tmp_path / "xla")
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def test_calculator_does_not_initialize_backend_eagerly():
    """The cache hook must never call jax.default_backend() on the
    skip path (initializing the TPU plugin can block for minutes when
    another process holds the tunnel)."""
    import inspect
    import tensoralloy_tpu.cache as c
    src = inspect.getsource(c)
    assert "default_backend(" not in src
