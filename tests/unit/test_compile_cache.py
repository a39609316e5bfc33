"""compile_cache.enable_persistent_compile_cache: directory creation, env
override, and JAX config effect (pure-config test, no device work)."""
import jax

from auralis_tpu.common.compile_cache import enable_persistent_compile_cache


def test_enable_sets_config_and_creates_dir(tmp_path, monkeypatch):
    target = tmp_path / "xla_cache"
    prev = jax.config.jax_compilation_cache_dir
    try:
        assert enable_persistent_compile_cache(str(target)) is True
        assert target.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(target)
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.0
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_env_var_override(tmp_path, monkeypatch):
    target = tmp_path / "from_env"
    prev = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("AURALIS_XLA_CACHE_DIR", str(target))
    try:
        assert enable_persistent_compile_cache() is True
        assert target.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(target)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
