"""utils/compile_cache: persistent-cache enablement for the production CLIs.

bench.py/bench_train.py and the test suite always used the persistent XLA
compilation cache; these tests cover the utility that wires the same thing
into run_vqa/run_mimic/run_classify/serve (a restarted trainer or serving
replica must not pay the minutes-long TPU compile again).
"""

import os

import jax
import pytest

from mcan_vqa_tpu.utils import compile_cache


@pytest.fixture
def restore_cache_config():
    """The suite's conftest points JAX at its own cache dir; put it back."""
    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    yield
    jax.config.update("jax_compilation_cache_dir", old_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", old_min)


def test_enable_sets_config_and_creates_dir(tmp_path, restore_cache_config):
    target = str(tmp_path / "xla")
    got = compile_cache.enable(target, min_compile_secs=2.0)
    assert got == target
    assert os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 2.0


@pytest.mark.parametrize("value", ["off", "OFF", "none", "0", " disabled "])
def test_off_values_disable(value, restore_cache_config):
    before = jax.config.jax_compilation_cache_dir
    assert compile_cache.enable(value) is None
    assert jax.config.jax_compilation_cache_dir == before


def test_env_var_resolution(tmp_path, restore_cache_config, monkeypatch):
    target = str(tmp_path / "envcache")
    monkeypatch.setenv("MCAN_COMPILE_CACHE", target)
    assert compile_cache.enable() == target
    assert os.path.isdir(target)


def test_env_var_off(restore_cache_config, monkeypatch):
    monkeypatch.setenv("MCAN_COMPILE_CACHE", "off")
    assert compile_cache.enable() is None


def test_default_dir_is_under_home():
    assert compile_cache.default_cache_dir().startswith(
        os.path.expanduser("~"))


def test_run_vqa_flag_excluded_from_config():
    """--compile_cache must not leak into the Config override dict."""
    from mcan_vqa_tpu.cli import run_vqa
    args = run_vqa.parse_args(
        ["--run", "val", "--compile_cache", "off"])
    cfg = run_vqa.build_config(args)   # raises on unknown config keys
    assert not hasattr(cfg, "compile_cache")


def test_serve_cli_accepts_flag():
    from mcan_vqa_tpu.cli import serve
    args = serve.parse_args(["--synthetic", "--compile_cache", "off"])
    assert args.compile_cache == "off"
