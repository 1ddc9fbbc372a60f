"""Auto-resolution of the training attention/remat knobs."""

import jax

from stonkgs_tpu.parallel.mesh import make_mesh
from stonkgs_tpu.train.pretraining import resolve_train_impl


def test_cpu_auto_is_xla_full():
    assert jax.default_backend() == "cpu"  # conftest forces the CPU mesh
    assert resolve_train_impl() == ("full", "xla")
    assert resolve_train_impl("auto", "auto") == ("full", "xla")


def test_explicit_values_pass_through():
    assert resolve_train_impl("attention", "xla") == ("attention", "xla")
    assert resolve_train_impl("none", "xla") == (False, "xla")
    assert resolve_train_impl(False, "xla") == (False, "xla")
    # legacy boolean remat maps to full-layer checkpointing
    assert resolve_train_impl(True, "xla") == ("full", "xla")


def test_explicit_flash_on_multi_device_mesh_wraps_shard_map():
    mesh = make_mesh(n_data=4, n_model=2)
    remat, impl = resolve_train_impl("auto", "flash", mesh)
    assert impl == ("flash", mesh)
    # off-TPU (this CPU mesh) remat auto stays conservative "full"; on TPU
    # it resolves to False — the flash VJP + fused-FFN VJP leave no
    # S²/FFN buffers for remat to shed (PERF.md round 4: 182.4 none vs
    # 179.9 attention ex/s at B=32)
    assert remat == "full"
    # idempotent: re-resolving a resolved tuple keeps it
    remat2, impl2 = resolve_train_impl(remat, impl, mesh)
    assert (remat2, impl2) == (remat, impl)


def test_flash_on_trivial_mesh_stays_unwrapped():
    mesh = make_mesh(n_data=1, n_model=1)
    _, impl = resolve_train_impl("auto", "flash", mesh)
    assert impl == "flash"
