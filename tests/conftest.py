import os

# Tests run on a virtual 8-device CPU mesh regardless of attached hardware:
# sharding tests need multiple devices and CI/dev boxes have no TPU.
# Force-set: the driver environment exports JAX_PLATFORMS=axon (remote TPU
# tunnel); unit tests must run on the local virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The driver image registers the axon TPU backend from sitecustomize.py before
# conftest runs, so the env var alone is not enough — force the platform here.
jax.config.update("jax_platforms", "cpu")

# NB: jax_enable_x64 stays OFF so tests exercise the same f32/bf16 numerics as
# production; the NumPy reference implementations use float64 independently.


import pytest  # noqa: E402


# Quick tier (`pytest -m quick`, target <5 min): a green signal for reviewers
# without the full compile-bound suite. Whole modules that are cheap, plus one
# interpret-mode parity test per Pallas kernel.
_QUICK_MODULES = {
    "test_sampling.py",
    "test_vocoder.py",
    "test_talker.py",
    "test_io.py",
    "test_goldens.py",
}
_QUICK_TESTS = {
    ("test_fused_talker.py", "test_dequant_matches_forward_step"),
    ("test_fused_cp.py", "test_greedy_dequant_matches_xla"),
    ("test_fused_cp_batched.py", "test_batched_greedy_matches_single_lane"),
    ("test_pallas_attention.py", "test_matches_xla_reference"),
    ("test_kernel_prng.py", "test_matches_numpy_mirror"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        base = item.name.split("[")[0]
        if fname in _QUICK_MODULES or (fname, base) in _QUICK_TESTS:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_programs_between_modules():
    """Free compiled executables after each test module.

    The full suite compiles several hundred XLA:CPU programs in one process;
    around program ~120 the compiler segfaults deterministically
    (backend_compile_and_load, LLVM JIT) unless earlier executables are
    released. Each module recompiles what it needs; shapes differ across
    modules anyway, so the lost cache hits are minimal."""
    yield
    jax.clear_caches()
