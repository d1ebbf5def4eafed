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
