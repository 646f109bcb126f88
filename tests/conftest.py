"""Test harness config: force CPU with 8 virtual devices so sharding tests
exercise real collectives without TPU hardware (SURVEY.md §4).

Set ICP_TPU_TESTS=1 to keep the real backend instead (for the `tpu`-marked
real-chip tier: `ICP_TPU_TESTS=1 pytest -m tpu`)."""
import os
import sys

_TPU_TIER = bool(os.environ.get("ICP_TPU_TESTS"))
if not _TPU_TIER:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_TIER and "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's sitecustomize registers the axon TPU plugin and forces
# JAX_PLATFORMS=axon regardless of the environment, so the env var alone is
# not enough — override via jax.config after import.
import jax  # noqa: E402

if not _TPU_TIER:
    jax.config.update("jax_platforms", "cpu")
