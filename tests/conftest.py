"""Test configuration: force an 8-device CPU mesh before JAX initializes.

Multi-chip sharding tests run on virtual CPU devices
(``--xla_force_host_platform_device_count=8``), substituting for real TPU
chips exactly as the driver's dry-run does.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("OMP_NUM_THREADS", "1")  # torch/JAX OpenMP clash

import sys  # noqa: E402

import jax  # noqa: E402

# The axon sitecustomize force-selects the TPU platform regardless of the
# JAX_PLATFORMS env var; the config API wins over it.
jax.config.update("jax_platforms", "cpu")

# Parity with the reference's f32 eval: XLA's DEFAULT conv/matmul precision
# is bf16-grade; pin to float32 for numeric comparisons.
jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: parity tests are compile-bound on the single
# CPU core; cached executables make repeat CI runs fast.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_PATH = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "pytorchcv"))


def add_reference_to_path():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
