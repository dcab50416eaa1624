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


def randomize_stateful_tensors(ref, seed=0):
    """Randomize every torch tensor that default init leaves channel-uniform.

    At ``pretrained=False`` init the reference kaimings only Conv2d
    (resnet.py:326-331); BatchNorm weight=1/bias=0/mean=0/var=1, PReLU
    slope=0.25 — all channel-uniform constants.  A converter bug that
    permutes or swaps those vectors across channels (exactly the tensors
    ``load_model`` ships, reference model_store.py:313-334) would pass a
    parity test run on constants.  Randomizing them in-place before
    ``state_dict()`` makes the parity tier sensitive to per-channel
    mis-mapping.  Ranges are modest so deep stacks stay numerically tame:
    var in [0.5, 2] keeps the effective per-channel rescale within ~1.4x.
    """
    import torch

    g = torch.Generator().manual_seed(seed)
    norm_types = (torch.nn.modules.batchnorm._BatchNorm,
                  torch.nn.modules.instancenorm._InstanceNorm,
                  torch.nn.GroupNorm, torch.nn.LayerNorm)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, norm_types):
                if getattr(m, "weight", None) is not None:
                    m.weight.uniform_(0.5, 1.5, generator=g)
                if getattr(m, "bias", None) is not None:
                    m.bias.normal_(0.0, 0.1, generator=g)
                if getattr(m, "running_mean", None) is not None:
                    m.running_mean.normal_(0.0, 0.5, generator=g)
                if getattr(m, "running_var", None) is not None:
                    m.running_var.uniform_(0.5, 2.0, generator=g)
            elif isinstance(m, torch.nn.PReLU):
                m.weight.uniform_(0.05, 0.45, generator=g)
    return ref
