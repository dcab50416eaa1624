"""Zoo-wide gradient/train-mode smoke tier.

The reference backprops every variant in its per-file harnesses
(``/root/reference/pytorchcv/models/resnet.py:997``: ``y.sum().backward()``
in train mode). This is the analog: one representative variant per family,
``jax.grad`` of the summed float outputs through a ``train=True`` apply
with BN mutation and dropout rngs, asserting finite loss and gradients.

Decode-bearing models (centernet top-k, NTS-Net NMS, SuperPoint) are run
with their grad-bearing output selected (e.g. ``return_heatmap=True``);
purely integer outputs are excluded from the loss automatically.

Default run covers a fast subset; ``GRAD_FULL=1`` runs every case
(recorded per round in STATUS.md).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorchcv_tpu as ptc

# (name, in_size or None for model default, ctor kwargs)
# None = the model's native size: architectures with fixed-size pools,
# cyclic downsampling, or NAS cells (scnet, diracnet, octresnet,
# sharesnet, revnet, espnetv2, squeezenext, nasnet, darts, polynet,
# channelnet) cannot run at reduced sizes — the reference's own _test
# harnesses only ever run them at their native resolution.
CASES = [
    # A residual family
    ("resnet10", (64, 64), {}),
    ("preresnet10", (64, 64), {}),
    ("seresnet10", (64, 64), {}),
    ("sepreresnet10", (64, 64), {}),
    ("resnext14_32x4d", (64, 64), {}),
    ("senet16", (64, 64), {}),
    ("resnestabc14", (64, 64), {}),
    ("scnet50", None, {}),
    ("ibn_resnet50", (64, 64), {}),
    ("dpn68", (224, 224), {}),
    ("hrnet_w18_small_v1", (64, 64), {}),
    ("pyramidnet101_a360", (64, 64), {}),
    ("diracnet18v2", None, {}),
    ("bagnet9", (64, 64), {}),
    ("octresnet10_ad2", None, {}),
    ("fishnet99", (224, 224), {}),
    ("sharesnet18", None, {}),
    ("resattnet56", (224, 224), {}),
    ("isqrtcovresnet18", (64, 64), {}),
    ("revnet38", None, {}),
    ("irevnet301", (224, 224), {}),
    ("diaresnet18", (64, 64), {}),
    ("dla34", (64, 64), {}),
    ("drnc26", (64, 64), {}),
    # B dense topology
    ("densenet121", (64, 64), {}),
    ("condensenet74_c4_g4", (64, 64), {}),
    ("sparsenet121", (64, 64), {}),
    ("peleenet", (64, 64), {}),
    # C efficiency
    ("mobilenet_wd4", (64, 64), {}),
    ("mobilenetv2_wd2", (64, 64), {}),
    ("mobilenetv3_small_w1", (64, 64), {}),
    ("shufflenet_g1_wd4", (64, 64), {}),
    ("shufflenetv2_wd2", (64, 64), {}),
    ("menet108_8x1_g3", (64, 64), {}),
    ("mixnet_s", (64, 64), {}),
    ("efficientnet_b0", (64, 64), {}),
    ("ghostnet", (64, 64), {}),
    ("dicenet_wd5", (224, 224), {}),
    ("espnetv2_wd2", None, {}),
    ("hardnet39ds", (64, 64), {}),
    ("selecsls42", (64, 64), {}),
    ("sqnxt23_w1", None, {}),
    ("squeezenet_v1_1", (64, 64), {}),
    # D inception/NAS
    ("xception", (96, 96), {}),
    ("inceptionv3", (160, 160), {}),
    ("inceptionresnetv2", (160, 160), {}),
    ("nasnet_4a1056", None, {}),
    ("darts", None, {}),
    ("polynet", None, {}),
    ("bninception", (64, 64), {}),
    ("channelnet", None, {}),
    ("msdnet22", (224, 224), {}),
    # E CIFAR specials (custom vjp / stochastic depth)
    ("resnet20_cifar10", (32, 32), {}),
    ("wrn16_10_cifar10", (32, 32), {}),
    ("nin_cifar10", (32, 32), {}),
    ("ror3_56_cifar10", (32, 32), {}),
    ("shakeshakeresnet20_2x16d_cifar10", (32, 32), {}),
    ("shakedropresnet20_cifar10", (32, 32), {}),
    ("resdropresnet20_cifar10", (32, 32), {}),
    ("wrn20_10_1bit_cifar10", (32, 32), {}),
    ("fractalnet_cifar10", (32, 32), {}),
    ("msdnet22_cifar10", (32, 32), {}),
    ("rir_cifar10", (32, 32), {}),
    ("xdensenet40_2_k24_bc_cifar10", (32, 32), {}),
    # F backbone adaptations
    ("resneta10", (64, 64), {}),
    ("resnetd50b", (64, 64), {}),
    ("ntsnet_cub", (448, 448), {"aux": True}),
    # G segmentation
    ("pspnet_resnetd50b_voc", (120, 120), {"aux": True}),
    ("deeplabv3_resnetd50b_voc", (120, 120), {"aux": True}),
    ("fcn8sd_resnetd50b_voc", (120, 120), {"aux": True}),
    ("enet_cityscapes", (128, 128), {}),
    ("segnet_cityscapes", (128, 128), {}),
    ("unet_cityscapes", (128, 128), {}),
    ("erfnet_cityscapes", (128, 128), {}),
    ("fastscnn_cityscapes", (128, 128), {}),
    ("lednet_cityscapes", (128, 128), {}),
    ("cgnet_cityscapes", (128, 128), {}),
    ("dabnet_cityscapes", (128, 128), {}),
    ("sinet_cityscapes", (128, 128), {}),
    ("bisenet_resnet18_celebamaskhq", (128, 128), {}),
    ("danet_resnetd50b_cityscapes", (120, 120), {}),
    ("icnet_resnetd50b_cityscapes", (128, 128), {}),
    # H detection
    ("centernet_resnet18_voc", (128, 128), {"return_heatmap": True}),
    ("lffd20x5s320v2_widerface", (128, 128), {}),
    # I pose
    ("simplepose_resnet18_coco", (128, 96), {"return_heatmap": True}),
    ("simplepose_mobile_mobilenetv3_small_w1_coco", (128, 96),
     {"return_heatmap": True}),
    ("lwopenpose2d_mobilenet_cmupan_coco", (128, 128), {}),
    ("ibppose_coco", (256, 256), {}),
    ("alphapose_fastseresnet101b_coco", (128, 96), {}),
    # J face/3D
    ("prnet", (256, 256), {}),
]

# Default tier: every custom-vjp (ShakeDrop, ShakeShake, Binarize-STE,
# isqrtcov's cov_pool/newton_schulz/triuvec, RevNet's nn.remat) and every
# nn/arch.py container type (Hourglass -> ibppose, Sesquialteral ->
# fishnet, DualPathParallelConcurent -> msdnet, MultiOutputSequential ->
# centernet/lwopenpose, ParallelConcurent -> octresnet, Concurrent ->
# inceptionv3) plus one representative per major family group.
# GRAD_FULL=1 still runs all CASES (round-boundary sweeps).
_FAST_SUBSET = {
    "resnet10", "preresnet10", "seresnet10", "resnext14_32x4d",
    "mobilenetv2_wd2", "mobilenetv3_small_w1", "efficientnet_b0",
    "densenet121", "hrnet_w18_small_v1", "dpn68",
    "shakedropresnet20_cifar10", "wrn20_10_1bit_cifar10",
    "pspnet_resnetd50b_voc", "centernet_resnet18_voc",
    "simplepose_resnet18_coco",
    # custom vjps
    "shakeshakeresnet20_2x16d_cifar10", "resdropresnet20_cifar10",
    "isqrtcovresnet18", "revnet38",
    # container types
    "ibppose_coco", "fishnet99", "msdnet22_cifar10", "octresnet10_ad2",
    "fractalnet_cifar10", "ror3_56_cifar10", "rir_cifar10",
    "inceptionv3",
    # remaining family groups
    "condensenet74_c4_g4", "mixnet_s", "shufflenetv2_wd2",
    "enet_cityscapes", "lwopenpose2d_mobilenet_cmupan_coco",
}


def _selected():
    if os.environ.get("GRAD_FULL"):
        return CASES
    return [c for c in CASES if c[0] in _FAST_SUBSET]


@pytest.mark.parametrize("name,size,kwargs", _selected())
def test_grad_smoke(name, size, kwargs):
    kw = dict(kwargs)
    if size is not None:
        kw["in_size"] = size
    model = ptc.get_model(name, **kw)
    x = jnp.asarray(
        np.random.RandomState(0).rand(1, *model.in_size,
                                      model.in_channels), jnp.float32)
    non_params = {k: v for k, v in model.variables.items() if k != "params"}
    rngs = {"dropout": jax.random.PRNGKey(0)}

    def loss_fn(params):
        out = model.module.apply(
            {"params": params, **non_params}, x, train=True,
            mutable=["batch_stats"], rngs=rngs)
        out, _ = out
        leaves = [l for l in jax.tree_util.tree_leaves(out)
                  if hasattr(l, "dtype") and
                  jnp.issubdtype(l.dtype, jnp.floating)]
        assert leaves, f"{name}: no float outputs to differentiate"
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(
        model.variables["params"])
    assert np.isfinite(float(loss)), f"{name}: loss {loss}"
    bad = [
        "/".join(map(str, path))
        for path, leaf in jax.tree_util.tree_leaves_with_path(grads)
        if not bool(jnp.all(jnp.isfinite(leaf)))
    ]
    assert not bad, f"{name}: non-finite grads at {bad[:5]}"
