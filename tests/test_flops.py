"""XLA cost-analysis FLOPs reporter (utils/flops.py)."""

import numpy as np

import pytorchcv_tpu as ptc
from pytorchcv_tpu.utils.flops import cost_analysis, flops2


def test_resnet10_flops_scale():
    model = ptc.get_model("resnet10", init=False)
    costs = cost_analysis(model)
    assert costs["flops"] > 0
    # resnet10 at 224: ~0.9 GMACs; compiler count within 2x band.
    mf = flops2(model) / 1e6
    assert 300 < mf < 2000, mf


def test_flops_scales_with_batch():
    model = ptc.get_model("resnet10", init=False)
    f1 = flops2(model, batch=1)
    f4 = flops2(model, batch=4)
    assert 3.5 * f1 < f4 < 4.5 * f1
