"""FLOPs reporters (utils/flops.py): XLA cost analysis + the analytic
pre-fusion jaxpr counter behind docs/MODEL_TABLE.md."""

import numpy as np
import pytest

import pytorchcv_tpu as ptc
from conftest import has_reference
from pytorchcv_tpu.utils.flops import (analytic_flops, analytic_flops2,
                                       cost_analysis, flops2)


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


def test_analytic_counter_known_macs():
    """Conv MAC arithmetic is exact: resnet18's conv+fc MACs are
    1.814 GMACs at 224^2 (hand-computable: 8 BasicBlocks + stem + fc),
    and the full-flops/2 figure lands on the reference's published
    1,820.41M (reference README.md:178 row) within 0.5%. The counter
    traces only — no XLA compile — so it must also be cheap."""
    model = ptc.get_model("resnet18", init=False)
    c = analytic_flops(model)
    assert c["unknown"] == [], c["unknown"]
    assert abs(c["macs"] / 1e6 - 1814.07) < 2.0, c["macs"]
    f2 = c["flops"] / 2 / 1e6
    assert abs(f2 / 1820.41 - 1) < 0.005, f2


def test_analytic_counter_scales_with_batch():
    model = ptc.get_model("resnet10", init=False)
    f1 = analytic_flops2(model, batch=1)
    f4 = analytic_flops2(model, batch=4)
    assert 3.5 * f1 < f4 < 4.5 * f1


@pytest.mark.skipif(not has_reference(), reason="reference tree not mounted")
def test_analytic_counter_vs_published_sample():
    """Spot-check the table convention against the published FLOPs/2
    column across structurally diverse families (plain conv, depthwise,
    SE+swish, grouped, CIFAR)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from gen_flops_table import parse_reference_flops
    from pytorchcv_tpu.zoo.store import get_model_metainfo

    by_cap, by_par = parse_reference_flops()
    cases = ["resnet50", "mobilenetv2_w1", "efficientnet_b0",
             "seresnet50", "resnet20_cifar10"]
    for name in cases:
        info = get_model_metainfo(name)
        ref = by_cap.get(info.get("caption")) or by_par.get(
            info.get("params"))
        assert ref, f"no published row for {name}"
        f2 = analytic_flops2(ptc.get_model(name, init=False)) / 1e6
        assert abs(f2 / ref - 1) < 0.01, (name, f2, ref)
