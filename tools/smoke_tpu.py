"""Real-TPU smoke sweep: one representative model per task family.

    python tools/smoke_tpu.py            # runs on the default backend

CPU tests exercise numerics; this sweep exercises the TPU *lowering* of
each task family's distinctive ops (PSPNet adaptive pools + aux heads,
CenterNet top-k decode, RAFT corr lookup + GRU scan, SuperPoint top-k
keypoints, QuartzNet masked 1D convs + mel front-end, ProPainter window
attention with a static ``lt``, DANet flash attention). Caught in round
1: a jit-static argument bug only visible under the jitted Model wrapper.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def run(name, maker):
    try:
        out = maker()
        leaves = [l for l in jax.tree_util.tree_leaves(out)
                  if hasattr(l, "dtype")]
        ok = all(bool(jnp.all(jnp.isfinite(l.astype(jnp.float32))))
                 for l in leaves if jnp.issubdtype(l.dtype, jnp.floating))
        print(f"OK   {name:<22} {[tuple(l.shape) for l in leaves][:2]} "
              f"finite={ok}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001 — smoke harness
        print(f"FAIL {name:<22} {type(e).__name__}: {str(e)[:110]}",
              flush=True)
        return False


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    import pytorchcv_tpu as ptc
    rs = np.random.RandomState(0)
    failures = 0

    for name in ("resnet50", "efficientnet_b0", "hrnet_w18_small_v1",
                 "dpn68", "densenet121", "shufflenetv2_w1", "mixnet_s"):
        m = ptc.get_model(name).as_bfloat16()
        x = jnp.asarray(rs.rand(2, *m.in_size, 3), jnp.bfloat16)
        failures += not run(name, lambda m=m, x=x: m(x))

    m = ptc.get_model("pspnet_resnetd50b_voc", in_size=(480, 480)).as_bfloat16()
    failures += not run("pspnet_voc", lambda: m(
        jnp.asarray(rs.rand(1, 480, 480, 3), jnp.bfloat16)))
    m = ptc.get_model("simplepose_resnet18_coco").as_bfloat16()
    failures += not run("simplepose", lambda: m(
        jnp.asarray(rs.rand(1, *m.in_size, 3), jnp.bfloat16)))
    m = ptc.get_model("centernet_resnet18_voc").as_bfloat16()
    failures += not run("centernet", lambda: m(
        jnp.asarray(rs.rand(1, 512, 512, 3), jnp.bfloat16)))
    m = ptc.get_model("raft_small", in_size=(128, 256), iters=4)
    failures += not run("raft_small", lambda: m(
        jnp.asarray(rs.rand(1, 128, 256, 3), jnp.float32),
        jnp.asarray(rs.rand(1, 128, 256, 3), jnp.float32)))
    m = ptc.get_model("superpointnet")
    failures += not run("superpointnet", lambda: m(
        jnp.asarray(rs.rand(1, 224, 224, 1), jnp.float32)))
    m = ptc.get_model("quartznet5x5_en_ls")
    failures += not run("quartznet", lambda: m(
        jnp.asarray(rs.randn(1, 16000) * 0.1, jnp.float32),
        jnp.asarray([16000], jnp.int32)))
    m = ptc.get_model("propainter", in_size=(64, 128))
    B, T, lt, H, W = 1, 6, 4, 64, 128
    failures += not run("propainter", lambda: m(
        jnp.asarray(rs.rand(B, T, H, W, 3), jnp.float32),
        jnp.asarray((rs.rand(B, T, H, W, 1) > 0.8).astype(np.float32)),
        jnp.asarray((rs.rand(B, T, H, W, 1) > 0.7).astype(np.float32)),
        jnp.asarray(rs.randn(B, lt - 1, H, W, 4).astype(np.float32)), lt))
    m = ptc.get_model("danet_resnetd50b_cityscapes",
                      in_size=(480, 480)).as_bfloat16()
    failures += not run("danet_flash", lambda: m(
        jnp.asarray(rs.rand(1, 480, 480, 3), jnp.bfloat16)))

    # Task-protocol serving entry points (uint8 -> outputs, fused
    # preprocess per the reference eval protocols, serve.make_serving_fn)
    from pytorchcv_tpu.serve import make_serving_fn
    sv = make_serving_fn("fastscnn_cityscapes", source_hw=(512, 1024),
                         task="segmentation", mode="bf16")
    failures += not run("serve_seg_fastscnn", lambda: sv(
        jnp.asarray(rs.randint(0, 256, (1, 512, 1024, 3)), jnp.uint8)))
    sv = make_serving_fn("simplepose_resnet18_coco", source_hw=(320, 240),
                         task="pose", mode="bf16")
    failures += not run("serve_pose_simplepose", lambda: sv(
        jnp.asarray(rs.randint(0, 256, (4, 320, 240, 3)), jnp.uint8)))
    sv = make_serving_fn("centernet_resnet18_voc", source_hw=(375, 500),
                         task="detection", mode="bf16")
    failures += not run("serve_det_centernet", lambda: sv(
        jnp.asarray(rs.randint(0, 256, (2, 375, 500, 3)), jnp.uint8)))

    print(f"\n{'PASS' if failures == 0 else 'FAIL'}: "
          f"{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
