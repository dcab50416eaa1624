"""The accuracy-evaluation harnesses (seg PixAcc/mIoU, pose OKS AP,
ASR WER — the reference's published non-classification eval protocols,
reference README.md:734/:782/:809) must stay runnable: each tool's
--selftest proves the full pipeline on synthetic data, so the day
network egress exists they evaluate real weights unchanged."""

import os
import runpy
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


@pytest.mark.parametrize("tool", ["eval_seg.py", "eval_pose.py",
                                  "eval_asr.py", "eval_imagenet.py",
                                  "verify_release.py"])
def test_eval_tool_selftest(tool):
    argv = sys.argv
    sys.argv = [tool, "--selftest"]
    try:
        runpy.run_path(os.path.join(TOOLS, tool), run_name="__main__")
    finally:
        sys.argv = argv
