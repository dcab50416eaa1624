"""Generate the committed real-format checkpoint fixture
(tests/fixtures/): a reference-release-layout artifact — torch zip-pickle
state_dict inside a release zip named ``{name}-{error}-{sha1[:8]}.pth.zip``
(reference model_store.py:140-192 format) — for resnet20_cifar10 at random
init (seed 0). Run once; the output is committed so the store tests read a
byte-for-byte real torch artifact offline.
"""

import hashlib
import os
import sys
import zipfile

os.environ.setdefault("OMP_NUM_THREADS", "1")

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

torch.set_num_threads(1)

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "tests",
                           "fixtures")
ERROR_TAG = "0000"  # fixture tag (release names carry the eval error here)


def main():
    from pytorchcv.models.resnet_cifar import resnet20_cifar10

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    from conftest import randomize_stateful_tensors

    torch.manual_seed(0)
    net = resnet20_cifar10(pretrained=False)
    # Pretrained-like BN stats: at init they are channel-uniform constants,
    # which would make the fixture blind to per-channel BN mis-mapping
    # (VERDICT r3 item 1).
    randomize_stateful_tensors(net)
    os.makedirs(FIXTURE_DIR, exist_ok=True)

    tmp = os.path.join(FIXTURE_DIR, "_tmp.pth")
    torch.save(net.state_dict(), tmp)  # default: torch zip-pickle format
    sha1 = hashlib.sha1(open(tmp, "rb").read()).hexdigest()
    stem = f"resnet20_cifar10-{ERROR_TAG}-{sha1[:8]}.pth"
    pth = os.path.join(FIXTURE_DIR, stem)
    os.replace(tmp, pth)
    with zipfile.ZipFile(pth + ".zip", "w", zipfile.ZIP_DEFLATED) as zf:
        zf.write(pth, arcname=stem)
    os.remove(pth)
    print(f"wrote {pth}.zip  sha1={sha1}")


if __name__ == "__main__":
    main()
