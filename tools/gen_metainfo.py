"""Generate pytorchcv_tpu/zoo/metainfo.json from the reference metainfo CSV.

The CSV (reference ``pytorchcv/models/common/model_metainfos.csv``, 780 rows)
is the registry of released checkpoints: param counts, eval error, SHA1,
release tag, dataset, eval geometry. We re-emit it as JSON keyed by model
name with typed fields (a derived data artifact, regenerable with this tool).
"""

import csv
import json
import os

SRC = "/root/reference/pytorchcv/models/common/model_metainfos.csv"
DST = os.path.join(os.path.dirname(__file__), "..", "pytorchcv_tpu", "zoo",
                   "metainfo.json")


def main():
    out = {}
    with open(SRC, newline="") as f:
        for row in csv.DictReader(f):
            name = row["model_name"]
            has_weights = row["error_value"] != "NA"
            out[name] = {
                "params": int(row["net_weights"]),
                "error": row["error_value"] if has_weights else None,
                "sha1": row["checksum"] if row["checksum"] != "NA" else None,
                "release": row["repo_release_tag"]
                if row["repo_release_tag"] != "NA" else None,
                "caption": row["model_caption"],
                "arxiv": row["arxiv_paper"]
                if row["arxiv_paper"] != "NA" else None,
                "dataset": row["test_dataset"],
                "in_size": int(row["img_size"]) if row["img_size"] not in
                ("NA", "") else None,
                "scale": float(row["img_scale"]) if row["img_scale"] not in
                ("NA", "") else None,
                "batch": int(row["test_batch"]) if row["test_batch"] not in
                ("NA", "") else None,
                "remark": row["remark"] if row["remark"] != "NA" else None,
            }
    with open(os.path.abspath(DST), "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
    print(f"wrote {len(out)} rows to {DST}")


if __name__ == "__main__":
    main()
