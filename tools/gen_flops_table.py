"""Regenerate the reference README's Params / FLOPs/2 columns from our zoo.

Usage:
    python tools/gen_flops_table.py                    # BASELINE subset
    python tools/gen_flops_table.py name1 name2 ...    # specific rows
    python tools/gen_flops_table.py --all              # FULL registry ->
                                                       #   docs/MODEL_TABLE.md

Emits our exact parameter counts and analytic FLOPs/2 (pre-fusion jaxpr
traversal, ``utils/flops.py:analytic_flops`` — the imgclsmob hook-counter
convention behind the reference README's published column, reference
README.md:166) next to the reference's published numbers (params from
zoo/metainfo.json; FLOPs/2 parsed out of /root/reference/README.md:153-818
by caption when the reference tree is mounted). ``--xla`` switches to the
old post-fusion ``cost_analysis`` counter (systematically ~4% low — kept
for comparison).

``--all`` sweeps every registered model name. Per-row results cache in
``docs/.model_table_cache_analytic.jsonl`` so the sweep is resumable.
Analytic rows only TRACE (no XLA compile) — even the 1001/1202-layer
CIFAR variants count in seconds.
"""

import json
import os
import signal
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("OMP_NUM_THREADS", "1")

DEFAULT = [
    "alexnet", "resnet18", "resnet50", "mobilenet_w1", "mobilenetv2_w1",
    "mobilenetv3_large_w1", "shufflenetv2_w1", "seresnet50", "densenet121",
    "efficientnet_b0", "mixnet_s", "regnetx002", "resnet20_cifar10",
    "wrn28_10_cifar10",
]

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs")
CACHE = os.path.join(DOCS, ".model_table_cache_analytic.jsonl")
CACHE_XLA = os.path.join(DOCS, ".model_table_cache.jsonl")
OUT_MD = os.path.join(DOCS, "MODEL_TABLE.md")
REF_README = "/root/reference/README.md"
ROW_TIMEOUT_S = 600
USE_XLA = False


def parse_reference_flops(path: str = REF_README):
    """(caption -> FLOPs/2 M, params -> FLOPs/2 M) from every README table.

    Table sections differ in metric columns; the FLOPs/2 cell is robustly
    the one matching ``[\\d,.]+M``, the params cell the large comma-int,
    and the caption the first cell. The params map is the fallback for
    rows whose metainfo caption is NA (CIFAR/SVHN sections) — kept only
    where one distinct FLOPs value exists for that param count."""
    import re

    by_caption = {}
    by_params = {}
    if not os.path.isfile(path):
        return by_caption, by_params
    for line in open(path, encoding="utf-8"):
        if not line.startswith("| "):
            continue
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) < 3:
            continue
        caption = cells[0]
        flops = params = None
        for c in cells[1:]:
            m = re.fullmatch(r"([\d,]+\.\d+)M", c)
            if m and flops is None:
                flops = float(m.group(1).replace(",", ""))
            m = re.fullmatch(r"([\d,]{5,})", c)
            if m and params is None:
                params = int(m.group(1).replace(",", ""))
        if flops is None:
            continue
        by_caption.setdefault(caption, flops)
        if params is not None:
            by_params.setdefault(params, set()).add(flops)
    by_params = {p: next(iter(fs)) for p, fs in by_params.items()
                 if len(fs) == 1}
    return by_caption, by_params


class _RowTimeout(Exception):
    pass


def _alarm(signum, frame):
    raise _RowTimeout()


def compute_row(name, ref_flops):
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.utils.flops import analytic_flops, flops2
    from pytorchcv_tpu.zoo.store import get_model_metainfo

    by_caption, by_params = ref_flops
    model = ptc.get_model(name, init=False)
    row = {"name": name, "params": model.num_params()}
    try:
        info = get_model_metainfo(name)
        row["ref_params"] = info.get("params")
        row["in_size"] = info.get("in_size")
        caption = info.get("caption")
        if caption and caption != "NA" and caption in by_caption:
            row["ref_flops2_m"] = by_caption[caption]
        elif (caption in (None, "NA")
                and info.get("params") in by_params):
            # params fallback ONLY for caption-less rows (CIFAR/SVHN
            # sections): a named variant absent from the README must NOT
            # inherit a sibling's row — sepreresnet50 shares its param
            # count with sepreresnet50b (stride position is param-free)
            # but not its FLOPs (4,113.27M vs our exact 3,888.37M).
            row["ref_flops2_m"] = by_params[info["params"]]
    except (KeyError, ValueError):
        pass
    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(ROW_TIMEOUT_S)
    try:
        if USE_XLA:
            row["flops2_m"] = round(flops2(model) / 1e6, 2)
        else:
            counts = analytic_flops(model)
            row["flops2_m"] = round(counts["flops"] / 2.0 / 1e6, 2)
            row["macs_m"] = round(counts["macs"] / 1e6, 2)
            if counts["unknown"]:
                row["note"] = f"guessed prims: {counts['unknown']}"[:120]
    except _RowTimeout:
        row["flops2_m"] = None
        row["note"] = f"compile >{ROW_TIMEOUT_S}s, skipped"
    except Exception as e:                      # noqa: BLE001
        row["flops2_m"] = None
        row["note"] = f"{type(e).__name__}: {e}"[:120]
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
    return row


def _fmt_row(r):
    ref_p = r.get("ref_params")
    ours_f = r.get("flops2_m")
    ref_f = r.get("ref_flops2_m")
    if ref_p is None:
        p_cell = "n/a"
    else:
        p_cell = f"{ref_p:,} ({'=' if ref_p == r['params'] else 'MISMATCH'})"
    f_cell = f"{ours_f:,.2f}M" if ours_f else r.get("note", "n/a")
    if ref_f:
        delta = f"{(ours_f / ref_f - 1) * 100:+.1f}%" if ours_f else ""
        rf_cell = f"{ref_f:,.2f}M | {delta}"
    else:
        rf_cell = "n/a | "
    return (f"| {r['name']} | {r['params']:,} | {p_cell} | {f_cell} | "
            f"{rf_cell} |")


HEADER = ("| Model | Params (ours) | Params (ref) | FLOPs/2 (ours, analytic) | "
          "FLOPs/2 (ref README) | Δ |\n|---|---:|---:|---:|---:|---:|")


def _reattribute_refs(rows, ref_flops):
    """Re-derive every row's published FLOPs/2 with the global view:
    caption match first; params fallback only when the param count
    determines FLOPs among OUR candidates (<=1% spread) — stride-variant
    pairs (sepreresnet50 vs 50b) share params but not FLOPs and must not
    inherit each other's README row."""
    from collections import defaultdict

    from pytorchcv_tpu.zoo.store import get_model_metainfo

    by_cap, by_par = ref_flops
    by_params_ours = defaultdict(list)
    metas = {}
    for r in rows:
        try:
            metas[r["name"]] = info = get_model_metainfo(r["name"])
        except (KeyError, ValueError):
            continue
        if info.get("params") and r.get("flops2_m"):
            by_params_ours[info["params"]].append(r["flops2_m"])
    for r in rows:
        info = metas.get(r["name"])
        if info is None:
            continue
        caption, p = info.get("caption"), info.get("params")
        new = None
        if caption and caption != "NA" and caption in by_cap:
            new = by_cap[caption]
        elif p in by_par:
            ours = by_params_ours.get(p, [])
            if ours and max(ours) <= min(ours) * 1.01:
                new = by_par[p]
        if new is None:
            r.pop("ref_flops2_m", None)
        else:
            r["ref_flops2_m"] = new
    return rows


def _read_cache(path):
    """name->row from a resumable JSONL cache, tolerating a truncated
    trailing line (a supervised child can be killed mid-append)."""
    rows = {}
    if os.path.isfile(path):
        for line in open(path):
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            rows[r["name"]] = r
    return rows


def main(names, write_md=False, cache_only=False):
    import jax
    jax.config.update("jax_platforms", "cpu")

    ref_flops = parse_reference_flops()
    cache = _read_cache(CACHE) if write_md else {}

    rows = []
    cache_f = open(CACHE, "a") if write_md and not cache_only else None
    for i, name in enumerate(names):
        if name in cache:
            rows.append(cache[name])
            continue
        if cache_only:
            continue
        row = compute_row(name, ref_flops)
        rows.append(row)
        if cache_f:
            cache_f.write(json.dumps(row) + "\n")
            cache_f.flush()
            print(f"[{i + 1}/{len(names)}] {row['name']}: "
                  f"params={row['params']:,} flops2={row.get('flops2_m')}",
                  flush=True)
        else:
            print(_fmt_row(row))
        if (i + 1) % 20 == 0:
            jax.clear_caches()

    if write_md:
        _reattribute_refs(rows, ref_flops)
        n_match = sum(1 for r in rows
                      if r.get("ref_params") == r["params"])
        n_na = sum(1 for r in rows if r.get("ref_params") is None)
        n_bad = len(rows) - n_match - n_na
        from pytorchcv_tpu.zoo.store import get_model_metainfo

        def _dataset(name):
            try:
                return get_model_metainfo(name).get("dataset")
            except (KeyError, ValueError):
                return None

        # ASR rows: FLOPs are linear in audio length; ours documents a
        # 1 s / 16 kHz input, the published column implies a ~4.6 s
        # utterance (quartznet15x5_en 4,840.29M / our 1,063.64M per-1s) —
        # a units convention, excluded from the accuracy statistics.
        asr = {r["name"] for r in rows if _dataset(r["name"]) == "mcv"}

        def _documented_mismatch(name):
            # published value demonstrably does not follow the
            # architecture / the hook-counter convention (see the notes
            # below the summary)
            return (name in asr or
                    name.startswith(("simplepose_", "centernet_",
                                     "danet_", "sinet_")) or
                    re.match(r"dia(pre)?resnet1(10|64bn)_", name))

        import re
        all_d = [(abs(r["flops2_m"] / r["ref_flops2_m"] - 1), r["name"])
                 for r in rows
                 if r.get("flops2_m") and r.get("ref_flops2_m")]
        deltas = sorted((d, n) for d, n in all_d
                        if not _documented_mismatch(n))
        n_doc = len(all_d) - len(deltas)
        n_pub = len(deltas)
        n_1pct = sum(1 for d, _ in deltas if d <= 0.01)
        n_2pct = sum(1 for d, _ in deltas if d <= 0.02)
        med = deltas[n_pub // 2][0] * 100 if deltas else float("nan")
        worst = ", ".join(f"{n} {d * 100:.1f}%" for d, n in deltas[-5:])
        with open(OUT_MD, "w") as f:
            f.write(
                "# Model table (generated)\n\n"
                "Regenerated analog of the reference README tables "
                "(reference README.md:153-818): exact parameter counts "
                "from our zoo and analytic FLOPs/2 (pre-fusion jaxpr "
                "traversal, `utils/flops.py:analytic_flops` — the "
                "imgclsmob hook-counter convention behind the published "
                "column), against the reference's published numbers. "
                "Regenerate: `python tools/gen_flops_table.py --all`.\n\n"
                f"{len(rows)} models; {n_match} exact param matches, "
                f"{n_bad} MISMATCHES, {n_na} rows without a registry "
                "params value (blank in the reference CSV).\n\n"
                f"FLOPs/2 vs the {n_pub} published rows that follow the "
                "analytic convention: median |Δ| "
                f"{med:.2f}%, {n_1pct} within 1%, {n_2pct} within 2%. "
                f"Largest deltas: {worst}. A further {n_doc} published "
                "rows demonstrably do NOT follow their own convention "
                "(itemized below) and are compared against the exact "
                "count instead.\n\n"
                "Known convention mismatches (all architecture-verified "
                "by exact param matches):\n"
                "- **ASR (`*_en`/`*_de`/... , dataset mcv, "
                f"{len(asr)} rows)**: FLOPs scale linearly with audio "
                "length; our column documents a 1 s / 16 kHz input, the "
                "published values imply a ~4.6 s utterance (ratio 4.55 "
                "on every row). Excluded from the statistics above.\n"
                "- **DIA-ResNet/-PreResNet (-24% at 164bn, -3% at 110)**: "
                "the published number cannot follow from the "
                "architecture — the DIA-LSTM runs on globally-pooled "
                "(B,C) vectors (reference diaresnet.py:134-145, "
                "~0.5M MACs/net) yet the published value sits ~92M above "
                "the conv+fc MACs of the param-exact architecture; the "
                "reference's hook counter evidently charged the LSTM amp "
                "Linears at pre-pool spatial size. Our value is the "
                "exact count.\n"
                "- **DANet (+3.8/+5.2%)**: our count includes the "
                "position/channel-attention batched matmuls, which are "
                "functional ops a torch module-hook counter cannot see. "
                "Our value is the exact count.\n"
                "- **SimplePose / CenterNet (deconv decoders)**: the "
                "published values omit ConvTranspose layers entirely "
                "(simplepose_resnet18_coco's 1,799.25M equals its "
                "resnet18 backbone at 256x192 + the 1x1 head exactly; "
                "the three 4x4 deconvs are ~1.1G MACs more). A module-"
                "hook counter with no ConvTranspose2d hook sees none of "
                "them. Our value counts them (zero-skipping: "
                "out x k^2 x Cin / stride^2).\n"
                "- **SINet (+25.7%)**: our MAC subtotal is within 2.2% "
                "of the published value — the entire residual is "
                "elementwise/interpolation work (an extreme-lightweight "
                "119k-param net running at 2048x1024, where functional "
                "`F.interpolate`/attention ops a hook counter cannot see "
                "are a third of the real work).\n"
                "- **dicenet/igcv3/condensenet-g8/mobilenetv2_wd4 "
                "(2-3.4%)**: small models where per-element convention "
                "details (h-sigmoid/shuffle/interp costs) are a visible "
                "fraction — the published value sits between our MAC "
                "subtotal and MACs+elementwise on every such row, i.e. "
                "the residual is elementwise costing, not structure.\n\n")
            f.write(HEADER + "\n")
            for r in rows:
                f.write(_fmt_row(r) + "\n")
        print(f"wrote {OUT_MD} ({len(rows)} rows)")


def supervise(stall_s: int = 600):
    """Run ``--all`` as a supervised child with a HARD stall timeout.

    The in-process SIGALRM row timeout cannot interrupt a single
    long-running XLA compile (signals are only delivered between Python
    bytecodes; some CPU compiles of LSTM-bearing zoo models run 30+
    minutes). The supervisor watches the resumable cache for growth;
    on a stall it kills the child, records the in-flight row as skipped,
    and restarts from the next row.
    """
    import subprocess
    import time

    from pytorchcv_tpu.models.registry import registered_models

    def _skip_row(victim, note):
        import pytorchcv_tpu as ptc
        row = {"name": victim,
               "params": ptc.get_model(victim, init=False).num_params(),
               "flops2_m": None, "note": note}
        with open(CACHE, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"supervisor: skipped row {victim} ({note})", flush=True)

    names = registered_models()
    crashes_without_growth = 0
    while True:
        cached = set(_read_cache(CACHE))
        todo = [n for n in names if n not in cached]
        if not todo:
            break
        child = subprocess.Popen([sys.executable, __file__, "--all"])
        last_n, last_t = len(cached), time.time()
        while child.poll() is None:
            time.sleep(15)
            n = len(_read_cache(CACHE))
            if n > last_n:
                last_n, last_t = n, time.time()
            elif time.time() - last_t > stall_s:
                child.kill()
                child.wait()
                stuck = set(_read_cache(CACHE))
                victim = next((x for x in names if x not in stuck), None)
                if victim is None:
                    return
                _skip_row(victim, f"compile stalled >{stall_s}s, killed")
                break
        else:
            # child exited on its own (clean, or a hard crash the
            # in-process exception handler could not catch)
            if child.returncode == 0:
                break
            if len(_read_cache(CACHE)) > len(cached):
                crashes_without_growth = 0
            else:
                crashes_without_growth += 1
                if crashes_without_growth >= 2:
                    # same row hard-crashes the child repeatedly (segfault
                    # or OOM inside a single uninterruptible call): record
                    # it as skipped instead of respawning forever
                    victim = next(
                        (x for x in names if x not in _read_cache(CACHE)),
                        None)
                    if victim is None:
                        return
                    _skip_row(victim,
                              f"child crashed (rc={child.returncode}) "
                              "twice with no progress")
                    crashes_without_growth = 0


if __name__ == "__main__":
    if "--xla" in sys.argv:
        USE_XLA = True
        CACHE = CACHE_XLA
    args = [a for a in sys.argv[1:]
            if a not in ("--all", "--from-cache", "--supervise", "--xla")]
    if "--supervise" in sys.argv:
        supervise()
        sys.exit(0)
    if "--all" in sys.argv or "--from-cache" in sys.argv:
        import pytorchcv_tpu as ptc
        from pytorchcv_tpu.models.registry import registered_models
        # --from-cache renders MODEL_TABLE.md from whatever rows the
        # (resumable) sweep has cached so far, computing nothing new.
        main(registered_models(), write_md=True,
             cache_only="--from-cache" in sys.argv)
    else:
        main(args or DEFAULT)
