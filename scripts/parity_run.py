"""One-command real-dataset AP parity harness.

Runs every (model, dataset) cell of the reference's experiment grid at
the reference's exact default config (``get_default_config`` =
``/root/reference/gnnflow/config.py:28-179``) through
``scripts/offline_edge_prediction.py`` (the reference training protocol:
chronological batches, per-epoch validation, best-AP checkpoint + memory
backup, early stopping, final test AP/AUC —
``offline_edge_prediction.py:478-515``), and checks the resulting test
AP against the expected-AP table below.

Datasets are the reference's JODIE/TGL bundles (``download_data.sh``)
dropped into ``--data-dir`` as ``<NAME>/edges.csv`` (+ optional
``edge_features.npy``/``node_features.npy``); any cell whose data is
absent is reported ``skipped`` — the harness never fails on missing
files.  This environment has no network access, so the real csvs cannot
be fetched here; the harness is smoke-tested end-to-end on the synthetic
stream (``--smoke``) and is one command once the files exist:

    python scripts/parity_run.py --data-dir data/

Emits one JSON verdict per cell plus a summary line, and writes the full
report to ``--json-out`` (default ``parity_report.json``).
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

# Minimum acceptable test AP per (model, dataset): conservative lower
# bounds derived from the published literature the reference reproduces
# (sources + exact published values in docs/parity_protocol.md):
#  - TGN paper (Rossi et al., 2020): Wikipedia 98.5, Reddit 98.7 AP
#  - TGAT paper (Xu et al., ICLR'20): Wikipedia 95.3, Reddit 98.1 AP
#  - TGL paper (Zhou et al., VLDB'22 — the system GNNFlow extends):
#    reproduces TGN/TGAT/APAN/JODIE within ~1 AP of the above on
#    Wikipedia/Reddit at these same configs
#  - APAN paper (Wang et al., SIGMOD'21): Wikipedia 98.1, Reddit 99.2 AP
# Bars are set ~1.5-2 AP below the published values (seed/protocol
# variance); MOOC/LASTFM have no stable published AP across papers, so
# their bars are loose sanity checks.  DySAT/static models use
# correspondingly looser bars (snapshot windows / no temporal encoding).
EXPECTED_MIN_AP = {
    ("TGN", "WIKI"): 0.965, ("TGN", "REDDIT"): 0.970,
    ("TGN", "MOOC"): 0.80, ("TGN", "LASTFM"): 0.70,
    ("TGAT", "WIKI"): 0.930, ("TGAT", "REDDIT"): 0.960,
    ("TGAT", "MOOC"): 0.70, ("TGAT", "LASTFM"): 0.60,
    ("DySAT", "WIKI"): 0.930, ("DySAT", "REDDIT"): 0.950,
    ("DySAT", "MOOC"): 0.70, ("DySAT", "LASTFM"): 0.60,
    ("APAN", "WIKI"): 0.960, ("APAN", "REDDIT"): 0.965,
    ("APAN", "MOOC"): 0.75, ("APAN", "LASTFM"): 0.60,
    ("GRAPHSAGE", "WIKI"): 0.85, ("GRAPHSAGE", "REDDIT"): 0.90,
    ("GAT", "WIKI"): 0.85, ("GAT", "REDDIT"): 0.90,
    # GDELT/MAG (the reference's billion-scale bundles,
    # gnnflow/config.py:160-179): no stable published AP exists across
    # papers at these exact configs (TGL trains them at scale but with
    # its own sampling budget), so — like MOOC/LASTFM — the bars are
    # loose sanity checks, not literature reproductions.
    ("TGN", "GDELT"): 0.70, ("TGN", "MAG"): 0.70,
    ("TGAT", "GDELT"): 0.60, ("TGAT", "MAG"): 0.60,
    ("APAN", "GDELT"): 0.60,
}
# the synthetic stream carries real signal (recurrent interactions);
# every model clears 0.55 within a few epochs (chance = 0.5)
SMOKE_MIN_AP = 0.55

parser = argparse.ArgumentParser()
parser.add_argument("--data-dir", default=os.path.join(REPO, "data"))
parser.add_argument("--models", nargs="*",
                    default=["TGN", "TGAT", "DySAT", "APAN",
                             "GRAPHSAGE", "GAT"])
parser.add_argument("--datasets", nargs="*",
                    default=["WIKI", "REDDIT", "MOOC", "LASTFM",
                             "GDELT", "MAG"])
parser.add_argument("--epoch", type=int, default=50,
                    help="max epochs (early stopping applies)")
parser.add_argument("--json-out",
                    default=os.path.join(REPO, "parity_report.json"))
parser.add_argument("--smoke", action="store_true",
                    help="validate the harness end-to-end on the "
                         "synthetic stream (no real data needed)")
parser.add_argument("--smoke-models", nargs="*",
                    default=["TGN", "TGAT", "DySAT", "APAN",
                             "GRAPHSAGE", "GAT"])
parser.add_argument("--smoke-epochs", type=int, default=3)
parser.add_argument("--smoke-edges", type=int, default=20000)
parser.add_argument("--smoke-host-cells", dest="smoke_host_cells",
                    action="store_true", default=True,
                    help="include the GDELT/MAG-analogue host-placement "
                         "+ cache smoke cells (TGN, --features-on-host)")
parser.add_argument("--no-smoke-host-cells", dest="smoke_host_cells",
                    action="store_false")
parser.add_argument("--platform", default=None,
                    help="force jax platform in the child runs (e.g. "
                         "cpu for CI smoke)")
parser.add_argument("--timeout", type=int, default=7200,
                    help="per-cell wall-clock limit (s)")
args = parser.parse_args()

AP_RE = re.compile(r"Test ap:([0-9.]+)\s+test auc:([0-9.]+)")


def run_cell(model: str, dataset: str, extra=()):
    """Run one (model, dataset) training at reference config; return the
    parsed final test AP/AUC and the child's exit status."""
    script = os.path.join(REPO, "scripts", "offline_edge_prediction.py")
    argv = [script, "--model", model, "--data", dataset,
            "--data-dir", args.data_dir, "--epoch", str(args.epoch),
            *extra]
    if args.platform:
        # offline_edge_prediction has no --platform flag (it targets the
        # real chip); force the platform via jax.config before runpy —
        # env vars cannot re-select the platform once jax is imported
        # by sitecustomize.
        code = ("import jax; jax.config.update('jax_platforms', %r); "
                "import sys, runpy; sys.argv = %r; "
                "runpy.run_path(%r, run_name='__main__')"
                % (args.platform, argv, script))
        cmd = [sys.executable, "-c", code]
    else:
        cmd = [sys.executable, *argv]
    t0 = time.time()
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=args.timeout, cwd=REPO)
    except subprocess.TimeoutExpired:
        return {"status": "timeout", "elapsed_s": round(time.time() - t0)}
    text = out.stdout + out.stderr
    m = None
    for m in AP_RE.finditer(text):
        pass  # keep the last match (final test line)
    if out.returncode != 0 or m is None:
        return {"status": "error", "returncode": out.returncode,
                "elapsed_s": round(time.time() - t0),
                "tail": text[-2000:]}
    return {"status": "ok", "test_ap": float(m.group(1)),
            "test_auc": float(m.group(2)),
            "elapsed_s": round(time.time() - t0)}


def main():
    cells = []
    if args.smoke:
        smoke_cells = [(m, "SYNTHETIC", []) for m in args.smoke_models]
        if args.smoke_host_cells:
            # GDELT/MAG-analogue plumbing cells: the host-resident
            # feature table + LRU cache (+ bf16 memory storage for the
            # MAG-analogue capacity knob) — exercises the cache fetch
            # path the big bundles need (BASELINE.md host-placement run)
            smoke_cells.append(
                ("TGN", "SYNTHETIC-GDELT-HOST",
                 ["--features-on-host", "--cache", "LRUCache",
                  "--edge-cache-ratio", "0.3",
                  "--synthetic-dim-edge", "182"]))
            smoke_cells.append(
                ("TGN", "SYNTHETIC-MAG-HOST",
                 ["--features-on-host", "--cache", "LRUCache",
                  "--edge-cache-ratio", "0.2",
                  "--memory-storage", "bfloat16"]))
        for model, dsname, host_extra in smoke_cells:
            r = run_cell(model, "SYNTHETIC",
                         extra=["--epoch", str(args.smoke_epochs),
                                "--synthetic-edges",
                                str(args.smoke_edges), *host_extra])
            r.update(model=model, dataset=dsname,
                     expected_min_ap=SMOKE_MIN_AP)
            if r["status"] == "ok":
                r["pass"] = r["test_ap"] >= SMOKE_MIN_AP
            print(json.dumps(r), flush=True)
            cells.append(r)
    else:
        for dataset in args.datasets:
            present = os.path.exists(
                os.path.join(args.data_dir, dataset, "edges.csv"))
            for model in args.models:
                key = (model, dataset)
                if key not in EXPECTED_MIN_AP:
                    continue
                if not present:
                    r = {"model": model, "dataset": dataset,
                         "status": "skipped",
                         "reason": f"{dataset}/edges.csv not found under "
                                   f"{args.data_dir}"}
                    print(json.dumps(r), flush=True)
                    cells.append(r)
                    continue
                r = run_cell(model, dataset)
                r.update(model=model, dataset=dataset,
                         expected_min_ap=EXPECTED_MIN_AP[key])
                if r["status"] == "ok":
                    r["pass"] = r["test_ap"] >= EXPECTED_MIN_AP[key]
                print(json.dumps(r), flush=True)
                cells.append(r)

    ran = [c for c in cells if c["status"] == "ok"]
    passed = [c for c in ran if c.get("pass")]
    skipped = [c for c in cells if c["status"] == "skipped"]
    failed = [c for c in cells
              if c["status"] not in ("ok", "skipped") or
              (c["status"] == "ok" and not c.get("pass"))]
    summary = {"cells": len(cells), "ran": len(ran),
               "passed": len(passed), "skipped": len(skipped),
               "failed": len(failed),
               "verdict": ("PASS" if ran and not failed else
                           "NO-DATA" if not ran else "FAIL")}
    print(json.dumps({"summary": summary}), flush=True)
    with open(args.json_out, "w") as f:
        json.dump({"summary": summary, "cells": cells}, f, indent=2)
    sys.exit(0 if summary["verdict"] in ("PASS", "NO-DATA") else 1)


if __name__ == "__main__":
    main()
