"""Multi-seed 2D quality A/B: bound the 8Gaussians JSD spread (VERDICT r3 #5).

Runs the SAME short protocol (10k iters, num_vae=2000, recipe betas) at N
seeds on BOTH sides — the reference torch-CPU trainer
(/root/reference/soft_intro_vae_2d/train_soft_intro_vae_2d.py, imported and
called with its own defaults) and this framework's toy trainer — and reports
mean +/- std for gnELBO / histogram-KL / histogram-JSD. The histogram
metrics are 5000-sample 100-bin Monte-Carlo estimators; the point of the
multi-seed run is to measure their seed-to-seed spread so single-cell
deviations (round-2's +23% JSD) can be judged against noise.

Usage:
  python tools/ab_2d_multiseed.py --side ref  --out /tmp/ab2d/ref.json
  python tools/ab_2d_multiseed.py --side ours --out /tmp/ab2d/ours.json
  python tools/ab_2d_multiseed.py --report /tmp/ab2d/ref.json /tmp/ab2d/ours.json
"""

import argparse
import json
import os
import sys

SEEDS = [92, 0, 1, 2, 3]
RECIPE = {"dataset": "8Gaussians", "beta_kl": 0.3, "beta_rec": 0.2,
          "beta_neg": 0.9, "z_dim": 2, "batch_size": 512, "lr": 2e-4,
          "n_iter": 10_000, "num_vae": 2000, "scale": 1}


def run_ref(seeds, out_json):
    """Import the reference trainer and run its recipe per seed (torch CPU)."""
    out_json = os.path.abspath(out_json)  # we chdir below; keep --out honest
    import matplotlib

    matplotlib.use("Agg")
    scratch = os.path.join(os.path.dirname(out_json) or ".", "ref_runs")
    os.makedirs(scratch, exist_ok=True)
    os.chdir(scratch)  # the reference writes plots/results_log to CWD
    sys.path.insert(0, "/root/reference/soft_intro_vae_2d")
    import train_soft_intro_vae_2d as ref

    results = []
    for seed in seeds:
        print(f"--- reference seed {seed} ---", flush=True)
        ref.train_soft_intro_vae_toy(
            z_dim=RECIPE["z_dim"], lr_e=RECIPE["lr"], lr_d=RECIPE["lr"],
            batch_size=RECIPE["batch_size"], n_iter=RECIPE["n_iter"],
            num_vae=RECIPE["num_vae"], dataset=RECIPE["dataset"],
            save_interval=RECIPE["n_iter"] + 1, recon_loss_type="mse",
            beta_kl=RECIPE["beta_kl"], beta_rec=RECIPE["beta_rec"],
            beta_neg=RECIPE["beta_neg"], test_iter=5000, seed=seed,
            scale=RECIPE["scale"], device=__import__("torch").device("cpu"))
        # the trainer appends its metrics to results_log_soft_intro_vae.txt
        with open("results_log_soft_intro_vae.txt") as fp:
            line = fp.readlines()[-1].strip()
        res = {"seed": seed, **_parse_ref_line(line)}
        print(res, flush=True)
        results.append(res)
        _dump(out_json, "reference-torch-cpu", results)
    return results


def _parse_ref_line(line):
    # "8Gaussians_beta_kl_0.3_..._gnelbo_V_kl_V_jsd_V_seed_S": "kl" also
    # appears inside "beta_kl", so take the LAST occurrence of each key
    parts = line.strip().split("_")
    def last(key):
        i = len(parts) - 1 - parts[::-1].index(key)
        return float(parts[i + 1])
    return {"gnelbo": last("gnelbo"), "kl": last("kl"), "jsd": last("jsd")}


def reparse_ref(txt_path, out_json, seeds):
    """Rebuild ref.json from an existing results_log txt (parser fixups)."""
    with open(txt_path) as fp:
        lines = [l for l in fp.read().splitlines() if l.strip()]
    results = [{"seed": s, **_parse_ref_line(l)} for s, l in zip(seeds, lines)]
    for r in results:
        print(r)
    _dump(out_json, "reference-torch-cpu", results)


def run_ours(seeds, out_json):
    from soft_intro_vae_tpu.train.toy import ToyConfig, train_soft_intro_vae_toy

    results = []
    for seed in seeds:
        print(f"--- ours seed {seed} ---", flush=True)
        cfg = ToyConfig(
            dataset=RECIPE["dataset"], z_dim=RECIPE["z_dim"],
            batch_size=RECIPE["batch_size"], n_iter=RECIPE["n_iter"],
            num_vae=RECIPE["num_vae"], beta_kl=RECIPE["beta_kl"],
            beta_rec=RECIPE["beta_rec"], beta_neg=RECIPE["beta_neg"],
            lr_e=RECIPE["lr"], lr_d=RECIPE["lr"], scale=RECIPE["scale"],
            test_iter=5000, seed=seed, result_dir=f"/tmp/ab2d_ours_{seed}",
            save_checkpoints=False, save_figures=False, verbose=False)
        _, res = train_soft_intro_vae_toy(cfg)
        rec = {"seed": seed, "gnelbo": float(res["gn_elbo"]),
               "kl": float(res["sample_kl"]), "jsd": float(res["jsd"])}
        print(rec, flush=True)
        results.append(rec)
        _dump(out_json, "soft_intro_vae_tpu", results)
    return results


def _dump(path, side, results):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as fp:
        json.dump({"side": side, "recipe": RECIPE, "results": results}, fp,
                  indent=2)


def report(paths):
    import numpy as np

    print(f"| side | gnELBO (mean±std) | KL (mean±std) | JSD (mean±std) | n |")
    print("|---|---|---|---|---|")
    rows = {}
    for path in paths:
        with open(path) as fp:
            d = json.load(fp)
        rs = d["results"]
        row = {}
        for k in ("gnelbo", "kl", "jsd"):
            vals = np.array([r[k] for r in rs])
            row[k] = (vals.mean(), vals.std(ddof=1) if len(vals) > 1 else 0.0)
        rows[d["side"]] = row
        print(f"| {d['side']} | {row['gnelbo'][0]:.3e} ± {row['gnelbo'][1]:.1e} "
              f"| {row['kl'][0]:.3f} ± {row['kl'][1]:.3f} "
              f"| {row['jsd'][0]:.3f} ± {row['jsd'][1]:.3f} | {len(rs)} |")
    if len(rows) == 2:
        (a_name, a), (b_name, b) = rows.items()
        for k in ("gnelbo", "kl", "jsd"):
            diff = b[k][0] - a[k][0]
            pooled = (a[k][1] ** 2 + b[k][1] ** 2) ** 0.5
            z = diff / pooled if pooled else float("inf")
            print(f"{k}: {b_name} - {a_name} = {diff:+.4g} "
                  f"({z:+.2f} pooled sigmas)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["ref", "ours"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--seeds", type=int, nargs="*", default=SEEDS)
    ap.add_argument("--report", nargs="*", default=None)
    ap.add_argument("--reparse-ref", default=None,
                    help="results_log txt to rebuild --out from")
    args = ap.parse_args()
    if args.report:
        report(args.report)
        return
    if args.reparse_ref:
        reparse_ref(args.reparse_ref, args.out or "/tmp/ab2d/ref.json", args.seeds)
        return
    if args.side == "ref":
        run_ref(args.seeds, args.out or "/tmp/ab2d/ref.json")
    elif args.side == "ours":
        run_ours(args.seeds, args.out or "/tmp/ab2d/ours.json")
    else:
        ap.error("need --side or --report")


if __name__ == "__main__":
    main()
