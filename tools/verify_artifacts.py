"""Artifact gate for real-data quality parity (VERDICT r3 #8).

Zero-egress environments cannot download the published FID weights or the
real datasets, so the real-data half of the parity story
(soft_intro_vae/metrics/inception.py:17 weights; soft_intro_vae_3d/README.md
:59-62 JSD table; style_soft_intro_vae/README.md:70 FFHQ FID) stays queued.
This tool makes that state explicit and self-resolving:

  python tools/verify_artifacts.py            # status: found / missing + where to drop
  python tools/verify_artifacts.py --run      # run every parity job whose artifacts exist

Jobs (each skipped with a BLOCKED line when its artifacts are absent):
  inception-parity   real pt_inception .pth loaded into BOTH the torch twin
                     (tests/test_fid_full_parity.py) and this framework's
                     InceptionV3FID via params_from_torch_state_dict;
                     pool3 activations must agree to <=1e-3 max-abs.
  cifar-fid          split-half FID on real CIFAR-10 through real weights
                     (a correctness smoke for the full recipe FID: two
                     disjoint 5k halves of the train set must score ~0-2).
  shapenet-load      ShapeNetDataset over real .ply files: split sizes per
                     class + a JSD(valid, valid) == 0 self-check; prints the
                     training command for the README JSD table.
  ref-ckpt-convert   a reference image-model .pth converted through
                     utils/torch_compat and driven to produce a sample grid.
"""

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FID_WEIGHTS = "pt_inception-2015-12-05-6726825d.pth"

ARTIFACTS = {
    "fid_weights": {
        "what": f"published FID Inception weights ({FID_WEIGHTS})",
        "candidates": [
            os.path.join(REPO, FID_WEIGHTS),
            os.path.join(REPO, "artifacts", "pretrained", FID_WEIGHTS),
            os.path.expanduser(f"~/.cache/soft_intro_vae_tpu/{FID_WEIGHTS}"),
        ],
        "drop": f"{REPO}/artifacts/pretrained/{FID_WEIGHTS}",
    },
    "cifar10": {
        "what": "CIFAR-10 python batches (cifar-10-batches-py/)",
        "candidates": [
            os.path.join(REPO, "data", "cifar10_ds", "cifar-10-batches-py"),
            os.path.join(REPO, "data", "cifar-10-batches-py"),
        ],
        "drop": f"{REPO}/data/cifar10_ds/cifar-10-batches-py/",
    },
    "shapenet": {
        "what": "ShapeNet .ply folder ({synset_id}/*.ply)",
        "candidates": [
            os.path.join(REPO, "data", "shapenet"),
            os.path.join(REPO, "data", "ShapeNetCore.v2"),
        ],
        "drop": f"{REPO}/data/shapenet/{{synset_id}}/*.ply",
        "check": lambda p: bool(glob.glob(os.path.join(p, "*", "*.ply"))),
    },
    "ffhq_tfrecords": {
        "what": "FFHQ per-LOD TFRecord shards (ffhq-r*.tfrecords.*)",
        "candidates": [
            os.path.join(REPO, "data", "ffhq"),
            os.path.join(REPO, "data", "datasets", "ffhq"),
        ],
        "drop": f"{REPO}/data/ffhq/ffhq-r08.tfrecords.000 ...",
        "check": lambda p: bool(glob.glob(os.path.join(p, "*tfrecords*"))),
    },
    "ref_image_ckpt": {
        "what": "reference image-model checkpoint (model_*_*.pth)",
        "candidates": [os.path.join(REPO, "artifacts", "pretrained")],
        "drop": f"{REPO}/artifacts/pretrained/model_epoch_NNN_iter_NNN.pth",
        "check": lambda p: bool(glob.glob(os.path.join(p, "model_**.pth"))),
    },
}


def find(name):
    a = ARTIFACTS[name]
    check = a.get("check", os.path.exists)
    for cand in a["candidates"]:
        if os.path.exists(cand) and check(cand):
            return cand
    return None


def status():
    found = {}
    print(f"{'artifact':<16} {'status':<8} location / drop point")
    print("-" * 78)
    for name, a in ARTIFACTS.items():
        p = find(name)
        found[name] = p
        if p:
            print(f"{name:<16} {'FOUND':<8} {p}")
        else:
            print(f"{name:<16} {'missing':<8} drop at: {a['drop']}")
    return found


# ------------------------------------------------------------------ jobs ---

def job_inception_parity(weights):
    import numpy as np
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_fid_full_parity import TInceptionV3FID

    from soft_intro_vae_tpu.metrics.fid import load_fid_network

    twin = TInceptionV3FID()
    sd = torch.load(weights, map_location="cpu")
    missing, unexpected = twin.load_state_dict(sd, strict=False)
    twin.eval()
    apply_fn, _ = load_fid_network(weights)
    rng = np.random.RandomState(0)
    x = rng.rand(4, 299, 299, 3).astype(np.float32)
    with torch.no_grad():
        want = twin(torch.from_numpy(x.transpose(0, 3, 1, 2)), resize=False).numpy()
    import jax.numpy as jnp

    from soft_intro_vae_tpu.metrics.fid import InceptionV3FID, params_from_torch_state_dict
    import jax

    model = InceptionV3FID(resize_input=False)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3)))
    variables = params_from_torch_state_dict(sd, variables)
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    err = float(np.max(np.abs(got - want)))
    ok = err <= 1e-3
    print(f"inception-parity: pool3 max|diff| = {err:.2e} "
          f"({'PASS' if ok else 'FAIL'}; twin missing={len(missing)} "
          f"unexpected={len(unexpected)})")
    return {"pool3_max_abs_diff": err, "pass": ok}


def job_cifar_fid(weights, cifar_dir):
    import numpy as np

    from soft_intro_vae_tpu.data.images import load_cifar10
    from soft_intro_vae_tpu.metrics.fid import (
        compute_statistics_streaming, frechet_distance, load_fid_network)

    arr = load_cifar10(os.path.dirname(cifar_dir))
    assert arr is not None
    apply_fn, _ = load_fid_network(weights)

    # load_cifar10 already returns float32 in [0, 1] (data/images.py) — do
    # NOT divide by 255 again or Inception sees near-black images and the
    # split-half gate stops validating the real-range pipeline
    def batches(lo, hi, bs=50):
        for i in range(lo, hi, bs):
            yield arr[i: i + bs].astype(np.float32)

    mu_a, sig_a = compute_statistics_streaming(apply_fn, batches(0, 5000))
    mu_b, sig_b = compute_statistics_streaming(apply_fn, batches(5000, 10000))
    fid = float(frechet_distance(mu_a, sig_a, mu_b, sig_b))
    ok = fid < 5.0
    print(f"cifar-fid: split-half FID = {fid:.3f} ({'PASS' if ok else 'FAIL'};"
          " expected ~0-2 for disjoint real halves)")
    print("  full recipe: python -m soft_intro_vae_tpu.cli.main image -d cifar10"
          " -n 250 -z 128 -l 2e-4 -b 32 -v 0 -r 1.0 -k 1.0 -e 256 -g 1e-8 -s 92 -f")
    return {"split_half_fid": fid, "pass": ok}


def job_shapenet(shapenet_dir):
    import numpy as np

    from soft_intro_vae_tpu.data.shapenet import ShapeNetDataset
    from soft_intro_vae_tpu.metrics.jsd import jsd_between_point_cloud_sets

    sizes = {}
    for split in ("train", "valid", "test"):
        try:
            ds = ShapeNetDataset(shapenet_dir, split=split)
            sizes[split] = len(ds)
        except FileNotFoundError as e:
            print(f"shapenet-load: {e}")
            return {"pass": False}
    valid = ShapeNetDataset(shapenet_dir, split="valid")
    pts = np.stack([valid[i][0] for i in range(min(8, len(valid)))])
    self_jsd = float(jsd_between_point_cloud_sets(pts, pts))
    ok = self_jsd < 1e-6
    print(f"shapenet-load: splits {sizes}; JSD(valid, valid) = {self_jsd:.2e} "
          f"({'PASS' if ok else 'FAIL'})")
    print("  README JSD table: python -m soft_intro_vae_tpu.cli.main 3d"
          " --config configs/soft_intro_vae_hp.json  # then cli.eval_3d test-jsd")
    return {"splits": sizes, "self_jsd": self_jsd, "pass": ok}


def job_ref_ckpt(ckpt_dir):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from soft_intro_vae_tpu.data.images import DATASETS
    from soft_intro_vae_tpu.models.conv import ConvDecoder
    from soft_intro_vae_tpu.utils.plotting import save_image_grid
    from soft_intro_vae_tpu.utils.torch_compat import load_reference_image_checkpoint

    path = sorted(glob.glob(os.path.join(ckpt_dir, "model_**.pth")))[0]
    # reference filenames do not carry dataset/zdim; default to the CIFAR
    # recipe, overridable with a sidecar JSON {'dataset': ..., 'zdim': ...}
    meta = os.path.join(ckpt_dir, "ckpt_meta.json")
    ds, zdim = "cifar10", 128
    if os.path.exists(meta):
        m = json.load(open(meta))
        ds, zdim = m.get("dataset", ds), int(m.get("zdim", zdim))
    spec = DATASETS[ds]
    blob = load_reference_image_checkpoint(path, spec.channels, spec.image_size)
    dec = ConvDecoder(cdim=spec.cdim, zdim=zdim, channels=spec.channels,
                      image_size=spec.image_size)
    z = jax.random.normal(jax.random.key(0), (16, zdim), jnp.float32)
    y = dec.apply({"params": blob["params_d"],
                   "batch_stats": blob.get("stats_d", {})}, z, train=False)
    out = os.path.join(REPO, "artifacts", "ref_ckpt_samples.png")
    save_image_grid(np.clip(np.asarray(y), 0, 1), out, nrow=4)
    print(f"ref-ckpt-convert: {os.path.basename(path)} (epoch "
          f"{blob['epoch']}) -> sample grid {out}")
    return {"ckpt": path, "grid": out, "pass": True}


def run_jobs(found):
    results = {}
    if found["fid_weights"]:
        results["inception_parity"] = job_inception_parity(found["fid_weights"])
    else:
        print(f"BLOCKED inception-parity: need {ARTIFACTS['fid_weights']['drop']}")
    if found["fid_weights"] and found["cifar10"]:
        results["cifar_fid"] = job_cifar_fid(found["fid_weights"], found["cifar10"])
    else:
        print("BLOCKED cifar-fid: need fid_weights + cifar10")
    if found["shapenet"]:
        results["shapenet"] = job_shapenet(found["shapenet"])
    else:
        print(f"BLOCKED shapenet-load: need {ARTIFACTS['shapenet']['drop']}")
    if found["ref_image_ckpt"]:
        try:
            results["ref_ckpt"] = job_ref_ckpt(found["ref_image_ckpt"])
        except Exception as e:  # converter mismatch should not kill the gate
            print(f"ref-ckpt-convert: FAILED ({e})")
            results["ref_ckpt"] = {"pass": False, "error": str(e)}
    else:
        print(f"BLOCKED ref-ckpt-convert: need {ARTIFACTS['ref_image_ckpt']['drop']}")
    if found["ffhq_tfrecords"]:
        print("ffhq shards present: run the unmodified recipe for the README"
              " 17.55 FID -> python -m soft_intro_vae_tpu.cli.style_train"
              " -c configs/ffhq256.yaml")
    else:
        print(f"BLOCKED ffhq-fid: need {ARTIFACTS['ffhq_tfrecords']['drop']}")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", action="store_true",
                    help="run parity jobs for every artifact present")
    ap.add_argument("--json", default=None, help="write results JSON here")
    args = ap.parse_args()
    found = status()
    if not args.run:
        n = sum(1 for v in found.values() if v)
        print(f"\n{n}/{len(found)} artifact groups present. "
              "Re-run with --run to execute the parity jobs.")
        return
    results = run_jobs(found)
    if args.json:
        with open(args.json, "w") as fp:
            json.dump(results, fp, indent=2)
        print("WROTE", args.json)


if __name__ == "__main__":
    main()
