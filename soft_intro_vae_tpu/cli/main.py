"""Unified CLI preserving the reference flag surfaces.

One binary, five subcommands mirroring the reference entry points:
  * ``image``     — /root/reference/soft_intro_vae/main.py flags
  * ``bootstrap`` — /root/reference/soft_intro_vae_bootstrap/main.py (+ -o/--freq)
  * ``toy``       — /root/reference/soft_intro_vae_2d/main.py
  * ``threed``    — /root/reference/soft_intro_vae_3d (-c JSON config path)
  * ``style``     — /root/reference/style_soft_intro_vae/train_style_soft_intro_vae.py
                    (-c YAML config + trailing KEY VALUE overrides)

The reference's ``-c/--device`` (CUDA index) is accepted for compatibility
but maps to "how many chips" here: -1 or 0 -> all local devices (the TPU
runtime owns placement); the ``--num_devices`` extension limits the mesh.

Usage:  python -m soft_intro_vae_tpu.cli.main image -d cifar10 -n 250 ...
"""

from __future__ import annotations

import argparse
import sys


def _common_image_flags(p: argparse.ArgumentParser, gamma_r_default: float):
    p.add_argument("-d", "--dataset", type=str, required=True,
                   help="['cifar10', 'mnist', 'fmnist', 'svhn', 'monsters128', 'celeb128', 'celeb256', 'celeb1024']")
    p.add_argument("-n", "--num_epochs", type=int, default=250)
    p.add_argument("-z", "--z_dim", type=int, default=128)
    p.add_argument("-l", "--lr", type=float, default=2e-4)
    p.add_argument("-b", "--batch_size", type=int, default=32)
    p.add_argument("-v", "--num_vae", type=int, default=0)
    p.add_argument("-r", "--beta_rec", type=float, default=1.0)
    p.add_argument("-k", "--beta_kl", type=float, default=1.0)
    p.add_argument("-e", "--beta_neg", type=float, default=1.0)
    p.add_argument("-g", "--gamma_r", type=float, default=gamma_r_default)
    p.add_argument("-s", "--seed", type=int, default=-1)
    p.add_argument("-p", "--pretrained", type=str, default="None")
    p.add_argument("-c", "--device", type=int, default=-1,
                   help="compat flag; device placement is automatic on TPU")
    p.add_argument("-f", "--fid", action="store_true")
    p.add_argument("--data_root", type=str, default="./data")
    p.add_argument("--result_dir", type=str, default=None)
    p.add_argument("--num_devices", type=int, default=None, help="data-parallel mesh size")
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute (TPU fast path)")
    p.add_argument("--scan-steps", type=int, default=1,
                   help="fuse K train steps per device launch (lax.scan); "
                        "amortizes dispatch overhead for small batches")
    p.add_argument("--no-synthetic-fallback", action="store_true",
                   help="fail when the dataset files are absent instead of "
                        "substituting synthetic images")
    p.add_argument("--synthetic-n", type=int, default=2048,
                   help="synthetic-fallback dataset size (smoke runs)")


def _run_image(args, bootstrap: bool):
    from soft_intro_vae_tpu.train.image import ImageConfig, train_soft_intro_vae

    cfg = ImageConfig(
        dataset=args.dataset, z_dim=args.z_dim, lr_e=args.lr, lr_d=args.lr,
        batch_size=args.batch_size, num_epochs=args.num_epochs, num_vae=args.num_vae,
        beta_kl=args.beta_kl, beta_rec=args.beta_rec, beta_neg=args.beta_neg,
        gamma_r=args.gamma_r, seed=args.seed, with_fid=args.fid,
        pretrained=None if args.pretrained == "None" else args.pretrained,
        data_root=args.data_root,
        result_dir=args.result_dir or (f"./results_{args.dataset}" + ("_bootstrap" if bootstrap else "")),
        bootstrap=bootstrap,
        copy_to_target_freq=getattr(args, "freq", 1),
        num_devices=args.num_devices,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        scan_steps=args.scan_steps,
        synthetic_fallback=not args.no_synthetic_fallback,
        synthetic_n=args.synthetic_n,
        # reference celeb branches pass is_mirror=True (train_soft_intro_vae.py:392,404,417)
        mirror_augment=args.dataset.startswith("celeb"),
    )
    train_soft_intro_vae(cfg)


def _run_toy(args):
    from soft_intro_vae_tpu.train.toy import ToyConfig, train_soft_intro_vae_toy

    scale = 1.0 if args.dataset == "8Gaussians" else 2.0
    cfg = ToyConfig(
        dataset=args.dataset, z_dim=args.z_dim, lr_e=args.lr, lr_d=args.lr,
        batch_size=args.batch_size, n_iter=args.num_iter, num_vae=args.num_vae,
        beta_kl=args.beta_kl, beta_rec=args.beta_rec, beta_neg=args.beta_neg,
        gamma_r=args.gamma_r, seed=args.seed, scale=scale,
        save_interval=5000, test_iter=5000,
    )
    train_soft_intro_vae_toy(cfg)


def _run_style(args):
    from soft_intro_vae_tpu.train.style import StyleConfig, train_style_soft_intro_vae

    cfg = StyleConfig.from_yaml(args.config_file, overrides=args.opts)
    train_style_soft_intro_vae(cfg)


def _run_threed(args):
    from soft_intro_vae_tpu.train.threed import ThreeDConfig, train_soft_intro_vae_3d

    if args.config:
        cfg = ThreeDConfig.from_json(args.config)
    else:
        cfg = ThreeDConfig()
    train_soft_intro_vae_3d(cfg)


def build_parser() -> argparse.ArgumentParser:
    root = argparse.ArgumentParser(prog="soft-intro-vae-tpu", description="train Soft-IntroVAE (TPU)")
    sub = root.add_subparsers(dest="command", required=True)

    p_img = sub.add_parser("image", help="image variant (cifar10/celeb/...)")
    _common_image_flags(p_img, gamma_r_default=1e-8)

    p_boot = sub.add_parser("bootstrap", help="bootstrap variant (frozen target decoder)")
    _common_image_flags(p_boot, gamma_r_default=1.0)
    p_boot.add_argument("-o", "--freq", type=int, default=1,
                        help="epochs between decoder->target weight copies")

    p_toy = sub.add_parser("toy", help="2D toy variant")
    p_toy.add_argument("-d", "--dataset", type=str, required=True,
                       help="['8Gaussians', '2spirals', 'checkerboard', 'rings']")
    p_toy.add_argument("-n", "--num_iter", type=int, default=30000)
    p_toy.add_argument("-z", "--z_dim", type=int, default=2)
    p_toy.add_argument("-l", "--lr", type=float, default=2e-4)
    p_toy.add_argument("-b", "--batch_size", type=int, default=512)
    p_toy.add_argument("-v", "--num_vae", type=int, default=2000)
    p_toy.add_argument("-r", "--beta_rec", type=float, default=0.2)
    p_toy.add_argument("-k", "--beta_kl", type=float, default=0.3)
    p_toy.add_argument("-e", "--beta_neg", type=float, default=0.9)
    p_toy.add_argument("-g", "--gamma_r", type=float, default=1e-8)
    p_toy.add_argument("-s", "--seed", type=int, default=-1)
    p_toy.add_argument("-p", "--pretrained", type=str, default="None")
    p_toy.add_argument("-c", "--device", type=int, default=-1)

    p_3d = sub.add_parser("threed", help="3D point-cloud variant")
    p_3d.add_argument("-c", "--config", type=str, default=None, help="JSON config path")

    # style variant launcher mirrors the reference's
    # train_style_soft_intro_vae.py / launcher.py surface: -c <yaml> plus
    # trailing KEY VALUE pairs merged into the config
    # (style_soft_intro_vae/train_style_soft_intro_vae.py:103-123,
    #  launcher.py:49 merge_from_list)
    p_style = sub.add_parser("style", help="progressive style variant (YAML config)")
    p_style.add_argument("-c", "--config-file", type=str, default="configs/ffhq256.yaml",
                         metavar="FILE", help="path to YAML config file")
    p_style.add_argument("opts", nargs=argparse.REMAINDER, default=[],
                         help="config overrides as KEY VALUE pairs "
                              "(e.g. TRAIN.TRAIN_EPOCHS 5 DATASET.PATH shards/r%%02d.tfrecords)")

    return root


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.command == "image":
        _run_image(args, bootstrap=False)
    elif args.command == "bootstrap":
        _run_image(args, bootstrap=True)
    elif args.command == "toy":
        _run_toy(args)
    elif args.command == "style":
        _run_style(args)
    elif args.command == "threed":
        _run_threed(args)
    else:
        raise SystemExit(f"unknown command {args.command}")


if __name__ == "__main__":
    main(sys.argv[1:])
