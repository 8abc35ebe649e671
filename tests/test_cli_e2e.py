"""End-to-end CLI tests: drive the real command-line surface in a subprocess."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast profile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd, timeout=420):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # share the (opt-in) persistent XLA compile cache with the subprocess
    if os.environ.get("SIV_TEST_COMPILE_CACHE"):
        env.setdefault("JAX_COMPILATION_CACHE_DIR", os.environ["SIV_TEST_COMPILE_CACHE"])
        env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv = ['prog'] + %r;"
        "from soft_intro_vae_tpu.cli.main import main; main(sys.argv[1:])" % (args,)
    )
    return subprocess.run([sys.executable, "-c", code], cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=timeout)


def test_toy_cli_runs(tmp_path):
    r = _run(["toy", "-d", "8Gaussians", "-n", "60", "-v", "20", "-s", "1"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(tmp_path / "results_toy" / "results_log_soft_intro_vae.txt")


def test_image_cli_runs_synthetic(tmp_path, monkeypatch):
    # in-process: drives the same argparse surface without a second JAX
    # startup (the subprocess variant was timing-out under host load)
    from soft_intro_vae_tpu.cli.main import main

    monkeypatch.chdir(tmp_path)
    # --synthetic-n 128 -> 8 intro steps: the full 2048-image epoch costs
    # ~23 min on this 1-core host and adds no coverage over 8 steps
    main(["image", "-d", "mnist", "-n", "1", "-z", "8", "-b", "16", "-e", "16",
          "-s", "1", "--synthetic-n", "128", "--result_dir", str(tmp_path / "out")])
    assert os.path.isdir(tmp_path / "out")


def test_cli_rejects_unknown_command(tmp_path):
    r = _run(["nonsense"], cwd=str(tmp_path), timeout=120)
    assert r.returncode != 0


def test_bootstrap_cli_runs_synthetic(tmp_path, monkeypatch):
    # e2e: the bootstrap subcommand through the real argparse surface, tiny
    # synthetic recipe (reference analog: soft_intro_vae_bootstrap/main.py)
    from soft_intro_vae_tpu.cli.main import main

    monkeypatch.chdir(tmp_path)
    main(["bootstrap", "-d", "mnist", "-n", "1", "-z", "8", "-b", "16",
          "-e", "16", "-g", "1.0", "-o", "1", "-s", "1",
          "--synthetic-n", "64", "--result_dir", str(tmp_path / "boot_out")])
    assert os.path.isdir(tmp_path / "boot_out")


def test_threed_cli_runs_synthetic(tmp_path, monkeypatch):
    # e2e: the threed subcommand with a JSON config (the reference's config
    # schema, soft_intro_vae_3d/config/soft_intro_vae_hp.json), hermetic via
    # the use_synthetic extension keys
    import json

    from soft_intro_vae_tpu.cli.main import main

    cfg = {
        "use_synthetic": True, "synthetic_n": 16, "n_points": 128,
        "batch_size": 8, "max_epochs": 1, "z_size": 16, "num_vae": 0,
        "beta_rec": 20.0, "beta_kl": 1.0, "beta_neg": 64.0,
        "valid_frequency": 1, "seed": 1, "verbose": False,
        "results_root": str(tmp_path / "3d_results"),
        "arch": "vae", "experiment_name": "cli_e2e",
    }
    p = tmp_path / "hp.json"
    p.write_text(json.dumps(cfg))
    monkeypatch.chdir(tmp_path)
    main(["threed", "-c", str(p)])
    assert os.path.isdir(tmp_path / "3d_results" / "vae" / "cli_e2e")


def test_style_cli_runs_synthetic_epoch(tmp_path, monkeypatch):
    # e2e: the style subcommand drives one real (tiny) training epoch through
    # YAML + KEY VALUE overrides — upgrade of the parse-level test below
    from soft_intro_vae_tpu.cli.main import main

    y = """
NAME: cli_e2e
MODEL:
  LAYER_COUNT: 3
  START_CHANNEL_COUNT: 8
  MAX_CHANNEL_COUNT: 32
  LATENT_SPACE_SIZE: 16
  MAPPING_LAYERS: 2
  BETA_NEG: [32, 32, 32]
  SCALE: 0.0013
DATASET:
  SYNTHETIC: true
  SYNTHETIC_N: 32
  MAX_RESOLUTION_LEVEL: 4
TRAIN:
  EPOCHS_PER_LOD: 1
  TRAIN_EPOCHS: 2
  NUM_VAE: 1
  LOD_2_BATCH_1GPU: [16, 16, 16]
"""
    p = tmp_path / "tiny.yaml"
    p.write_text(y)
    monkeypatch.chdir(tmp_path)
    main(["style", "-c", str(p), "OUTPUT_DIR", str(tmp_path / "style_out"),
          "TRAIN.TRAIN_EPOCHS", "1"])
    assert os.path.isdir(tmp_path / "style_out")


def test_style_cli_dispatches_with_overrides(tmp_path, monkeypatch):
    # parse-level: the style subcommand loads the YAML, applies trailing
    # KEY VALUE overrides (reference launcher.py:49 merge semantics) and
    # calls the trainer with the merged config — no compile involved
    import soft_intro_vae_tpu.train.style as style_mod
    from soft_intro_vae_tpu.cli.main import main

    captured = {}
    monkeypatch.setattr(style_mod, "train_style_soft_intro_vae",
                        lambda cfg, dataset=None: captured.setdefault("cfg", cfg))
    cfg_path = os.path.join(REPO, "configs", "ffhq256.yaml")
    main(["style", "-c", cfg_path,
          "TRAIN.TRAIN_EPOCHS", "3", "MODEL.LATENT_SPACE_SIZE", "64",
          "OUTPUT_DIR", str(tmp_path / "style_out")])
    cfg = captured["cfg"]
    assert cfg.train_epochs == 3
    assert cfg.latent_space_size == 64
    assert cfg.output_dir == str(tmp_path / "style_out")
    # untouched keys keep their YAML values (ffhq256: layer_count 7)
    assert cfg.layer_count == 7
