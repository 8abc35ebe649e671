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
