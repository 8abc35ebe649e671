"""uint8 host-storage pipeline (VERDICT round-3 item 4 / host-fed bench).

The framework's default image feed keeps pixels as source bytes on host
(4x less RAM + 4x fewer H2D bytes — the H2D transfer serializes with
compute on the tunneled TPU, BENCH_NOTES host-fed rows) and normalizes to
f32 [0,1] ON DEVICE (data/prefetch.py normalizing_put_fn). These tests pin
the exactness claim: uint8 storage must be bit-identical to the reference's
host-side ToTensor normalization (soft_intro_vae/dataset.py:129-134) at
every consumer — training step, FID statistics, loaders.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from soft_intro_vae_tpu.data.images import ImageSpec, to_unit_float
from soft_intro_vae_tpu.data.prefetch import normalizing_put_fn
from soft_intro_vae_tpu.parallel import mesh as pmesh


def test_to_unit_float_roundtrip_exact():
    u8 = np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1)
    f = to_unit_float(u8)
    assert f.dtype == np.float32
    np.testing.assert_array_equal(f, u8.astype(np.float32) / 255.0)
    # float passthrough is identity (no copy, no rescale)
    f2 = to_unit_float(f)
    assert f2 is f


def test_u8norm_bit_trick_exact_all_values():
    """ops/u8norm.py gather-free normalize == host numpy /255 for every byte
    (the in-step fast path build_train_steps picks for the unit table)."""
    from soft_intro_vae_tpu.ops.u8norm import u8_to_unit_f32

    xs = jnp.arange(256, dtype=jnp.uint8)
    dev = np.asarray(jax.jit(u8_to_unit_f32)(xs))
    host = np.arange(256, dtype=np.uint8).astype(np.float32) / np.float32(255)
    np.testing.assert_array_equal(dev, host)
    assert dev[0] == 0.0 and dev[255] == 1.0


def test_normalizing_put_uint8_matches_f32():
    mesh = pmesh.make_data_mesh()
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (16, 8, 8, 3), dtype=np.uint8)
    put = normalizing_put_fn(mesh)
    a = np.asarray(put(u8))
    b = np.asarray(put(u8.astype(np.float32) / 255.0))
    assert a.dtype == np.float32
    np.testing.assert_array_equal(a, b)


def test_normalizing_put_scan_layout():
    mesh = pmesh.make_data_mesh()
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (2, 16, 8, 8, 3), dtype=np.uint8)  # (K, B, ...)
    put = normalizing_put_fn(mesh, scan=True)
    x = put(u8)
    assert x.dtype == jnp.float32 and x.shape == u8.shape
    np.testing.assert_array_equal(np.asarray(x), u8.astype(np.float32) / 255.0)


@pytest.mark.slow
def test_intro_step_identical_under_uint8_feed():
    """One full introspective update fed uint8 vs f32 => identical state."""
    from soft_intro_vae_tpu.train.image import ImageConfig, build_image_training

    spec = ImageSpec("t", 16, (8, 16), 3)
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, (16, 16, 16, 3), dtype=np.uint8)

    results = []
    for batch in (u8, u8.astype(np.float32) / 255.0):
        cfg = ImageConfig(dataset="cifar10", z_dim=8, batch_size=16, seed=0,
                          beta_neg=16.0)
        _, _, state, _, intro, mesh = build_image_training(cfg, spec)
        x = normalizing_put_fn(mesh)(batch)
        state, m = intro(state, x)
        results.append((jax.tree_util.tree_map(np.asarray, state.params_e),
                        {k: float(v) for k, v in m.items()}))
    (pa, ma), (pb, mb) = results
    assert ma == mb
    for a, b in zip(jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_intro_step_raw_byte_feed_in_step_lut():
    """The round-5 feed path: raw uint8 shipped via sharding_put_fn and
    normalized INSIDE the compiled step (input_lut in build_train_steps) must
    produce bit-identical updates to feeding pre-normalized f32 through the
    same step (dtype passthrough). This is the trainer's default wiring
    (train/image.py:300) — one device_put per batch, no normalize dispatch."""
    from soft_intro_vae_tpu.data.prefetch import sharding_put_fn
    from soft_intro_vae_tpu.train.image import ImageConfig, build_image_training

    spec = ImageSpec("t", 16, (8, 16), 3)
    rng = np.random.default_rng(13)
    u8 = rng.integers(0, 256, (16, 16, 16, 3), dtype=np.uint8)

    results = []
    for batch in (u8, u8.astype(np.float32) / 255.0):
        cfg = ImageConfig(dataset="cifar10", z_dim=8, batch_size=16, seed=0,
                          beta_neg=16.0, host_storage="uint8")
        _, _, state, _, intro, mesh = build_image_training(cfg, spec)
        x = sharding_put_fn(mesh)(batch)
        assert np.asarray(x).dtype == batch.dtype  # put ships bytes untouched
        state, m = intro(state, x)
        results.append((jax.tree_util.tree_map(np.asarray, state.params_e),
                        {k: float(v) for k, v in m.items()}))
    (pa, ma), (pb, mb) = results
    assert ma == mb
    for a, b in zip(jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)):
        np.testing.assert_array_equal(a, b)


def test_fid_streaming_stats_uint8_matches_f32():
    from soft_intro_vae_tpu.metrics.fid import compute_statistics_streaming

    rng = np.random.default_rng(5)
    u8 = rng.integers(0, 256, (24, 8, 8, 3), dtype=np.uint8)
    apply_fn = lambda x: x.reshape(x.shape[0], -1)[:, :6]
    mu_u, cov_u = compute_statistics_streaming(apply_fn, [u8[:12], u8[12:]])
    f32 = u8.astype(np.float32) / 255.0
    mu_f, cov_f = compute_statistics_streaming(apply_fn, [f32[:12], f32[12:]])
    np.testing.assert_array_equal(mu_u, mu_f)
    np.testing.assert_array_equal(cov_u, cov_f)


class TestLoaderStorage:
    def test_mnist_idx_uint8(self, tmp_path):
        from soft_intro_vae_tpu.data.images import load_mnist_idx

        rng = np.random.default_rng(7)
        imgs = rng.integers(0, 256, (5, 28, 28), dtype=np.uint8)
        raw = b"\x00\x00\x08\x03" + (5).to_bytes(4, "big") \
            + (28).to_bytes(4, "big") + (28).to_bytes(4, "big") + imgs.tobytes()
        (tmp_path / "train-images-idx3-ubyte").write_bytes(raw)
        u = load_mnist_idx(str(tmp_path), dtype="uint8")
        f = load_mnist_idx(str(tmp_path))
        assert u.dtype == np.uint8 and f.dtype == np.float32
        np.testing.assert_array_equal(to_unit_float(u), f)

    def test_folder_uint8(self, tmp_path):
        PIL = pytest.importorskip("PIL")
        from PIL import Image

        from soft_intro_vae_tpu.data.images import FolderDataset, load_image_folder

        rng = np.random.default_rng(9)
        for i in range(6):
            Image.fromarray(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)).save(
                tmp_path / f"i{i}.png")
        u = load_image_folder(str(tmp_path), 16, dtype="uint8")
        f = load_image_folder(str(tmp_path), 16)
        assert u.dtype == np.uint8
        np.testing.assert_array_equal(to_unit_float(u), f)
        files = sorted(str(p) for p in tmp_path.glob("*.png"))
        lazy = FolderDataset(files, 16, dtype="uint8")
        batch = next(lazy.epoch(4, epoch_index=0))
        assert batch.dtype == np.uint8

    def test_make_dataset_monsters_forces_float(self, tmp_path):
        """monsters128's hue augment is float host math — uint8 request is
        overridden to float32 storage there."""
        PIL = pytest.importorskip("PIL")
        from PIL import Image

        from soft_intro_vae_tpu.data.images import make_dataset

        d = tmp_path / "monsters128"
        d.mkdir()
        rng = np.random.default_rng(11)
        for i in range(4):
            Image.fromarray(rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)).save(
                d / f"m{i}.png")
        _, ds = make_dataset("monsters128", str(tmp_path), storage="uint8")
        assert ds.images.dtype == np.float32
