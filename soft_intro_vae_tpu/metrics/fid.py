"""FID: patched FID-Inception in flax + Fréchet distance, TPU-first.

Capability parity with the reference FID stack
(/root/reference/soft_intro_vae/metrics/{inception.py,fid_score.py}):

* ``InceptionV3FID`` reproduces the *pt_inception-2015-12-05* topology used
  by pytorch-fid (inception.py:184-206), including the FID-specific patches
  that differ from stock torchvision Inception-v3 (inception.py:209-330):
    - every Inception block's avg-pool branch uses count_include_pad=False,
    - Mixed_7c (the second InceptionE) replaces its avg-pool branch with a
      3x3/1 max-pool.
  Layout is NHWC; BN eps=1e-3 as in the TF-slim port.

* Weights: the reference downloads a .pth (inception.py:17). This module
  loads that file if present (``params_from_torch_state_dict`` converts it),
  otherwise falls back to deterministic random init — FID values are then
  self-consistent (usable for relative comparisons and tests) but NOT
  comparable to published numbers; a warning is issued.

* ``frechet_distance`` (fid_score.py:274-325): trace of sqrtm(S1 S2) via
  Newton–Schulz iterations — differentiable-free, matmul-only, runs on the
  MXU — with a scipy.linalg.sqrtm host fallback for validation.

* ``compute_fid``: streams activation batches through a jitted forward,
  accumulates mean/second-moment on device (one pass, no 50k-activation
  host materialization unless requested).
"""

from __future__ import annotations

import os
import warnings
from typing import Callable, Iterable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

FID_WEIGHTS_FILENAME = "pt_inception-2015-12-05-6726825d.pth"


# ---------------------------------------------------------------- pooling ---
def avg_pool_no_pad(x: Array, window: int = 3) -> Array:
    """3x3/1 same avg-pool with count_include_pad=False (the FID patch:
    inception.py:224-228 etc.). Padded zeros are excluded from the mean by
    dividing by the per-position valid-window size."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1), "SAME"
    )
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1), "SAME"
    )
    return summed / counts


def max_pool(x: Array, window: int = 3, stride: int = 2, same: bool = False) -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1),
        "SAME" if same else "VALID",
    )


# ----------------------------------------------------------------- blocks ---
class BasicConv2d(nn.Module):
    out_ch: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)
    # True only during the no-weights BN-stat calibration pass (see
    # load_fid_network): normalize by BATCH stats and update the running ones
    calibrate: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(self.out_ch, self.kernel, strides=(self.stride, self.stride),
                    padding=(self.padding[0], self.padding[1]), use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not self.calibrate, epsilon=1e-3,
                         momentum=0.9, name="bn")(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int
    calibrate: bool = False

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1", calibrate=self.calibrate)(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1", calibrate=self.calibrate)(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2", calibrate=self.calibrate)(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1", calibrate=self.calibrate)(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2", calibrate=self.calibrate)(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3", calibrate=self.calibrate)(b3)
        bp = avg_pool_no_pad(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool", calibrate=self.calibrate)(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    calibrate: bool = False

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3", calibrate=self.calibrate)(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1", calibrate=self.calibrate)(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2", calibrate=self.calibrate)(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3", calibrate=self.calibrate)(bd)
        bp = max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    calibrate: bool = False

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1", calibrate=self.calibrate)(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1", calibrate=self.calibrate)(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2", calibrate=self.calibrate)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3", calibrate=self.calibrate)(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1", calibrate=self.calibrate)(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2", calibrate=self.calibrate)(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3", calibrate=self.calibrate)(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4", calibrate=self.calibrate)(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5", calibrate=self.calibrate)(bd)
        bp = avg_pool_no_pad(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool", calibrate=self.calibrate)(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    calibrate: bool = False

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1", calibrate=self.calibrate)(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2", calibrate=self.calibrate)(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1", calibrate=self.calibrate)(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2", calibrate=self.calibrate)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3", calibrate=self.calibrate)(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4", calibrate=self.calibrate)(b7)
        bp = max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_kind: str = "avg"  # "avg" (Mixed_7b / E_1) or "max" (Mixed_7c / E_2)
    calibrate: bool = False

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1", calibrate=self.calibrate)(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1", calibrate=self.calibrate)(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a", calibrate=self.calibrate)(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b", calibrate=self.calibrate)(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1", calibrate=self.calibrate)(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2", calibrate=self.calibrate)(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a", calibrate=self.calibrate)(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b", calibrate=self.calibrate)(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_kind == "max":
            bp = max_pool(x, 3, 1, same=True)  # FIDInceptionE_2 patch (:322-327)
        else:
            bp = avg_pool_no_pad(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool", calibrate=self.calibrate)(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


# the reference wrapper's dim -> tap-index map (inception.py:28-33)
BLOCK_INDEX_BY_DIM = {
    64: 0,    # first max-pool features
    192: 1,   # second max-pool features
    768: 2,   # pre-aux-classifier features (Mixed_6e)
    2048: 3,  # final average-pool features (pool3)
}


class InceptionV3FID(nn.Module):
    """pt_inception FID network: NHWC in [0,1] -> inception features.

    ``output_blocks`` mirrors the reference wrapper's tap points
    (inception.py:28-33,88-130): 0 = after the first max-pool (64ch),
    1 = after the second max-pool (192ch), 2 = after Mixed_6e (768ch),
    3 = global-avg-pooled Mixed_7c (2048-dim vector). With the default
    ``(3,)`` the pool3 vector is returned bare (the FID path); otherwise a
    tuple of feature maps (NHWC; block 3 is the pooled (B, 2048) vector)
    sorted ascending by index, matching the reference's list return
    (inception.py:135-164). Layers past the last requested block are not
    traced, so a dims-64-only probe compiles a 4-layer program.
    """

    resize_input: bool = True
    calibrate: bool = False
    output_blocks: Tuple[int, ...] = (3,)

    @nn.compact
    def __call__(self, x: Array):
        blocks = sorted(set(self.output_blocks))
        if not blocks or blocks[-1] > 3 or blocks[0] < 0:
            raise ValueError(f"output_blocks must be within 0..3, got {self.output_blocks}")
        last = blocks[-1]
        taps = []
        if self.resize_input:
            x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]), "bilinear")
        x = 2.0 * x - 1.0  # (0,1) -> (-1,1)  (inception.py:151-154)
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3", calibrate=self.calibrate)(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3", calibrate=self.calibrate)(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3", calibrate=self.calibrate)(x)
        x = max_pool(x, 3, 2)
        if 0 in blocks:
            taps.append(x)
        if last >= 1:
            x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1", calibrate=self.calibrate)(x)
            x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3", calibrate=self.calibrate)(x)
            x = max_pool(x, 3, 2)
            if 1 in blocks:
                taps.append(x)
        if last >= 2:
            x = InceptionA(32, name="Mixed_5b", calibrate=self.calibrate)(x)
            x = InceptionA(64, name="Mixed_5c", calibrate=self.calibrate)(x)
            x = InceptionA(64, name="Mixed_5d", calibrate=self.calibrate)(x)
            x = InceptionB(name="Mixed_6a", calibrate=self.calibrate)(x)
            x = InceptionC(128, name="Mixed_6b", calibrate=self.calibrate)(x)
            x = InceptionC(160, name="Mixed_6c", calibrate=self.calibrate)(x)
            x = InceptionC(160, name="Mixed_6d", calibrate=self.calibrate)(x)
            x = InceptionC(192, name="Mixed_6e", calibrate=self.calibrate)(x)
            if 2 in blocks:
                taps.append(x)
        if last >= 3:
            x = InceptionD(name="Mixed_7a", calibrate=self.calibrate)(x)
            x = InceptionE("avg", name="Mixed_7b", calibrate=self.calibrate)(x)
            x = InceptionE("max", name="Mixed_7c", calibrate=self.calibrate)(x)
            taps.append(jnp.mean(x, axis=(1, 2)))  # global avg pool -> (B, 2048)
        if blocks == [3]:
            return taps[0]  # the FID path: bare pool3 vector
        return tuple(taps)


# ------------------------------------------------------- weight conversion ---
def params_from_torch_state_dict(state_dict, template) -> dict:
    """Convert a pytorch-fid .pth state dict into this module's variables.

    torch convs are OIHW -> flax HWIO; Linear heads (fc) are dropped.
    ``template`` is the variables dict from ``init`` (for structure checks).
    """

    def t2n(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    params = jax.tree_util.tree_map(lambda x: np.array(x), template["params"])
    stats = jax.tree_util.tree_map(lambda x: np.array(x), template["batch_stats"])
    for key, val in state_dict.items():
        parts = key.split(".")
        if parts[0] in ("fc", "AuxLogits"):
            continue
        *scope, leaf = parts
        # torch: Mixed_5b.branch1x1.conv.weight -> flax params[Mixed_5b][branch1x1][conv][kernel]
        v = t2n(val)
        node = params
        snode = stats
        ok = True
        for s in scope[:-1]:
            if s not in node:
                ok = False
                break
            node = node[s]
            snode = snode.get(s, {}) if isinstance(snode, dict) else {}
        if not ok:
            continue
        mod = scope[-1]
        if mod == "conv" and leaf == "weight":
            node["conv"]["kernel"][...] = v.transpose(2, 3, 1, 0)
        elif mod == "bn" and leaf == "weight":
            node["bn"]["scale"][...] = v
        elif mod == "bn" and leaf == "bias":
            node["bn"]["bias"][...] = v
        elif mod == "bn" and leaf == "running_mean":
            snode["bn"]["mean"][...] = v
        elif mod == "bn" and leaf == "running_var":
            snode["bn"]["var"][...] = v
    return {"params": params, "batch_stats": stats}


def fid_weights_path(weights_path: Optional[str] = None) -> Optional[str]:
    """Resolve the pt_inception weights file (reference
    metrics/inception.py:17's FID_WEIGHTS_URL payload, converted via
    convert_pt_inception_weights), or None -> random-init FID."""
    if weights_path and os.path.exists(weights_path):
        return weights_path
    for root in (os.getcwd(), os.path.expanduser("~/.cache/soft_intro_vae_tpu")):
        cand = os.path.join(root, FID_WEIGHTS_FILENAME)
        if os.path.exists(cand):
            return cand
    return None


def _calibrate_random_init(model: "InceptionV3FID", variables: dict) -> dict:
    """Make the random-init fallback's features non-degenerate.

    With default-init BN (running mean 0 / var 1, i.e. identity at eval) the
    activations die through the ~90-conv depth: measured pool3 std ~1e-5 and
    FID unable to separate clearly different distributions. One pass in
    calibrate mode (normalize by BATCH stats) keeps every layer O(1); the
    batch statistics it measured are recovered exactly from the
    momentum-blended running stats (ra' = m*ra + (1-m)*batch, m=0.9) and
    installed as the running stats, so eval mode reproduces the healthy
    normalized propagation. Deterministic (fixed key) => self-consistent."""
    calib = InceptionV3FID(resize_input=model.resize_input, calibrate=True)
    size = 64 if model.resize_input else 299
    x = jax.random.uniform(jax.random.key(1), (32, size, size, 3))
    _, upd = calib.apply(variables, x, mutable=["batch_stats"])
    batch = jax.tree_util.tree_map(
        lambda new, old: (new - 0.9 * old) / 0.1,
        upd["batch_stats"], variables["batch_stats"])
    return {**variables, "batch_stats": batch}


# (resolved weights path, resize_input) -> (apply_fn, variables). The
# Inception init alone costs ~60s of compile on a 1-core host and every
# trainer/eval entry point calls load_fid_network — memoize per process.
# variables are immutable device arrays, safe to share; a weights file
# appearing mid-process needs a new process (or _FID_NETWORK_CACHE.clear()).
_FID_NETWORK_CACHE: dict = {}


def load_fid_network(weights_path: Optional[str] = None, resize_input: bool = True):
    """Returns (apply_fn, variables). apply_fn(x_nhwc_01) -> (B, 2048)."""
    cache_key = (fid_weights_path(weights_path), resize_input)
    if cache_key in _FID_NETWORK_CACHE:
        return _FID_NETWORK_CACHE[cache_key]
    model = InceptionV3FID(resize_input=resize_input)
    dummy = jnp.zeros((1, 299 if not resize_input else 64, 299 if not resize_input else 64, 3))
    variables = model.init(jax.random.key(0), dummy)
    path = fid_weights_path(weights_path)
    if path and os.path.exists(path):
        import torch

        sd = torch.load(path, map_location="cpu")
        variables = params_from_torch_state_dict(sd, variables)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
    else:
        warnings.warn(
            "FID inception weights not found — using deterministic random "
            "init with BN-calibrated stats. FID values are self-consistent "
            "but NOT comparable to published numbers. Provide "
            f"{FID_WEIGHTS_FILENAME} for parity.")
        variables = _calibrate_random_init(model, variables)

    # jit ONCE here: the streaming-stats helper used to re-wrap its argument
    # in jax.jit per call, paying a fresh Inception trace+compile on every
    # FID evaluation (same bug class as make_training_fid's decode path)
    apply_fn = jax.jit(lambda x: model.apply(variables, x))

    _FID_NETWORK_CACHE[cache_key] = (apply_fn, variables)
    return apply_fn, variables


# --------------------------------------------------------------- distance ---
def sqrtm_newton_schulz(a: Array, iters: int = 30) -> Array:
    """Matrix square root via Newton–Schulz — matmul-only (MXU-friendly)."""
    a = a.astype(jnp.float64) if jax.config.jax_enable_x64 else a.astype(jnp.float32)
    dim = a.shape[0]
    norm = jnp.linalg.norm(a)
    y = a / norm
    z = jnp.eye(dim, dtype=a.dtype)
    eye3 = 3.0 * jnp.eye(dim, dtype=a.dtype)

    def body(_, yz):
        y, z = yz
        t = 0.5 * (eye3 - z @ y)
        return (y @ t, t @ z)

    y, _ = jax.lax.fori_loop(0, iters, body, (y, z))
    return y * jnp.sqrt(norm)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6, method: str = "newton") -> float:
    """d^2 = |mu1-mu2|^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)) (fid_score.py:274-325)."""
    mu1, mu2 = np.asarray(mu1), np.asarray(mu2)
    sigma1, sigma2 = np.asarray(sigma1), np.asarray(sigma2)
    diff = mu1 - mu2
    if method == "scipy":
        from scipy import linalg

        covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
        if not np.isfinite(covmean).all():
            offset = np.eye(sigma1.shape[0]) * eps
            covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
        if np.iscomplexobj(covmean):
            covmean = covmean.real
        tr_covmean = np.trace(covmean)
    else:
        offset = np.eye(sigma1.shape[0], dtype=np.float32) * eps
        prod = jnp.asarray((sigma1 + offset) @ (sigma2 + offset), jnp.float32)
        tr_covmean = float(jnp.trace(sqrtm_newton_schulz(prod)))
        if not np.isfinite(tr_covmean):
            # f32 Newton–Schulz can diverge on nearly singular products
            # (few-sample covariances, rank << dim); fall back to the
            # reference's host scipy path (fid_score.py:307-313)
            return frechet_distance(mu1, sigma1, mu2, sigma2, eps, method="scipy")
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2.0 * tr_covmean)


def compute_statistics_streaming(apply_fn: Callable, batches: Iterable[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    """One-pass mean/covariance of pool3 activations over an iterable of
    NHWC [0,1] batches. Forward jitted; accumulation in float64 on host.

    apply_fn is used as-is when it is already a jitted callable (the
    load_fid_network path) so repeated FID evaluations share ONE compiled
    Inception executable; plain callables are jitted here once per call."""
    fwd = apply_fn if isinstance(apply_fn, jax.stages.Wrapped) else jax.jit(apply_fn)
    # uint8-storage datasets (data/images.py): normalize via the same
    # 256-entry LUT gather as prefetch.normalizing_put_fn — bit-exact vs host
    # numpy /255.0 on every backend (device f32 division is reciprocal-based
    # and can be 1 ULP off)
    lut = np.arange(256, dtype=np.float32) / 255.0
    u8_cast = jax.jit(lambda u: jnp.asarray(lut)[u.astype(jnp.int32)])
    n = 0
    s = None
    ss = None
    for b in batches:
        x = jnp.asarray(b)
        if x.dtype == jnp.uint8:
            x = u8_cast(x)
        a = np.asarray(fwd(x), np.float64)
        if s is None:
            s = a.sum(0)
            ss = a.T @ a
        else:
            s += a.sum(0)
            ss += a.T @ a
        n += a.shape[0]
    if n < 2:
        raise ValueError("need at least 2 samples for covariance")
    mu = s / n
    cov = (ss - n * np.outer(mu, mu)) / (n - 1)
    return mu, cov


def fid_between_batches(apply_fn, real_batches, fake_batches, method: str = "newton") -> float:
    mu1, s1 = compute_statistics_streaming(apply_fn, real_batches)
    mu2, s2 = compute_statistics_streaming(apply_fn, fake_batches)
    return frechet_distance(mu1, s1, mu2, s2, method=method)


# ------------------------------------------------ trainer integration hook ---
def make_training_fid(dec, spec, cfg, weights_path: Optional[str] = None):
    """FID hook for the image trainer: real stats from the dataset once,
    fake stats from decoder samples each call (fid cadence: reference
    train_soft_intro_vae.py:472-487). Samples are clipped and uint8
    round-tripped like get_activations_generate (fid_score.py:244-257)."""
    import jax.random as jr

    apply_fn, _ = load_fid_network(weights_path)
    state_cache = {}
    # eval-mode sampling reads the BN RUNNING stats (reference model.eval()
    # semantics, fid_score.py:249): thread state.stats_d into the apply.
    # Jitted ONCE here — a per-call jit wrapper would recompile every eval.
    decode = jax.jit(lambda p, s, z: dec.apply(
        {"params": p, "batch_stats": s}, z, train=False))

    def fid_fn(state, dataset=None, num_images: int = 2048, batch_size: int = 64):
        if "real" not in state_cache:
            if dataset is None:
                raise ValueError("first FID call needs the dataset")
            def real_iter():
                seen = 0
                for b in dataset.epoch(batch_size, shuffle=False):
                    if seen >= num_images:
                        break
                    seen += b.shape[0]
                    yield b
            state_cache["real"] = compute_statistics_streaming(apply_fn, real_iter())
        mu1, s1 = state_cache["real"]

        def fake_iter():
            made = 0
            i = 0
            while made < num_images:
                k = jr.fold_in(state.rng, 555 + i)
                z = jr.normal(k, (batch_size, cfg.z_dim), jnp.float32)
                x = decode(state.params_d, state.stats_d, z)
                x = jnp.clip(x, 0.0, 1.0)
                x = jnp.round(x * 255.0) / 255.0  # uint8 round-trip parity
                made += batch_size
                i += 1
                yield np.asarray(x)
        mu2, s2 = compute_statistics_streaming(apply_fn, fake_iter())
        return frechet_distance(mu1, s1, mu2, s2)

    return fid_fn
