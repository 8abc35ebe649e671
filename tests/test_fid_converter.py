"""Structural test of the pt-inception .pth converter (no weights file needed):
build a torch-style state dict with pytorch-fid naming and random values,
convert, and verify every conv/bn leaf landed (non-zero deltas vs init)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from soft_intro_vae_tpu.metrics.fid import InceptionV3FID, params_from_torch_state_dict


def _torch_like_state_dict(template) -> dict:
    """Fabricate a state dict with pytorch-fid naming from the flax template."""
    sd = {}
    rs = np.random.RandomState(0)

    def walk(params, stats, prefix):
        for name, node in params.items():
            path = f"{prefix}{name}" if not prefix else f"{prefix}.{name}"
            if name == "conv" and "kernel" in node:
                k = np.asarray(node["kernel"])
                sd[path + ".weight"] = torch.tensor(
                    rs.randn(*k.transpose(3, 2, 0, 1).shape).astype(np.float32) * 0.05)
            elif name == "bn" and "scale" in node:
                c = node["scale"].shape[0]
                sd[path + ".weight"] = torch.tensor(rs.rand(c).astype(np.float32) + 0.5)
                sd[path + ".bias"] = torch.tensor(rs.randn(c).astype(np.float32) * 0.1)
                sd[path + ".running_mean"] = torch.tensor(rs.randn(c).astype(np.float32) * 0.1)
                sd[path + ".running_var"] = torch.tensor(rs.rand(c).astype(np.float32) + 0.5)
            elif isinstance(node, dict):
                walk(node, stats.get(name, {}) if isinstance(stats, dict) else {}, path)

    walk(template["params"], template["batch_stats"], "")
    return sd


def test_converter_fills_every_leaf():
    model = InceptionV3FID()
    template = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    sd = _torch_like_state_dict(template)
    assert len(sd) > 400  # 96 convs + bn affine/stats

    converted = params_from_torch_state_dict(sd, template)
    # every conv kernel and bn stat must differ from the template init
    n_changed = 0
    n_total = 0
    flat_t = jax.tree_util.tree_leaves_with_path(template)
    flat_c = jax.tree_util.tree_leaves_with_path(converted)
    for (pt, lt), (pc, lc) in zip(flat_t, flat_c):
        n_total += 1
        if not np.allclose(np.asarray(lt), np.asarray(lc)):
            n_changed += 1
    assert n_changed / n_total > 0.99, (n_changed, n_total)

    # the converted net still runs and yields 2048-d features
    converted = jax.tree_util.tree_map(jnp.asarray, converted)
    out = model.apply(converted, jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 2048)
    assert bool(jnp.isfinite(out).all())


def test_fc_and_aux_keys_ignored():
    model = InceptionV3FID()
    template = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    sd = _torch_like_state_dict(template)
    sd["fc.weight"] = torch.zeros(1008, 2048)
    sd["fc.bias"] = torch.zeros(1008)
    sd["AuxLogits.conv0.conv.weight"] = torch.zeros(128, 768, 1, 1)
    converted = params_from_torch_state_dict(sd, template)  # must not raise
    assert "fc" not in converted["params"]
