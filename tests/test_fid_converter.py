"""Structural test of the pt-inception .pth converter (no weights file needed):
build a torch-style state dict with pytorch-fid naming and random values,
convert, and verify every conv/bn leaf landed (non-zero deltas vs init)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from soft_intro_vae_tpu.metrics.fid import InceptionV3FID, params_from_torch_state_dict


def _zeros_template():
    """Zero-filled variables with the real structure, via eval_shape — the
    full Inception init compile costs ~60s on this 1-core host and the
    converter only needs structure + shapes. The converted net's forward is
    covered by tests/test_fid_full_parity.py and the test_fid end-to-end."""
    model = InceptionV3FID()
    shapes = jax.eval_shape(model.init, jax.random.key(0),
                            jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32))
    return jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), shapes)


def _torch_like_state_dict(template) -> dict:
    """Fabricate a state dict with pytorch-fid naming from the flax template."""
    sd = {}
    rs = np.random.RandomState(0)

    def walk(params, stats, prefix):
        for name, node in params.items():
            path = f"{prefix}{name}" if not prefix else f"{prefix}.{name}"
            if name == "conv" and "kernel" in node:
                h, w, i, o = node["kernel"].shape
                sd[path + ".weight"] = torch.tensor(
                    rs.randn(o, i, h, w).astype(np.float32) * 0.05)
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
    template = _zeros_template()
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

    # spot-check exact values landed where they should (stronger than the
    # old != check): first conv kernel is the OIHW->HWIO transpose of the sd
    k = np.asarray(converted["params"]["Conv2d_1a_3x3"]["conv"]["kernel"])
    w = sd["Conv2d_1a_3x3.conv.weight"].numpy()
    np.testing.assert_array_equal(k, w.transpose(2, 3, 1, 0))
    m = np.asarray(converted["batch_stats"]["Conv2d_1a_3x3"]["bn"]["mean"])
    np.testing.assert_array_equal(m, sd["Conv2d_1a_3x3.conv.bn.running_mean"].numpy()
                                  if "Conv2d_1a_3x3.conv.bn.running_mean" in sd
                                  else sd["Conv2d_1a_3x3.bn.running_mean"].numpy())


def test_fc_and_aux_keys_ignored():
    template = _zeros_template()
    sd = _torch_like_state_dict(template)
    sd["fc.weight"] = torch.zeros(1008, 2048)
    sd["fc.bias"] = torch.zeros(1008)
    sd["AuxLogits.conv0.conv.weight"] = torch.zeros(128, 768, 1, 1)
    converted = params_from_torch_state_dict(sd, template)  # must not raise
    assert "fc" not in converted["params"]
