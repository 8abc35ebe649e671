"""Full-network FID Inception activation parity vs a torch twin.

The environment has zero egress, so the real pt_inception weights
(reference metrics/inception.py:17) cannot be downloaded. This test is the
next-best evidence (VERDICT round-1, next-round item 1): a pure-torch twin of
the pt_inception topology — same module naming as the published .pth, same
FID patches (count_include_pad=False avg pools; Mixed_7c max-pool branch,
inception.py:209-330) — is random-initialized, its ``state_dict()`` is pushed
through the SAME converter that would load the real weights
(metrics/fid.py params_from_torch_state_dict), and pool3 activations must
agree to <= 1e-3 max-abs. The day a real .pth is available, nothing changes
but the file path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from soft_intro_vae_tpu.metrics.fid import InceptionV3FID, params_from_torch_state_dict

pytestmark = pytest.mark.slow  # full 299x299 Inception compile


class TBasicConv2d(nn.Module):
    def __init__(self, in_ch, out_ch, **kw):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, bias=False, **kw)
        self.bn = nn.BatchNorm2d(out_ch, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avgp(x):  # the FID patch: count_include_pad=False
    return F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)


class TInceptionA(nn.Module):
    def __init__(self, in_ch, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv2d(in_ch, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv2d(in_ch, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(_avgp(x))
        return torch.cat([b1, b5, bd, bp], 1)


class TInceptionB(nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3 = TBasicConv2d(in_ch, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, 2)], 1)


class TInceptionC(nn.Module):
    def __init__(self, in_ch, c7):
        super().__init__()
        self.branch1x1 = TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TBasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = TBasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(_avgp(x))
        return torch.cat([b1, b7, bd, bp], 1)


class TInceptionD(nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3_1 = TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, 2)], 1)


class TInceptionE(nn.Module):
    def __init__(self, in_ch, pool_kind):
        super().__init__()
        self.pool_kind = pool_kind
        self.branch1x1 = TBasicConv2d(in_ch, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv2d(in_ch, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = TBasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv2d(in_ch, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = TBasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool_kind == "max":  # FIDInceptionE_2 patch (inception.py:322-327)
            bp = F.max_pool2d(x, 3, 1, 1)
        else:
            bp = _avgp(x)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b3, bd, bp], 1)


class TInceptionV3FID(nn.Module):
    """pt_inception twin: exact module naming of the published state dict."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, "avg")
        self.Mixed_7c = TInceptionE(2048, "max")

    def forward(self, x, resize=True):
        # inception.py:145-154: bilinear 299 resize, then (0,1) -> (-1,1)
        if resize:
            x = F.interpolate(x, size=(299, 299), mode="bilinear", align_corners=False)
        x = 2.0 * x - 1.0
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, 2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                     "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
                     "Mixed_7c"):
            x = getattr(self, name)(x)
        return F.adaptive_avg_pool2d(x, 1).flatten(1)  # pool3 (B, 2048)

    def forward_taps(self, x):
        """The reference wrapper's 4 block taps (inception.py:88-130,155-162):
        maxpool1, maxpool2, Mixed_6e, pool3. Input pre-resized, in [0,1]."""
        x = 2.0 * x - 1.0
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, 2)
        t0 = x
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, 2)
        t1 = x
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                     "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            x = getattr(self, name)(x)
        t2 = x
        for name in ("Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        t3 = F.adaptive_avg_pool2d(x, 1).flatten(1)
        return t0, t1, t2, t3


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.Conv2d):
                fan_in = m.weight.shape[1] * m.weight.shape[2] * m.weight.shape[3]
                m.weight.normal_(0, fan_in ** -0.5, generator=g)
            elif isinstance(m, nn.BatchNorm2d):
                m.weight.uniform_(0.8, 1.2, generator=g)
                m.bias.normal_(0, 0.1, generator=g)
                m.running_mean.normal_(0, 0.1, generator=g)
                m.running_var.uniform_(0.8, 1.2, generator=g)


@pytest.fixture(scope="module")
def twin_and_variables():
    twin = TInceptionV3FID().eval()
    _randomize(twin, 77)
    model = InceptionV3FID(resize_input=False)
    template = model.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3)))
    variables = params_from_torch_state_dict(twin.state_dict(), template)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    return twin, model, variables


class TestFullInceptionParity:
    def test_pool3_parity_299(self, twin_and_variables):
        """Identical weights, identical 299x299 input -> pool3 <= 1e-3 max-abs."""
        twin, model, variables = twin_and_variables
        x = np.random.RandomState(78).rand(2, 299, 299, 3).astype(np.float32)
        with torch.no_grad():
            y_t = twin(torch.tensor(x.transpose(0, 3, 1, 2)), resize=False).numpy()
        y_j = np.asarray(model.apply(variables, jnp.asarray(x)))
        assert np.isfinite(y_j).all()
        err = np.abs(y_j - y_t).max()
        assert err <= 1e-3, f"pool3 max-abs err {err}"

    def test_pool3_parity_with_resize(self, twin_and_variables):
        """The training-time path: 32x32 input resized to 299 inside both nets."""
        twin, _, variables = twin_and_variables
        model = InceptionV3FID(resize_input=True)
        x = np.random.RandomState(79).rand(2, 32, 32, 3).astype(np.float32)
        with torch.no_grad():
            y_t = twin(torch.tensor(x.transpose(0, 3, 1, 2)), resize=True).numpy()
        y_j = np.asarray(model.apply(variables, jnp.asarray(x)))
        err = np.abs(y_j - y_t).max()
        assert err <= 2e-3, f"pool3 (resized input) max-abs err {err}"

    def test_frechet_on_parity_activations(self, twin_and_variables):
        """FID computed from the two frameworks' activations of the SAME
        images agrees to float tolerance — the full-pipeline statement."""
        twin, model, variables = twin_and_variables
        from soft_intro_vae_tpu.metrics.fid import frechet_distance

        rs = np.random.RandomState(80)
        a = rs.rand(8, 299, 299, 3).astype(np.float32)
        b = np.clip(a + 0.05 * rs.randn(*a.shape).astype(np.float32), 0, 1)

        def stats_j(x):
            act = np.asarray(model.apply(variables, jnp.asarray(x)))
            return act.mean(0), np.cov(act, rowvar=False)

        def stats_t(x):
            with torch.no_grad():
                act = twin(torch.tensor(x.transpose(0, 3, 1, 2)), resize=False).numpy()
            return act.mean(0), np.cov(act, rowvar=False)

        mu_aj, s_aj = stats_j(a)
        mu_bj, s_bj = stats_j(b)
        mu_at, s_at = stats_t(a)
        mu_bt, s_bt = stats_t(b)
        fid_j = frechet_distance(mu_aj, s_aj, mu_bj, s_bj, method="scipy")
        fid_t = frechet_distance(mu_at, s_at, mu_bt, s_bt, method="scipy")
        assert fid_j == pytest.approx(fid_t, rel=5e-3, abs=5e-3)

    def test_multiblock_tap_parity(self, twin_and_variables):
        """All 4 reference tap points (inception.py:28-33): dims 64/192/768
        feature maps and the 2048 pool3 vector, same weights, <= 1e-3."""
        twin, _, variables = twin_and_variables
        model = InceptionV3FID(resize_input=False, output_blocks=(0, 1, 2, 3))
        x = np.random.RandomState(81).rand(2, 299, 299, 3).astype(np.float32)
        with torch.no_grad():
            t_taps = twin.forward_taps(torch.tensor(x.transpose(0, 3, 1, 2)))
        j_taps = model.apply(variables, jnp.asarray(x))
        assert len(j_taps) == 4
        for i, (tj, tt) in enumerate(zip(j_taps, t_taps)):
            tt = tt.numpy()
            tj = np.asarray(tj)
            if tj.ndim == 4:  # NHWC feature map vs torch NCHW
                tj = tj.transpose(0, 3, 1, 2)
            assert tj.shape == tt.shape, (i, tj.shape, tt.shape)
            err = np.abs(tj - tt).max()
            assert err <= 1e-3, f"block {i} max-abs err {err}"
