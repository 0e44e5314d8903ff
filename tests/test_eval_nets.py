"""Golden tests for the rFID Inception-V3 and LPIPS-VGG16 feature nets.

torchvision is not installed in this sandbox, so each test builds a torch
replica of the canonical architecture (transcribed from the torchvision /
richzhang-lpips sources, with pytorch-fid's pooling tweaks) with RANDOM
weights, exports its state dict under the canonical names, ingests it
through the production converters, and compares outputs. This pins the conv
/ batchnorm / pooling numerics, the NCHW->NHWC weight conversion, padding
semantics, and the state-dict naming contract — everything except the
pretrained values themselves (no weights ship in this sandbox).
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from selftoktokenizer_tpu.eval.inception import (
    inception_from_state_dict, inception_pool3)
from selftoktokenizer_tpu.eval.lpips import (
    lpips_distance, lpips_from_state_dict, vgg_features)


# ---------------------------------------------------------------------------
# torch Inception-V3 replica (torchvision layout + pytorch-fid tweaks)
# ---------------------------------------------------------------------------

class BasicConv2d(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg(x):  # FID variant: count_include_pad=False
    return F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)


class IncA(nn.Module):
    def __init__(self, cin, pool):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(cin, pool, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x), self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avg(x))], 1)


class IncB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, 2)], 1)


class IncC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avg(x))], 1)


class IncD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, 2)], 1)


class IncE(nn.Module):
    def __init__(self, cin, pool_mode="avg"):
        super().__init__()
        self.pool_mode = pool_mode
        self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        pool = (F.max_pool2d(x, 3, 1, 1) if self.pool_mode == "max"
                else _avg(x))
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(pool)], 1)


class TorchFIDInception(nn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = IncA(192, 32)
        self.Mixed_5c = IncA(256, 64)
        self.Mixed_5d = IncA(288, 64)
        self.Mixed_6a = IncB(288)
        self.Mixed_6b = IncC(768, 128)
        self.Mixed_6c = IncC(768, 160)
        self.Mixed_6d = IncC(768, 160)
        self.Mixed_6e = IncC(768, 192)
        self.Mixed_7a = IncD(768)
        self.Mixed_7b = IncE(1280)
        self.Mixed_7c = IncE(2048, pool_mode="max")

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, 2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return F.adaptive_avg_pool2d(x, 1).flatten(1)


def _randomize_bn(m, gen):
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.normal_(0, 0.1, generator=gen)
                mod.running_var.uniform_(0.5, 1.5, generator=gen)
                mod.weight.normal_(1.0, 0.1, generator=gen)
                mod.bias.normal_(0, 0.1, generator=gen)


def test_inception_pool3_matches_torch_replica():
    torch.manual_seed(0)
    m = TorchFIDInception().eval()
    _randomize_bn(m, torch.Generator().manual_seed(1))
    params = inception_from_state_dict(m.state_dict())

    x = np.random.default_rng(0).uniform(0, 1, (2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(
            2.0 * x.transpose(0, 3, 1, 2) - 1.0)).numpy()
    got = np.asarray(inception_pool3(params, jnp.asarray(x), resize=False))
    assert got.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_inception_resize_to_299():
    """resize path produces the canonical 299 input and finite features."""
    torch.manual_seed(2)
    m = TorchFIDInception().eval()
    params = inception_from_state_dict(m.state_dict())
    x = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (1, 64, 64, 3)).astype(np.float32))
    f = np.asarray(inception_pool3(params, x, resize=True))
    assert f.shape == (1, 2048) and np.all(np.isfinite(f))


# ---------------------------------------------------------------------------
# torch LPIPS replica (richzhang layout)
# ---------------------------------------------------------------------------

_VGG_CFG = [(0, 3, 64), (2, 64, 64), "M", (5, 64, 128), (7, 128, 128), "M",
            (10, 128, 256), (12, 256, 256), (14, 256, 256), "M",
            (17, 256, 512), (19, 512, 512), (21, 512, 512), "M",
            (24, 512, 512), (26, 512, 512), (28, 512, 512)]
_SLICES = [(1, 0, 3), (2, 4, 8), (3, 9, 15), (4, 16, 22), (5, 23, 29)]


class TorchLPIPS(nn.Module):
    def __init__(self):
        super().__init__()
        convs = {}
        for item in _VGG_CFG:
            if item == "M":
                continue
            idx, cin, cout = item
            convs[idx] = nn.Conv2d(cin, cout, 3, padding=1)
        self.net = nn.Module()
        for s, lo, hi in _SLICES:
            sl = nn.Sequential()
            for idx in range(lo, hi + 1):
                if idx in convs:
                    sl.add_module(str(idx), convs[idx])
            setattr(self.net, f"slice{s}", sl)
        for i, ch in enumerate((64, 128, 256, 512, 512)):
            lin = nn.Sequential(nn.Dropout(), nn.Conv2d(ch, 1, 1, bias=False))
            with torch.no_grad():
                lin[1].weight.abs_()
            setattr(self, f"lin{i}", nn.Module())
            getattr(self, f"lin{i}").model = lin

    def features(self, x):
        feats, taps = [], {2, 7, 14, 21, 28}
        i = 0
        for item in _VGG_CFG:
            if item == "M":
                x = F.max_pool2d(x, 2, 2)
            else:
                idx, _, _ = item
                conv = getattr(getattr(self.net, f"slice{_slice_of(idx)}"),
                               str(idx))
                x = F.relu(conv(x))
                if idx in taps:
                    feats.append(x)
        return feats

    def forward(self, a, b):
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

        def prep(x):
            return (x - shift) / scale
        fa, fb = self.features(prep(a)), self.features(prep(b))
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / (xa.norm(dim=1, keepdim=True) + 1e-10)
            nb = xb / (xb.norm(dim=1, keepdim=True) + 1e-10)
            d = (na - nb) ** 2
            lin = getattr(self, f"lin{i}").model[1]
            total = total + lin(d).mean(dim=(2, 3)).squeeze(1)
        return total


def _slice_of(idx):
    for s, lo, hi in _SLICES:
        if lo <= idx <= hi:
            return s
    raise ValueError(idx)


def _pos_in_slice(idx):
    return str(idx)


def test_lpips_matches_torch_replica():
    torch.manual_seed(3)
    m = TorchLPIPS().eval()
    params = lpips_from_state_dict(m.state_dict())

    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape).astype(np.float32),
                0, 1)
    with torch.no_grad():
        want = m(torch.from_numpy(2 * a.transpose(0, 3, 1, 2) - 1),
                 torch.from_numpy(2 * b.transpose(0, 3, 1, 2) - 1)).numpy()
    got = np.asarray(lpips_distance(params, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
    # identity -> 0, perturbed > 0
    same = np.asarray(lpips_distance(params, jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(same, 0.0, atol=1e-7)
    assert np.all(got > 0)


def test_vgg_feature_shapes():
    params = lpips_from_state_dict(TorchLPIPS().state_dict())
    x = jnp.zeros((1, 64, 64, 3))
    feats = vgg_features(params, x)
    assert [f.shape for f in feats] == [
        (1, 64, 64, 64), (1, 32, 32, 128), (1, 16, 16, 256),
        (1, 8, 8, 512), (1, 4, 4, 512)]
