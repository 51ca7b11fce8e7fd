"""Round-trip validation of the torch→Flax weight converters (VERDICT r1
item 8): build torchvision-compatible torch models with RANDOM weights,
save their state dicts, convert, and assert the Flax forward matches the
torch forward. torchvision itself is not installed in this environment, so
the torch side is built here with torchvision's exact module/key layout
(resnet18 / alexnet.features); this pins the conversion logic — layouts,
transposes, BN statistics, padding, pooling — which is where converter
bugs live.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pose_splatter_tpu.models.resnet import ResNet18, load_torch_state_dict  # noqa: E402
from pose_splatter_tpu.ops.lpips import AlexNetFeatures, load_weights  # noqa: E402


# ----------------------------------------------------------------------------
# torchvision-compatible torch models (state-dict keys match torchvision).
# ----------------------------------------------------------------------------

class TorchBasicBlock(tnn.Module):
    def __init__(self, inp, out, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, out, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(out)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(out, out, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out)
        self.downsample = None
        if stride != 1 or inp != out:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, out, 1, stride, bias=False),
                tnn.BatchNorm2d(out),
            )

    def forward(self, x):
        idt = x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(y + idt)


class TorchResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        feats = [64, 128, 256, 512]
        inp = 64
        for s, f in enumerate(feats):
            stride = 1 if s == 0 else 2
            setattr(self, f"layer{s + 1}", tnn.Sequential(
                TorchBasicBlock(inp, f, stride), TorchBasicBlock(f, f)))
            inp = f

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
        return x.mean(dim=(2, 3))  # adaptive avg pool 1x1 + flatten


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)


class TestResNet18Converter:
    def test_forward_matches_torch(self, tmp_path):
        tm = TorchResNet18()
        _randomize(tm, 0)
        tm.eval()
        path = str(tmp_path / "resnet18.pth")
        torch.save(tm.state_dict(), path)

        variables = load_torch_state_dict(path)
        model = ResNet18()

        rng = np.random.default_rng(1)
        x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


class TestLPIPSConverter:
    def test_alexnet_features_match_torch(self, tmp_path):
        feats = tnn.Sequential(
            tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(True),
            tnn.MaxPool2d(3, 2),
            tnn.Conv2d(64, 192, 5, 1, 2), tnn.ReLU(True),
            tnn.MaxPool2d(3, 2),
            tnn.Conv2d(192, 384, 3, 1, 1), tnn.ReLU(True),
            tnn.Conv2d(384, 256, 3, 1, 1), tnn.ReLU(True),
            tnn.Conv2d(256, 256, 3, 1, 1), tnn.ReLU(True),
        )
        alex = tnn.Module()
        alex.features = feats
        _randomize(alex, 2)
        torch.save(alex.state_dict(), tmp_path / "alexnet.pth")

        # lpips-package-shaped linear heads.
        lin_sd = {}
        g = torch.Generator().manual_seed(3)
        chans = [64, 192, 384, 256, 256]
        for i, c in enumerate(chans):
            lin_sd[f"lin{i}.model.1.weight"] = torch.rand(
                (1, c, 1, 1), generator=g)
        torch.save(lin_sd, tmp_path / "lpips_alex.pth")

        weights = load_weights(str(tmp_path))
        model = AlexNetFeatures()

        rng = np.random.default_rng(4)
        x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
        taps = model.apply({"params": weights["params"]}, jnp.asarray(x))

        with torch.no_grad():
            t = torch.tensor(x.transpose(0, 3, 1, 2))
            ref_taps = []
            for i, m in enumerate(feats):
                t = m(t)
                if isinstance(m, tnn.ReLU):
                    ref_taps.append(t.numpy())
        assert len(taps) == len(ref_taps) == 5
        for a, b in zip(taps, ref_taps):
            np.testing.assert_allclose(
                np.asarray(a), b.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-3)
        for i, c in enumerate(chans):
            assert weights["lins"][i].shape == (c,)
