"""Weight-import parity: build the REFERENCE PyTorch model with random weights,
import its state_dict into our flax model, and compare forward outputs
numerically. This is the strongest correctness evidence for the module zoo,
the YAML compiler, and the importer at once.

The reference tree lacks torchvision in this image; its modules only need it
at module-import time, so we stub it (no reference code paths that use it run
in these tests)."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout unavailable")

torch = pytest.importorskip("torch")


def _stub_torchvision():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.0.0-stub"
    for sub in ("models", "ops", "transforms", "transforms.functional", "ops.boxes", "datasets"):
        m = types.ModuleType(f"torchvision.{sub}")
        parent, _, child = sub.rpartition(".")
        setattr(sys.modules.get(f"torchvision.{parent}", tv) if parent else tv, child, m)
        sys.modules[f"torchvision.{sub}"] = m
    tv.datasets.ImageFolder = type("ImageFolder", (), {"__init__": lambda self, *a, **k: None})
    sys.modules["torchvision"] = tv
    if "pkg_resources" not in sys.modules:  # removed in modern setuptools
        pr = types.ModuleType("pkg_resources")
        from packaging.version import parse as _parse
        pr.parse_version = _parse
        sys.modules["pkg_resources"] = pr


def _reference_models():
    _stub_torchvision()
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    from models.yolo import DetectionModel, SegmentationModel  # noqa
    return DetectionModel, SegmentationModel


ANCHORS = [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119], [116, 90, 156, 198, 373, 326]]


def tiny_cfg(segment: bool, extra=()):
    head_row = ([[17, 20, 23], 1, "Segment", ["nc", "anchors", 8, 16]] if segment
                else [[17, 20, 23], 1, "Detect", ["nc", "anchors"]])
    return dict(
        nc=4, depth_multiple=1.0, width_multiple=1.0, anchors=[list(a) for a in ANCHORS],
        backbone=[
            [-1, 1, "Conv", [16, 6, 2, 2]],
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "C3", [16]],
            [-1, 1, "Conv", [24, 3, 2]],
            [-1, 2, "C3", [24]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "C3", [32]],
            [-1, 1, "Conv", [40, 3, 2]],
            [-1, 1, "C3", [40]],
            [-1, 1, "SPPF", [40, 5]],
        ],
        head=[
            [-1, 1, "Conv", [24, 1, 1]],
            [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
            [[-1, 6], 1, "Concat", [1]],
            [-1, 1, "C3", [24, False]],
            [-1, 1, "Conv", [16, 1, 1]],
            [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
            [[-1, 4], 1, "Concat", [1]],
            [-1, 1, "C3", [16, False]],
            [-1, 1, "Conv", [16, 3, 2]],
            [[-1, 14], 1, "Concat", [1]],
            [-1, 1, "C3", [24, False]],
            [-1, 1, "Conv", [24, 3, 2]],
            [[-1, 10], 1, "Concat", [1]],
            [-1, 1, "C3", [40, False]],
            head_row,
        ],
    )


def _torch_cfg(cfg):
    """The reference parse_model evals bare module names, so rows carry
    plain strings; deep-copy because it mutates args in place."""
    import copy
    c = copy.deepcopy(cfg)
    for row in c["backbone"] + c["head"]:
        if row[2] == "nn.Upsample":
            row[3] = [None, 2, "nearest"]
    return c


@pytest.mark.parametrize("segment", [False, True], ids=["detect", "segment"])
def test_forward_parity_tiny_yolo(segment):
    DetectionModel, SegmentationModel = _reference_models()
    torch.manual_seed(0)
    cfg = tiny_cfg(segment)
    ref = (SegmentationModel if segment else DetectionModel)(_torch_cfg(cfg), ch=3, nc=4)
    ref = ref.float().eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from yolo_dual_tpu.models.model import SegmentationModel as Ours_S, DetectionModel as Ours_D
    from yolo_dual_tpu.io import import_torch_state_dict

    ours = (Ours_S if segment else Ours_D)(cfg, nc=4)
    variables = ours.init(imgsz=64, bias_prior=False)
    variables = import_torch_state_dict(variables, sd, spec=ours.spec, strict=True)

    x = np.random.default_rng(1).uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x))
    our_out = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)

    if segment:
        ref_pred, ref_proto, _ = ref_out
        pred, proto, _ = our_out
        np.testing.assert_allclose(np.asarray(proto).transpose(0, 3, 1, 2),
                                   ref_proto.numpy(), rtol=2e-4, atol=2e-4)
    else:
        ref_pred, _ = ref_out
        pred, _ = our_out
    np.testing.assert_allclose(np.asarray(pred), ref_pred.numpy(), rtol=2e-4, atol=5e-3)


def test_tta_forward_augment_parity():
    """TTA parity: our forward_augment (scales 1/0.83/0.67 + lr flip, descale,
    tail clip) vs the live reference _forward_augment (models/yolo.py:206-235)
    on a tiny detect model with imported weights."""
    DetectionModel, _ = _reference_models()
    torch.manual_seed(0)
    cfg = tiny_cfg(False)
    ref = DetectionModel(_torch_cfg(cfg), ch=3, nc=4).float().eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from yolo_dual_tpu.io import import_torch_state_dict
    from yolo_dual_tpu.models.model import DetectionModel as Ours, forward_augment

    ours = Ours(cfg, nc=4)
    variables = ours.init(imgsz=64, bias_prior=False)
    variables = import_torch_state_dict(variables, sd, spec=ours.spec, strict=True)

    x = np.random.default_rng(3).uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_pred, _ = ref(torch.tensor(x), augment=True)
    pred, protos = forward_augment(ours, variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert protos is None  # detect model has no mask branch
    assert pred.shape == tuple(ref_pred.shape), (pred.shape, ref_pred.shape)
    # interpolation backends differ slightly (torch vs XLA bilinear); compare
    # with a modest tolerance and require near-exact agreement on the
    # identity-scale block (no resize involved)
    np.testing.assert_allclose(np.asarray(pred), ref_pred.numpy(), rtol=5e-2, atol=5e-2)
    # identity pass (first 240 rows for this 64px model: P3+P4 of scale 1.0)
    np.testing.assert_allclose(np.asarray(pred[:, :240]), ref_pred[:, :240].numpy(),
                               rtol=2e-4, atol=2e-3)


def test_train_mode_raw_parity():
    """Training-mode raw head outputs must match too (they feed the loss)."""
    DetectionModel, _ = _reference_models()
    torch.manual_seed(0)
    cfg = tiny_cfg(False)
    ref = DetectionModel(_torch_cfg(cfg), ch=3, nc=4).float()
    ref.eval()  # eval BN stats, but ask for raw (training-layout) outputs
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from yolo_dual_tpu.models.model import DetectionModel as Ours
    from yolo_dual_tpu.io import import_torch_state_dict

    ours = Ours(cfg, nc=4)
    variables = ours.init(imgsz=64, bias_prior=False)
    variables = import_torch_state_dict(variables, sd, spec=ours.spec, strict=True)

    x = np.random.default_rng(2).uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref.model[-1].training = True  # raw outputs without grad
        ref_raw = ref(torch.tensor(x))
    raw = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False, decode=False)
    for r_ref, r in zip(ref_raw, raw):
        np.testing.assert_allclose(np.asarray(r), r_ref.numpy(), rtol=2e-4, atol=2e-4)


def test_mixconv_and_sum_oracle_parity():
    """MixConv2d / Sum vs the live reference modules (models/experimental.py:14-57):
    same weights, same outputs — covers the channel-split rule, grouped convs,
    BN, and the sigmoid-gated weighted sum."""
    _stub_torchvision()
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    from models.experimental import MixConv2d as RefMix, Sum as RefSum

    from yolo_dual_tpu.nn.common import MixConv2d, Sum, bn_config

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    c1 = 6
    x = rng.normal(size=(2, c1, 8, 8)).astype(np.float32)

    # equal_ch=True with c2 % len(k) != 0 exercises remainder placement;
    # equal_ch=False params chosen so no branch rounds to zero channels
    # (the reference itself crashes at forward when one does)
    for equal_ch, c2, k in ((True, 10, (1, 3, 5)), (False, 24, (1, 3))):
        ref = RefMix(c1, c2, k=k, s=1, equal_ch=equal_ch).eval()
        ours = MixConv2d(c2, k=k, s=1, equal_ch=equal_ch)
        with bn_config(1e-5, 0.9):  # torch BatchNorm2d defaults
            variables = ours.init(jax.random.PRNGKey(0),
                                  jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
            params = dict(variables["params"])
            for i, m in enumerate(ref.m):
                if m.weight.numel() == 0:  # reference lstsq rounded this
                    assert f"m_{i}" not in params  # branch to 0 channels
                    continue
                assert params[f"m_{i}"]["kernel"].shape == tuple(
                    m.weight.shape[k] for k in (2, 3, 1, 0)), (equal_ch, i)
                params[f"m_{i}"] = {"kernel": m.weight.detach().numpy().transpose(2, 3, 1, 0)}
            params["bn"] = {"scale": ref.bn.weight.detach().numpy(),
                            "bias": ref.bn.bias.detach().numpy()}
            stats = {"bn": {"mean": ref.bn.running_mean.numpy(),
                            "var": ref.bn.running_var.numpy()}}
            out = ours.apply({"params": params, "batch_stats": stats},
                             jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
        with torch.no_grad():
            ref_out = ref(torch.tensor(x)).numpy()
        np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref_out,
                                   rtol=1e-5, atol=1e-5, err_msg=f"equal_ch={equal_ch}")

    xs = [rng.normal(size=(2, 4, 8, 8)).astype(np.float32) for _ in range(3)]
    for weight in (False, True):
        ref = RefSum(3, weight=weight).eval()
        ours = Sum(3, weight=weight)
        v = ours.init(jax.random.PRNGKey(0), [jnp.asarray(t) for t in xs])
        if weight:
            np.testing.assert_allclose(np.asarray(v["params"]["w"]),
                                       ref.w.detach().numpy())  # same init ramp
        with torch.no_grad():
            ref_out = ref([torch.tensor(t) for t in xs]).numpy()
        out = ours.apply(v, [jnp.asarray(t) for t in xs])
        np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-6, atol=1e-6)
