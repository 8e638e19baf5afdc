"""FULL-PIPELINE eval parity: our segment evaluator vs the LIVE reference
evaluator (reference segment/val.py:128-400 run()), end to end — dataset,
letterbox, forward, NMS, mask decode, TP matching, AP — on a shared synthetic
dataset with shared weights (VERDICT r1 next-#9: the no-egress fallback for
the headline coco128-seg parity metric).

Design: ground-truth labels are generated FROM OUR OWN MODEL'S top
predictions on each image, so box mAP is high (~1.0) and the comparison is
sensitive — any divergence in either pipeline moves one side's mAP. The
reference evaluator runs in-process ("training mode": model + dataloader
passed in) with its own torch dataloader; torchvision.ops.nms is provided by
a faithful pure-torch greedy NMS (suppress iou > thr), since torchvision is
not installed in this image."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REFERENCE.exists(), reason="reference unavailable")
torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

sys.path.insert(0, str(Path(__file__).parent))
from test_torch_parity import _reference_models, _torch_cfg, tiny_cfg  # noqa: E402

IMGSZ = 128
NC = 4


def _torchvision_nms(boxes, scores, iou_threshold):
    """torchvision.ops.nms semantics in pure torch (suppress iou strictly
    greater than threshold, descending score order)."""
    order = scores.argsort(descending=True)
    keep = []
    while order.numel() > 0:
        i = order[0]
        keep.append(i)
        if order.numel() == 1:
            break
        rest = order[1:]
        b = boxes[i]
        bb = boxes[rest]
        x1 = torch.maximum(b[0], bb[:, 0])
        y1 = torch.maximum(b[1], bb[:, 1])
        x2 = torch.minimum(b[2], bb[:, 2])
        y2 = torch.minimum(b[3], bb[:, 3])
        inter = (x2 - x1).clamp(0) * (y2 - y1).clamp(0)
        a1 = (b[2] - b[0]) * (b[3] - b[1])
        a2 = (bb[:, 2] - bb[:, 0]) * (bb[:, 3] - bb[:, 1])
        iou = inter / (a1 + a2 - inter + 1e-7)
        order = rest[iou <= iou_threshold]
    return torch.stack(keep)


def _build_models(cfg=None, nc=NC, imgsz=IMGSZ, cls_bias=None, obj_gain=1.0):
    DetectionModel, SegmentationModel = _reference_models()
    sys.modules["torchvision"].ops.nms = _torchvision_nms
    torch.manual_seed(0)
    if cfg is None:
        cfg = tiny_cfg(True)
        cfg["nc"] = nc
    ref = SegmentationModel(_torch_cfg(cfg), ch=3, nc=nc).float().eval()
    ref.names = {i: str(i) for i in range(nc)}
    # Prime the head biases so the random model behaves weakly-trained:
    # positive obj -> confident detections; positive mask-coef bias -> protos
    # (post-SiLU, mostly >0) give FILLED masks inside the crop. Without this
    # no mask TP exists anywhere and the reference evaluator reports all-zero
    # metrics regardless of box quality (`stats[0].any()` gate,
    # reference segment/val.py:339) — the comparison would be vacuous.
    # cls_bias: optional per-class (nc,) bias replacing the uniform +1.0 —
    # DISTINCT values break the nc-way multi-label near-ties so TPs dominate
    # the ranking and absolute AP is meaningful (the high-AP regime).
    # obj_gain="auto" revives the collapsed BN chain (below) and then applies
    # a per-row affine recalibration of the head conv outputs so the logit
    # distributions are SHAPED, not saturated — the ingredient that makes a
    # random-weight model produce a meaningful, framework-independent
    # confidence ranking and sane boxes at real depth. See the inline
    # comments for the two measured failure mechanisms this replaces.
    with torch.no_grad():
        det = ref.model[-1]
        if obj_gain == "auto":
            # LSUV-style BN re-calibration: at random init the eval-mode BN
            # chain (running stats = identity) lets activations COLLAPSE with
            # depth — by the head the input is ~1e-6 and effectively
            # input-independent, so obj logits are pure bias and no weight
            # gain can create a meaningful confidence ranking (measured: the
            # conv-output std is across-anchor BIAS variation; scaling the
            # obj weights 31x changed nothing). Setting every BN's running
            # stats from one probe forward (momentum=1, train-mode pass)
            # normalizes each layer's output, reviving healthy O(1)
            # input-dependent signal through the whole depth — what BN would
            # do after the first real training steps.
            for m in ref.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.momentum = 1.0
            ref.train()
            ref(torch.rand(4, 3, imgsz, imgsz))
            ref.eval()
        if obj_gain == 1.0:
            for mi in det.m:
                b = mi.bias.view(det.na, -1)
                # classic weakly-trained priming for the near-tie regime:
                # +3 obj -> confident everywhere, uniform-ish class conf
                b[:, 4] += 3.0
                if cls_bias is None:
                    b[:, 5:5 + nc] += 1.0
                else:
                    b[:, 5:5 + nc] += torch.as_tensor(cls_bias, dtype=b.dtype)
                b[:, 5 + nc:] += 2.0
                mi.bias.copy_(b.view(-1))
        else:
            # Per-row AFFINE RECALIBRATION of the head conv outputs. Bias/gain
            # tweaks of single rows cannot work here (both were measured to
            # fail): after the BN revival the head INPUT carries a huge
            # low-rank spatial component, so every output row (obj, wh, cls)
            # saturates — ~3000 anchors at conf 1.0 (the 300-det cap then
            # keeps an arbitrary tie-order subset per framework: zero TP,
            # all-zero gate) and the confident outliers decode to degenerate
            # 0-width boxes. Instead, probe the per-channel spatial mean/std
            # of each head conv's output and retarget every row:
            #   xy -> (0, 1)        responsive cell offsets
            #   wh -> (0.5, 1)      (2*sigmoid)^2*anchor ~ 1.7x anchor, >=8px
            #   obj -> (-5.5, 2)    unsaturated conf ladder: top anchors at
            #                       logit ~+2.5 (conf ~0.92), rank gaps O(.01)
            #                       that dwarf cross-framework f32 noise
            #   cls -> (cls_bias,1) the DOMINANT-class structure actually
            #                       lands (with raw revived logits the spatial
            #                       component swamps any +-4 bias and gt
            #                       classes come out argmax-random)
            #   mask coefs -> (2,1) solid masks inside the crop
            stats = {}
            hooks = []
            for li, mi in enumerate(det.m):
                def mk(li):
                    def hook(mod, inp, out):
                        o = out.permute(1, 0, 2, 3).reshape(out.shape[1], -1)
                        stats[li] = (o.mean(1), o.std(1))
                    return hook
                hooks.append(mi.register_forward_hook(mk(li)))
            ref(torch.rand(2, 3, imgsz, imgsz))
            for h in hooks:
                h.remove()
            for li, mi in enumerate(det.m):
                mu, sdv = stats[li]
                no = mi.weight.shape[0] // det.na
                tmu = torch.zeros(det.na, no)
                tsd = torch.ones(det.na, no)
                tmu[:, 2:4] = 0.5
                tmu[:, 4] = -5.5
                tsd[:, 4] = 2.0
                if cls_bias is None:
                    tmu[:, 5:5 + nc] = 1.0
                else:
                    tmu[:, 5:5 + nc] = torch.as_tensor(cls_bias)
                tmu[:, 5 + nc:] = 2.0
                tmu, tsd = tmu.reshape(-1), tsd.reshape(-1)
                s = tsd / sdv.clamp(min=1e-6)
                mi.weight.mul_(s[:, None, None, None])
                mi.bias.copy_(s * (mi.bias - mu) + tmu)
        # Prime the proto OUTPUT too: at real depth (yolov5s-seg @640) the
        # random-init proto branch collapses to ~1e-7 (eval-mode BN is
        # identity at init; the deep conv stack shrinks activations), so
        # masks are coin-flip speckle, no mask TP exists at ANY IoU, and the
        # reference's stats[0].any() gate (segment/val.py:339) zeroes every
        # metric — the r3 fullsize failure. +2.0 on the last proto Conv's BN
        # beta gives protos ≈ silu(2) ≈ 1.76 everywhere; with the +2.0 coef
        # bias the mask logit is ~+30 inside the crop → solid, reachable
        # masks at any depth/scale.
        det.proto.cv3.bn.bias += 2.0
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    from yolo_dual_tpu.io import import_torch_state_dict
    from yolo_dual_tpu.models.model import SegmentationModel as Ours
    ours = Ours(cfg, nc=nc)
    variables = ours.init(imgsz=imgsz, bias_prior=False)
    variables = import_torch_state_dict(variables, sd, spec=ours.spec, strict=True)
    return ref, ours, variables


def _make_dataset(root: Path, ours, variables, n_imgs: int = 6, imgsz: int = IMGSZ):
    """Synthetic square images; gt = our model's top decoded boxes with
    polygons traced from the model's own PREDICTED instance masks. Predicted
    masks as gt matters: the reference evaluator skips ALL metrics (box
    included) unless at least one mask TP exists (`stats[0].any()` gate,
    reference segment/val.py:339), so gt masks must be reachable by the
    model's own mask head."""
    from yolo_dual_tpu.ops import process_mask
    from yolo_dual_tpu.ops.nms import nms_batched
    img_dir = root / "images" / "val"
    lbl_dir = root / "labels" / "val"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.default_rng(7)
    nm = ours.spec.layers[-1].kw()["nm"]
    for i in range(n_imgs):
        im = rng.integers(0, 255, (imgsz, imgsz, 3), dtype=np.uint8)
        cv2.rectangle(im, (20 + 6 * i, 30), (90 + 4 * i, 100), (250, 30, 30), -1)
        cv2.circle(im, (90, 40 + 5 * i), 22, (30, 250, 30), -1)
        cv2.imwrite(str(img_dir / f"{i:04d}.jpg"), im[..., ::-1])
        im_read = cv2.cvtColor(cv2.imread(str(img_dir / f"{i:04d}.jpg")), cv2.COLOR_BGR2RGB)
        pred, protos, _ = ours.apply(variables, jnp.asarray(im_read[None], jnp.float32) / 255.0,
                                     train=False)
        # max_det=64 (top-8 ordering unchanged vs the original 16) gives the
        # rescue pass below enough candidates in the calibrated-conf regime
        out, nv = nms_batched(pred, conf_thres=1e-6, iou_thres=0.6, multi_label=False,
                              max_det=64, nm=nm)
        dets = np.asarray(out)[0, : int(np.asarray(nv)[0])]
        pmasks = np.asarray(process_mask(protos[0], jnp.asarray(dets[:, 6:6 + nm]),
                                         jnp.asarray(dets[:, :4]), (imgsz, imgsz),
                                         upsample=True, binarize=True))
        def _trace(d, pm):
            x1, y1, x2, y2 = np.clip(d[:4], 2, imgsz - 2)
            if x2 - x1 < 8 or y2 - y1 < 8:
                return None
            cls = int(d[5])
            solid = cv2.morphologyEx(pm.astype(np.uint8), cv2.MORPH_CLOSE,
                                     np.ones((5, 5), np.uint8))
            cnts, _ = cv2.findContours(solid, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
            cnt = max(cnts, key=cv2.contourArea) if cnts else None
            if cnt is not None and cv2.contourArea(cnt) >= 16 and len(cnt) >= 3:
                poly = (cnt.reshape(-1, 2).astype(np.float64) / imgsz).clip(0, 1)
            else:
                # box-rectangle fallback keeps box gt meaningful even when this
                # det's mask is too speckly to trace
                poly = np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]]) / imgsz
            return f"{cls} " + " ".join(f"{v:.6f}" for v in poly.ravel())

        lines = []
        for d, pm in zip(dets[:8], pmasks[:8]):
            line = _trace(d, pm)
            if line is not None:
                lines.append(line)
            if len(lines) >= 5:
                break
        if not lines:
            # Rescue pass: in the calibrated-confidence (high-AP) regime the
            # top-ranked outlier detections can ALL be sub-8px boxes; scan the
            # rest of the NMS output for the first usable candidate. Guarded
            # so the original top-8 gt is byte-identical whenever it exists.
            for d, pm in zip(dets[8:], pmasks[8:]):
                line = _trace(d, pm)
                if line is not None:
                    lines.append(line)
                    break
        assert lines, f"image {i}: no usable gt candidates"
        (lbl_dir / f"{i:04d}.txt").write_text("\n".join(lines) + "\n")
    return img_dir


def _run_ref_eval(ref, img_dir, out_dir, nc, imgsz, bs, overlap):
    """Run the LIVE reference evaluator in-process (training mode)."""
    import importlib.util
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    from utils.segment.dataloaders import create_dataloader as ref_create_dataloader
    ref_loader = ref_create_dataloader(str(img_dir), imgsz, bs, 32, pad=0.0, rect=False,
                                       workers=0, overlap_mask=overlap,
                                       mask_downsample_ratio=4)[0]
    spec = importlib.util.spec_from_file_location("ref_seg_val",
                                                  REFERENCE / "segment" / "val.py")
    ref_val = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_val)
    data = {"val": str(img_dir), "nc": nc, "names": {i: str(i) for i in range(nc)}}

    # Freeze the clock the reference NMS reads: its wall-clock guard
    # (`time_limit = 0.5 + 0.05*bs`, utils/general.py:997-999) silently DROPS
    # the rest of the batch on slow boxes — with the pure-torch NMS stub on
    # this 1-CPU host it triggers every batch and zeroes recall.
    ref_general = sys.modules["utils.general"]
    _orig_time = ref_general.time

    class _FrozenTime:
        @staticmethod
        def time():
            return 0.0

    ref_general.time = _FrozenTime()
    try:
        with torch.no_grad():
            (ref_results, _maps, _t) = ref_val.run(
                data, model=ref, dataloader=ref_loader, batch_size=bs, imgsz=imgsz,
                conf_thres=0.001, iou_thres=0.6, max_det=300, half=False, plots=False,
                overlap=overlap, mask_downsample_ratio=4, save_dir=out_dir,
                verbose=False)
    finally:
        ref_general.time = _orig_time
    return np.array(ref_results[:8], np.float64)


def _run_our_eval(ours, variables, img_dir, nc, imgsz, bs, overlap):
    from yolo_dual_tpu.data import create_dataloader
    from yolo_dual_tpu.engine import evaluate_segment
    loader, _ = create_dataloader(str(img_dir), imgsz, bs, augment=False,
                                  mask_downsample_ratio=4, overlap_mask=overlap,
                                  task="segment")
    nm = ours.spec.layers[-1].kw()["nm"]
    mean, maps, t = evaluate_segment(ours, variables, loader, nc, conf_thres=0.001,
                                     iou_thres=0.6, max_det=300, nm=nm, mask_ratio=4)
    return np.array(mean[:8], np.float64)


def test_full_eval_parity(tmp_path):
    ref, ours, variables = _build_models()
    img_dir = _make_dataset(tmp_path / "ds", ours, variables)
    ref_mean = _run_ref_eval(ref, img_dir, tmp_path / "ref_out", NC, IMGSZ, 4, True)
    our_mean = _run_our_eval(ours, variables, img_dir, NC, IMGSZ, 4, True)

    # The parity claim: our full pipeline reproduces the live reference
    # evaluator on identical weights+data. Recall compares EXACTLY (it counts
    # TP matches — dataloader, letterbox, forward, NMS, mask decode, and
    # TP matching must all agree). Precision/AP compare to 0.05: a primed
    # random-weight model emits hundreds of near-duplicate detections whose
    # confidences differ only by f32 conv noise (~1e-4), so FP *ordering* —
    # not matching — wiggles the PR curve; exact AP math is oracle-tested
    # per-component in tests/test_metrics.py against the live reference.
    np.testing.assert_allclose(our_mean[[1, 5]], ref_mean[[1, 5]], atol=1e-6,
                               err_msg=f"recall parity: ours={our_mean} ref={ref_mean}")
    np.testing.assert_allclose(our_mean, ref_mean, atol=0.05,
                               err_msg=f"ours={our_mean} ref={ref_mean}")
    # Sensitivity guards against a vacuous 0≈0 comparison (the reference
    # zeroes ALL metrics when no mask TP exists — segment/val.py:339)
    assert ref_mean[1] > 0.9, f"ref box recall degenerate: {ref_mean}"
    assert ref_mean[5] > 0.3, f"ref mask recall degenerate: {ref_mean}"
    assert our_mean[2] > 0.2, f"box mAP50 too low to be meaningful: {our_mean}"


@pytest.mark.slow
def test_full_eval_parity_fullsize(tmp_path):
    """The flagship config at production settings (VERDICT r2 next-#1a): the
    REAL yolov5s-seg graph (reference models/segment/yolov5s-seg.yaml) at
    640px, nc=80, multi-label NMS (both evaluators pass multi_label=True),
    BOTH mask-overlap modes, 2 batches — so level-dependent decode bugs that
    only appear at 640px strides (80/40/20 grids) or multi-label ties at
    nc=80 are caught, not just the tiny 128px/nc4 regime above."""
    import yaml
    cfg = yaml.safe_load(
        (Path(__file__).parents[1] / "yolo_dual_tpu" / "configs" / "segment"
         / "yolov5s-seg.yaml").read_text())
    imgsz, nc = 640, 80
    ref, ours, variables = _build_models(cfg=cfg, nc=nc, imgsz=imgsz)
    img_dir = _make_dataset(tmp_path / "ds", ours, variables, n_imgs=4, imgsz=imgsz)

    for overlap in (True, False):
        ref_mean = _run_ref_eval(ref, img_dir, tmp_path / f"ref_{overlap}",
                                 nc, imgsz, 2, overlap)
        our_mean = _run_our_eval(ours, variables, img_dir, nc, imgsz, 2, overlap)
        # Same contract as the tiny test: recall exact (TP counting across
        # dataloader/letterbox/forward/NMS/mask-decode/matching must agree);
        # precision/AP to 0.05 (FP ordering wiggles under f32 conv noise).
        print(f"fullsize overlap={overlap}: ours={our_mean} ref={ref_mean}")
        np.testing.assert_allclose(
            our_mean[[1, 5]], ref_mean[[1, 5]], atol=1e-6,
            err_msg=f"recall parity overlap={overlap}: ours={our_mean} ref={ref_mean}")
        np.testing.assert_allclose(our_mean, ref_mean, atol=0.05,
                                   err_msg=f"overlap={overlap}: ours={our_mean} ref={ref_mean}")
        # AP columns agree tighter than the global 0.05: in this regime AP
        # itself is small (see guard below), so 0.05 alone would be near-
        # vacuous for them.
        np.testing.assert_allclose(our_mean[[2, 3, 6, 7]], ref_mean[[2, 3, 6, 7]],
                                   atol=0.02,
                                   err_msg=f"AP parity overlap={overlap}: ours={our_mean} ref={ref_mean}")
        assert ref_mean[1] > 0.9, f"ref box recall degenerate: {ref_mean}"
        assert ref_mean[5] > 0.3, f"ref mask recall degenerate: {ref_mean}"
        # mAP is STRUCTURALLY low at fullsize: with uniformly primed class
        # biases at nc=80 and multi_label NMS, every anchor cluster emits ~80
        # near-tie class copies whose f32-noise conf ordering interleaves FPs
        # above TPs — precision at rank is ~1/nc even at recall 1.0, on BOTH
        # evaluators (their agreement is checked above). The sensitivity
        # anchors are exact recall equality + nonzero-AP agreement, not an
        # absolute AP level (the tiny test covers the high-AP regime).
        assert our_mean[2] > 0.02 and ref_mean[2] > 0.02, \
            f"box mAP50 vacuously zero: ours={our_mean} ref={ref_mean}"


@pytest.mark.slow
@pytest.mark.skip(reason="measured NEGATIVE (r5): the high-AP regime is "
                  "structurally unreachable for a random-weight model at "
                  "640px depth — three priming strategies failed on three "
                  "distinct measured mechanisms (conf-1.0 tie floods from the "
                  "revived head input's low-rank component; degenerate w=0 "
                  "outlier boxes; heavy-tailed border-cell saturation that "
                  "global affine recalibration cannot shape). See "
                  "docs/PARITY.md 'High-AP regime at 640px/nc80'. Meaningful "
                  "rankings need trained weights: the egress-blocked "
                  "tools/parity_coco128.py item.")
def test_full_eval_parity_fullsize_highap(tmp_path):
    """640px/nc80 parity in the HIGH-AP regime (VERDICT r4 next #6): the
    intent was a decisively-dominant class bias + calibrated obj ladder so
    TPs dominate the confidence ranking, absolute AP is O(0.5+), and AP
    columns can be held to 5e-3. KEPT (with its three-generation priming
    machinery in _build_models' obj_gain="auto" path) as the executable
    record of the attempt — see the skip reason and docs/PARITY.md for the
    three measured failure mechanisms. The uniform-bias test above covers
    the 640px/nc80 near-tie regime with exact recall; test_full_eval_parity
    covers the AP-meaningful regime at 128px/nc4."""
    import yaml
    cfg = yaml.safe_load(
        (Path(__file__).parents[1] / "yolo_dual_tpu" / "configs" / "segment"
         / "yolov5s-seg.yaml").read_text())
    imgsz, nc = 640, 80
    cls_bias = np.full(nc, -4.0, dtype=np.float32)
    cls_bias[0] = 4.0
    ref, ours, variables = _build_models(cfg=cfg, nc=nc, imgsz=imgsz,
                                         cls_bias=cls_bias, obj_gain="auto")
    img_dir = _make_dataset(tmp_path / "ds", ours, variables, n_imgs=4, imgsz=imgsz)

    ref_mean = _run_ref_eval(ref, img_dir, tmp_path / "ref_ha", nc, imgsz, 2, True)
    our_mean = _run_our_eval(ours, variables, img_dir, nc, imgsz, 2, True)
    print(f"fullsize high-AP: ours={our_mean} ref={ref_mean}")
    np.testing.assert_allclose(our_mean[[1, 5]], ref_mean[[1, 5]], atol=1e-6,
                               err_msg=f"recall parity: ours={our_mean} ref={ref_mean}")
    np.testing.assert_allclose(our_mean[[2, 3, 6, 7]], ref_mean[[2, 3, 6, 7]],
                               atol=5e-3,
                               err_msg=f"AP parity: ours={our_mean} ref={ref_mean}")
    np.testing.assert_allclose(our_mean, ref_mean, atol=0.05,
                               err_msg=f"ours={our_mean} ref={ref_mean}")
    # the point of this regime: AP is MEANINGFUL here, not structurally low
    assert ref_mean[2] > 0.5, f"ref box mAP50 not in high-AP regime: {ref_mean}"
    assert our_mean[2] > 0.5, f"our box mAP50 not in high-AP regime: {our_mean}"
