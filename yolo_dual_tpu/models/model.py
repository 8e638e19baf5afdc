"""Model wrappers: graph walker + Detection/Segmentation/Semantic/Classification.

Capability parity with reference models/yolo.py:109-296 (BaseModel /
DetectionModel / SegmentationModel / ClassificationModel). TPU-first notes:

- `GraphModel` walks a static ModelSpec inside `nn.compact`; every layer's
  output is kept in a Python list during tracing (XLA dead-code-eliminates
  unused ones, so no savelist machinery is needed at runtime).
- Strides are probed with `jax.eval_shape` (zero FLOPs) instead of a real
  dummy forward (reference models/yolo.py:190-195).
- Detect-head bias priors are applied as a functional param transform
  (reference models/yolo.py:253-261 `_initialize_biases`).
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from yolo_dual_tpu.models.compiler import (
    LayerSpec,
    ModelSpec,
    build_module,
    parse_config,
    with_strides,
)
from yolo_dual_tpu.utils.general import LOGGER, yaml_load

Dtype = Any


class GraphModel(nn.Module):
    """Walks a compiled ModelSpec (reference BaseModel._forward_once,
    models/yolo.py:114-125)."""

    spec: ModelSpec
    dtype: Dtype = None
    fused: bool = False  # conv+BN folded variables (see BaseModel.fuse)
    blocked_stem: bool = False  # train-path s2d stem (nn/blocked_train.py)
    fused_bn: bool = False  # custom-VJP train BatchNorm (nn/common.py FusedBatchNorm)
    fused_bn_act: bool = False  # fold trailing SiLU into the BN VJP (_bn_silu)
    # per-layer nn.remat in train (HBM-bound step: trade recompute for
    # activation bytes). True = every compute layer; a tuple of layer indices
    # = selective remat (e.g. only the large early-activation layers — the
    # all-layers variant measured SLOWER on v5e, tools/bench_remat.py).
    remat_layers: Any = False

    @nn.compact
    def __call__(self, x, train: bool = False, decode: Optional[bool] = None):
        from yolo_dual_tpu.nn.common import bn_config, fused_bn_vjp, fused_inference
        if self.spec.style == "semantic":
            ctx = bn_config(1e-5, 0.9)    # torch BatchNorm2d defaults
        else:
            ctx = bn_config(1e-3, 0.97)   # reference initialize_weights profile
        import jax.numpy as _jnp
        with ctx, fused_inference(self.fused), \
                fused_bn_vjp(self.fused_bn and train,
                             dtype=self.dtype or _jnp.float32,
                             fold_act=self.fused_bn_act and train):
            return self._walk(x, train, decode)

    # Shape-only glue: remat would add optimization barriers for zero byte
    # savings (these save no internal residuals).
    _NO_REMAT = frozenset({
        "Concat", "Upsample", "nn.Upsample", "Contract", "Expand", "Sum",
        "MaxPool2d", "nn.MaxPool2d", "nn.ZeroPad2d", "nn.Softmax",
        "nn.BatchNorm2d",
    })

    def _walk(self, x, train: bool, decode: Optional[bool]):
        y = []
        out = x
        for layer in self.spec.layers:
            f = layer.f
            if isinstance(f, tuple):
                inp = [out if j == -1 else y[j] for j in f]
            elif f == -1:
                inp = out
            else:
                inp = y[f]
            rl = self.remat_layers
            rm = (train and layer.name not in self._NO_REMAT
                  and (rl is True
                       or (not isinstance(rl, bool) and layer.i in rl)))
            if self.blocked_stem and layer.i <= 3:
                from yolo_dual_tpu.nn.blocked_train import build_blocked_layer
                prev_c2 = tuple(l.c2 for l in self.spec.layers[:3])
                mod = build_blocked_layer(layer, self.spec.ch_in, prev_c2,
                                          self.dtype, f"model_{layer.i}", remat=rm)
                out = mod(inp, train)
            elif layer.name in ("Detect", "Segment", "DetectAux"):
                mod = build_module(layer.name, layer.kw(), self.dtype, f"model_{layer.i}")
                out = mod(inp, train=train, decode=decode)
            elif layer.n > 1:
                out = inp
                for r in range(layer.n):
                    mod = build_module(layer.name, layer.kw(), self.dtype,
                                       f"model_{layer.i}_{r}", remat=rm)
                    out = mod(out, train)
            else:
                mod = build_module(layer.name, layer.kw(), self.dtype,
                                   f"model_{layer.i}", remat=rm)
                out = mod(inp, train)
            y.append(out)
        return out


def _load_cfg(cfg) -> dict:
    if isinstance(cfg, dict):
        return dict(cfg)
    return yaml_load(cfg)


def _probe_strides(spec: ModelSpec, dtype=None) -> ModelSpec:
    """Shape-probe the network at 256px to derive head strides
    (reference models/yolo.py:190-197)."""
    head = spec.layers[-1]
    if head.name not in ("Detect", "Segment", "DetectAux"):
        return spec
    model = GraphModel(spec, dtype)
    s = 256
    x = jax.ShapeDtypeStruct((1, s, s, spec.ch_in), jnp.float32)
    vars_shapes = jax.eval_shape(lambda xx: model.init(jax.random.PRNGKey(0), xx, train=False), x)
    shapes = jax.eval_shape(lambda v, xx: model.apply(v, xx, train=False, decode=False), vars_shapes, x)
    # raw output: Detect -> [levels]; Segment -> ([levels], protos)
    levels = shapes[0] if head.name == "Segment" else shapes
    if head.name == "DetectAux":
        levels = levels[: len(levels) // 2]
    strides = [s // lvl.shape[2] for lvl in levels]  # lvl: (bs, na, ny, nx, no)
    return with_strides(spec, strides)


def initialize_detect_biases(variables, spec: ModelSpec, cf=None):
    """Focal-style prior init of Detect conv biases (reference models/yolo.py:253-261)."""
    head = spec.layers[-1]
    if head.name not in ("Detect", "Segment", "DetectAux"):
        return variables
    kw = head.kw()
    nc = kw["nc"]
    anchors = kw["anchors"]
    strides = kw["strides"]
    na = len(anchors[0]) // 2
    params = variables["params"]
    hname = f"model_{head.i}"
    hparams = params[hname]
    if head.name == "Segment":
        hparams = hparams["detect"]
    elif head.name == "DetectAux":
        hparams = hparams["lead"]
    for i, s in enumerate(strides):
        b = np.array(hparams[f"m_{i}"]["bias"]).reshape(na, -1)
        b[:, 4] += math.log(8 / (640 / s) ** 2)
        if cf is None:
            b[:, 5:5 + nc] += math.log(0.6 / (nc - 0.99999))
        else:
            b[:, 5:5 + nc] += np.log(cf / cf.sum())
        hparams[f"m_{i}"]["bias"] = jnp.asarray(b.reshape(-1))
    return variables


class BaseModel:
    """Holds a compiled spec + flax module; functional init/apply interface."""

    task = "detect"

    def __init__(self, cfg="yolov5s.yaml", ch: int = 3, nc: Optional[int] = None,
                 anchors=None, dtype: Dtype = None, verbose: bool = False,
                 blocked_stem: bool = False, fused_bn: bool = False,
                 fused_bn_act: bool = False, remat_layers: Any = False):
        self.yaml = _load_cfg(cfg)
        self.yaml_file = Path(cfg).name if isinstance(cfg, (str, Path)) else None
        spec = parse_config(self.yaml, ch=ch, nc=nc, anchors_override=anchors, verbose=verbose)
        spec = _probe_strides(spec, dtype)
        self.spec = spec
        self.dtype = dtype
        # Train-path blocked stem (nn/blocked_train.py): exact same math and
        # parameter tree, ~2.7x faster stem on TPU. Applied only when the
        # graph starts with the v5 Conv6/Conv3/C3/Conv3 pattern.
        from yolo_dual_tpu.nn import blocked as _blocked
        self.blocked_stem = bool(blocked_stem) and _blocked.eligible(spec)
        self.module = GraphModel(spec, dtype, blocked_stem=self.blocked_stem,
                                 fused_bn=fused_bn, fused_bn_act=fused_bn_act,
                                 remat_layers=remat_layers)
        self.nc = spec.nc
        self.names = {i: str(i) for i in range(spec.nc)}
        self.stride = np.array(spec.strides or [32])
        self.hyp = None  # attached by the trainer

    # --- functional interface -------------------------------------------------
    def init(self, rng=None, imgsz: int = 640, bias_prior: bool = True):
        rng = jax.random.PRNGKey(0) if rng is None else rng
        x = jnp.zeros((1, imgsz, imgsz, self.spec.ch_in), jnp.float32)
        variables = self.module.init(rng, x, train=True)
        variables = jax.tree_util.tree_map(np.asarray, variables)  # mutable pytree of np arrays
        variables = _to_mutable(variables)
        if bias_prior and self.spec.layers[-1].name in ("Detect", "Segment", "DetectAux"):
            variables = initialize_detect_biases(variables, self.spec)
        return variables

    def apply(self, variables, x, train: bool = False, decode: Optional[bool] = None,
              mutable=False, rngs=None):
        return self.module.apply(variables, x, train=train, decode=decode,
                                 mutable=mutable, rngs=rngs)

    def fuse(self, variables, blocked: Optional[bool] = None):
        """Return (fused_model, fused_variables) with every Conv's BatchNorm
        folded into its kernel/bias — the reference's ``model.fuse()``
        (models/yolo.py fuse, utils/torch_utils.py fuse_conv_and_bn), done
        functionally. The fused model's forward is numerically ≡ the unfused
        inference forward (BN affine is linear) but compiles without the BN
        f32 affine chain. Inference-only: the fused variables carry no
        BN params to train.

        `blocked` (default: auto when the graph starts with the v5 stem
        pattern) additionally rewrites layers 0-3 into the space-to-depth
        blocked layout (nn/blocked.py) — same math, ~2.7x faster on TPU where
        the tiny-channel 320²/160² stages otherwise starve the MXU lanes."""
        import copy as _copy
        eps = 1e-5 if self.spec.style == "semantic" else 1e-3
        fused_vars = fuse_conv_bn(variables, eps)
        spec = self.spec
        from yolo_dual_tpu.nn import blocked as _blocked
        if blocked is None:
            blocked = _blocked.eligible(spec)
        if blocked:
            if not _blocked.eligible(spec):
                raise ValueError("blocked=True but the graph's first four layers "
                                 "are not the Conv6x6/Conv3x3/C3/Conv3x3 stem pattern")
            fused_vars = _blocked.rewrite_variables(fused_vars, spec)
            spec = _blocked.rewrite_spec(spec)
        m = _copy.copy(self)
        m.spec = spec
        m.module = GraphModel(spec, self.dtype, fused=True)
        return m, fused_vars

    def info(self, variables=None):
        n_layers = len(self.spec.layers)
        n_params = 0
        if variables is not None:
            n_params = sum(int(np.prod(np.shape(p))) for p in jax.tree_util.tree_leaves(variables.get("params", {})))
        LOGGER.info(f"{type(self).__name__}: {n_layers} layers, {n_params:,} parameters, strides {list(self.stride)}")
        return n_layers, n_params


def fuse_conv_bn(variables, eps: float):
    """Fold Conv-attached BatchNorms into the conv kernel + a new bias
    (reference utils/torch_utils.py fuse_conv_and_bn / models/yolo.py fuse()).

    Walks the params tree; wherever a subtree holds sibling ``conv`` (with an
    HWIO ``kernel``) and ``bn`` (scale/bias) entries — the `Conv` module layout
    — it computes ``w' = w * gamma/sqrt(var+eps)``, ``b' = beta - mean * gamma/
    sqrt(var+eps)`` from the matching ``batch_stats`` entry, writes the folded
    kernel+bias, and deletes the BN from both collections. BNs not attached to
    a Conv (BottleneckCSP's shared post-concat BN, standalone nn.BatchNorm2d
    rows) are left in place and still run from frozen stats.

    Returns a new variables dict (the input is not mutated)."""
    import copy
    variables = copy.deepcopy(_to_mutable(variables))
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})

    def walk(p, s):
        if not isinstance(p, dict):
            return
        if ("conv" in p and isinstance(p["conv"], dict) and "kernel" in p["conv"]
                and "bn" in p and isinstance(p.get("bn"), dict) and "scale" in p["bn"]
                and isinstance(s, dict) and "bn" in s):
            gamma = np.asarray(p["bn"]["scale"], np.float32)
            beta = np.asarray(p["bn"]["bias"], np.float32)
            mean = np.asarray(s["bn"]["mean"], np.float32)
            var = np.asarray(s["bn"]["var"], np.float32)
            scale = gamma / np.sqrt(var + eps)
            kernel = np.asarray(p["conv"]["kernel"], np.float32) * scale  # HWIO: out = last
            bias = beta - mean * scale
            if "bias" in p["conv"]:
                bias = bias + np.asarray(p["conv"]["bias"], np.float32) * scale
            p["conv"]["kernel"] = jnp.asarray(kernel)
            p["conv"]["bias"] = jnp.asarray(bias)
            del p["bn"]
            del s["bn"]
        for k in list(p.keys()):
            walk(p[k], s.get(k, {}) if isinstance(s, dict) else {})

    walk(params, stats)

    def prune_empty(t):
        if not isinstance(t, dict):
            return t
        return {k: prune_empty(v) for k, v in t.items()
                if not (isinstance(v, dict) and not prune_empty(v))}

    stats = prune_empty(stats)
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    for k, v in variables.items():
        if k not in ("params", "batch_stats"):
            out[k] = v
    return out


def _to_mutable(tree):
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    try:  # FrozenDict
        return {k: _to_mutable(v) for k, v in tree.items()}
    except AttributeError:
        return tree


class DetectionModel(BaseModel):
    task = "detect"


class SegmentationModel(DetectionModel):
    task = "segment"


class SemanticSegModel(BaseModel):
    """Dense semantic segmentation (the reference's standalone-script path).

    Forward returns (b, h, w, nc) per-pixel class scores; if the graph's output
    resolution differs from the input, it is bilinearly resized to match
    (reference seg_diceloss_Resnet50.py:707-708)."""

    task = "semantic"

    def apply(self, variables, x, train: bool = False, decode=None, mutable=False, rngs=None):
        out = self.module.apply(variables, x, train=train, mutable=mutable, rngs=rngs)
        def fix(o):
            if o.shape[1:3] != x.shape[1:3]:
                from yolo_dual_tpu.nn.common import resize_bilinear
                return resize_bilinear(o, x.shape[1:3])
            return o
        if mutable:
            out, updates = out
            return fix(out), updates
        return fix(out)


class ClassificationModel(BaseModel):
    """Classification model derived from a detection backbone at a cutoff
    (reference models/yolo.py:273-296)."""

    task = "classify"

    def __init__(self, cfg=None, nc: int = 1000, cutoff: int = 10, dtype: Dtype = None,
                 dropout: float = 0.0):
        self.yaml = _load_cfg(cfg)
        base = parse_config(self.yaml, ch=3)
        layers = list(base.layers[:cutoff])
        i = len(layers)
        ch_in_cls = layers[-1].c2
        head_kw = (("c2", nc),) + ((("dropout", float(dropout)),) if dropout else ())
        layers.append(LayerSpec(i=i, f=-1, n=1, name="Classify",
                                kwargs=head_kw, c2=nc))
        spec = ModelSpec(layers=tuple(layers), nc=nc, ch_in=3,
                         save=tuple(s for s in base.save if s < i),
                         out_ch=tuple([l.c2 for l in layers]),
                         anchors=(), strides=(), style="classify",
                         default_act=base.default_act)
        self.spec = spec
        self.dtype = dtype
        self.module = GraphModel(spec, dtype)
        self.nc = nc
        self.cutoff = cutoff
        self.names = {i: str(i) for i in range(nc)}
        self.stride = np.array([32])
        self.hyp = None


def reshape_classifier_output(model: "ClassificationModel", variables: dict,
                              nc: int, imgsz: int = 224):
    """Adapt a classifier to a new class count (reference
    utils/torch_utils.py:66-87 reshape_classifier_output): rebuild the model
    at `nc` and transplant every weight whose path+shape still matches, so
    only the final Dense kernel/bias are freshly initialized. Returns
    (new_model, new_variables)."""
    if nc == model.nc:
        return model, variables
    new_model = ClassificationModel(model.yaml, nc=nc, cutoff=model.cutoff,
                                    dtype=model.dtype)
    new_vars = new_model.init(imgsz=imgsz)

    def merge(old, new):
        if isinstance(new, dict):
            old = old if isinstance(old, dict) else {}
            return {k: merge(old.get(k), new[k]) for k in new}
        if old is not None and np.shape(old) == np.shape(new):
            return old
        return new

    merged = {col: merge(variables.get(col), new_vars[col]) for col in new_vars}
    return new_model, merged


def scale_img_nhwc(img: jnp.ndarray, ratio: float, gs: int = 32) -> jnp.ndarray:
    """Ratio-scale an NHWC batch, zero-pad bottom/right to a gs-multiple with
    the ImageNet-mean gray 0.447 (reference utils/torch_utils.py:297-308)."""
    from yolo_dual_tpu.nn.common import resize_bilinear
    b, h, w, c = img.shape
    if ratio == 1.0:
        return img
    sh, sw = int(h * ratio), int(w * ratio)
    out = resize_bilinear(img, (sh, sw))
    ph = math.ceil(h * ratio / gs) * gs
    pw = math.ceil(w * ratio / gs) * gs
    return jnp.pad(out, ((0, 0), (0, ph - sh), (0, pw - sw), (0, 0)),
                   constant_values=0.447)


def forward_augment(model: BaseModel, variables, x: jnp.ndarray):
    """Test-time augmentation: scales [1, 0.83, 0.67] × flips [none, lr, none],
    descaled/deflipped and tail-clipped exactly like the reference
    (models/yolo.py:206-235 _forward_augment/_descale_pred/_clip_augmented).

    Returns (preds (b, N, no), protos-or-None). Known upstream gap we improve
    on: the reference returns protos=None under TTA (segment masks unusable,
    models/yolo.py:223); we return the identity-pass protos so the mask branch
    keeps working. Mask coefficients from the flipped/scaled passes are
    approximate w.r.t. identity protos — boxes (the TTA payoff) are exact."""
    h, w = x.shape[1:3]
    gs = int(np.max(model.stride))
    nl = len(model.spec.strides) or 3
    scales = (1.0, 0.83, 0.67)
    flips = (None, "lr", None)
    ys = []
    protos0 = None
    for s, f in zip(scales, flips):
        xi = x[:, :, ::-1, :] if f == "lr" else x
        xi = scale_img_nhwc(xi, s, gs)
        out = model.module.apply(variables, xi, train=False)
        if isinstance(out, tuple) and len(out) == 3:     # Segment: (pred, protos, raw)
            pred, protos, _ = out
            if s == 1.0 and f is None:
                protos0 = protos
        else:                                            # Detect: (pred, raw)
            pred = out[0] if isinstance(out, tuple) else out
        # de-scale / de-flip (reference _descale_pred, non-inplace branch)
        px = pred[..., 0:1] / s
        py = pred[..., 1:2] / s
        pwh = pred[..., 2:4] / s
        if f == "lr":
            px = w - px
        ys.append(jnp.concatenate([px, py, pwh, pred[..., 4:]], axis=-1))
    # clip augmented tails (reference _clip_augmented): drop the largest-stride
    # level of the identity pass and the smallest-stride level of the last pass
    g = sum(4 ** k for k in range(nl))
    i0 = (ys[0].shape[1] // g) * 1
    ys[0] = ys[0][:, :-i0]
    i1 = (ys[-1].shape[1] // g) * (4 ** (nl - 1))
    ys[-1] = ys[-1][:, i1:]
    return jnp.concatenate(ys, axis=1), protos0


def build_model(cfg, task: Optional[str] = None, **kw) -> BaseModel:
    """Factory: choose the wrapper from the config contents or explicit task."""
    d = _load_cfg(cfg)
    if task is None:
        if d.get("anchors") is None:
            task = "semantic"
        else:
            last = d["head"][-1][2] if d.get("head") else ""
            task = "segment" if str(last) == "Segment" else "detect"
    cls = {"detect": DetectionModel, "segment": SegmentationModel,
           "semantic": SemanticSegModel, "classify": ClassificationModel}[task]
    if task == "classify":
        return cls(d, **kw)
    return cls(d, **kw)
