"""YAML model-graph compiler.

The public config surface mirrors the reference: a model YAML with
``nc / depth_multiple / width_multiple / [anchors] / backbone / head`` where
each row is ``[from, number, module, args]`` (reference models/yolo.py:299-382
``parse_model``). This module compiles such a dict into a static, hashable
``ModelSpec`` which `GraphModel` (models/model.py) walks under jit.

Differences from the reference by design (TPU-first):
- The spec is fully static: channels, strides, repeat counts are resolved at
  compile time, so the jitted forward has no Python-dependent control flow.
- There is no eval() of module names: modules resolve through an explicit
  registry (`REGISTRY`), extensible via `register_module`.
- Two arg-style profiles cover the reference's two config dialects:
  'detect'   — parse_model rules (c1 inferred, gd/gw scaling, n-insertion)
  'semantic' — the standalone-script builders' rules (no anchors; `number`
               column ignored; C3 rows read n from args[1], so False -> 0
               inner blocks, reproducing reference seg_diceloss_Resnet50.py:600-678).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple, Union

from yolo_dual_tpu.utils.general import LOGGER, make_divisible

# ---------------------------------------------------------------------------
# Spec datatypes (hashable so they can be flax Module attributes)
# ---------------------------------------------------------------------------


def _freeze(x):
    if isinstance(x, (list, tuple)):
        return tuple(_freeze(v) for v in x)
    if isinstance(x, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in x.items()))
    return x


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    i: int                                  # layer index
    f: Union[int, Tuple[int, ...]]          # input layer index/indices (-1 = previous)
    n: int                                  # sequential repeats of the whole module
    name: str                               # registry module name
    kwargs: Tuple[Tuple[str, Any], ...]     # frozen kwargs for the module builder
    c2: int                                 # output channels (bookkeeping)

    def kw(self) -> dict:
        return dict(self.kwargs)


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    layers: Tuple[LayerSpec, ...]
    nc: int
    ch_in: int = 3
    save: Tuple[int, ...] = ()
    out_ch: Tuple[int, ...] = ()
    anchors: Tuple[Tuple[float, ...], ...] = ()
    strides: Tuple[int, ...] = ()
    style: str = "detect"
    default_act: Optional[str] = None
    n_backbone: int = 0   # rows in the config's `backbone:` section — needed
    # to translate reference semantic checkpoints whose state_dict roots are
    # backbone.{i} / head.{j} (j offsets by this; io/torch_import.py)


# ---------------------------------------------------------------------------
# Module registry: name -> builder(kwargs, dtype) -> flax module instance.
# Builders are looked up lazily to avoid importing heavy deps at spec time.
# ---------------------------------------------------------------------------

REGISTRY: Dict[str, Callable[..., Any]] = {}


def register_module(name: str, builder: Callable[..., Any]):
    REGISTRY[name] = builder


def build_module(name: str, kwargs: dict, dtype=None, layer_name: str = None,
                 remat: bool = False):
    """Instantiate a registered module. ``remat=True`` wraps the class in
    ``nn.remat`` so its internal activations are rematerialized in the
    backward pass instead of being saved to HBM — the per-layer checkpoint
    scheme for the HBM-bound train step (layer-boundary tensors stay, C3/Conv
    internals are recomputed and fuse into the backward in VMEM)."""
    _populate_registry()
    if name not in REGISTRY:
        raise KeyError(f"Module {name!r} is not registered. Known: {sorted(REGISTRY)}")
    return REGISTRY[name](dict(kwargs), dtype=dtype, name=layer_name, remat=remat)


_POPULATED = False


def _populate_registry():
    global _POPULATED
    if _POPULATED:
        return
    _POPULATED = True
    from yolo_dual_tpu.nn import common as C
    from yolo_dual_tpu.nn import backbones as B
    from yolo_dual_tpu.nn import spp as S
    from yolo_dual_tpu.models import heads as H

    import flax.linen as nn

    def simple(cls):
        def b(kwargs, dtype=None, name=None, remat=False):
            c = nn.remat(cls, static_argnums=(2,)) if remat else cls
            return c(**kwargs, dtype=dtype, name=name)
        return b

    def nodtype(cls):
        def b(kwargs, dtype=None, name=None, remat=False):
            c = nn.remat(cls, static_argnums=(2,)) if remat else cls
            return c(**kwargs, name=name)
        return b

    for nm, cls in {
        "Conv": C.Conv, "DWConv": C.DWConv, "Bottleneck": C.Bottleneck,
        "BottleneckCSP": C.BottleneckCSP, "CrossConv": C.CrossConv,
        "C3": C.C3, "C3Conv": C.C3Conv, "C3x": C.C3x, "C3TR": C.C3TR,
        "C3SPP": C.C3SPP, "C3Ghost": C.C3Ghost, "C2f": C.C2f, "C3k2": C.C3k2,
        "GAM": C.GAM, "SPP": C.SPP, "SPPF": C.SPPF, "Focus": C.Focus,
        "GhostConv": C.GhostConv, "GhostBottleneck": C.GhostBottleneck,
        "TransformerBlock": C.TransformerBlock, "Proto": C.Proto, "MixConv2d": C.MixConv2d,
        "Classify": C.Classify, "nn.ConvTranspose2d": C.ConvTranspose,
        "DWConvTranspose2d": C.DWConvTranspose2d,
        "ResNetStem": B.ResNetStem, "ResNetLayer": B.ResNetLayer,
        "VGGBlock": B.VGGBlock, "SegmentHead": B.SegmentHead,
        "SimConv": S.SimConv, "SimSPPF": S.SimSPPF, "ASPP": S.ASPP,
        "RFB": S.RFB, "SPPCSPC": S.SPPCSPC, "SPPCSPC_group": S.SPPCSPC_group,
        "SimCSPSPPF": S.SimCSPSPPF,
        "Detect": H.Detect, "Segment": H.Segment, "DetectAux": H.DetectAux,
    }.items():
        register_module(nm, simple(cls))

    for nm, cls in {
        "Concat": C.Concat, "Upsample": C.Upsample, "nn.Upsample": C.Upsample,
        "Contract": C.Contract, "Expand": C.Expand,
        "nn.BatchNorm2d": C.BatchNorm2d, "nn.Softmax": C.Softmax,
        "MaxPool2d": B.MaxPool2d, "nn.MaxPool2d": B.MaxPool2d,
        "nn.ZeroPad2d": C.ZeroPad2d, "Sum": C.Sum,
    }.items():
        register_module(nm, nodtype(cls))

    # Deformable-conv blocks (Pallas-backed) register themselves on import.
    try:
        from yolo_dual_tpu.nn import dcn as D
        for nm, cls in {"DCNv2": D.DCNv2, "C3_DCN": D.C3_DCN, "C2f_DCN": D.C2f_DCN,
                        "DCNV3_YoLo": D.DCNV3_YoLo, "C3_DCNV3": D.C3_DCNV3}.items():
            register_module(nm, simple(cls))
    except ImportError:
        pass
    try:
        from yolo_dual_tpu.nn import attention as A
        for nm, cls in {"AttentionConv": A.AttentionConv, "AttentionStem": A.AttentionStem}.items():
            register_module(nm, simple(cls))
    except ImportError:
        pass
    try:
        from yolo_dual_tpu.nn import torchvision_backbones as T
        for nm, cls in T.STAGE_MODULES.items():
            register_module(nm, simple(cls))
    except ImportError:
        pass


# Names whose semantic-path / detect-path channel handling matches Conv-like
# modules: first arg is c2 and gets width-scaled.
_CONVLIKE = {
    "Conv", "GhostConv", "Bottleneck", "GhostBottleneck", "SPP", "SPPF", "DWConv",
    "Focus", "CrossConv", "BottleneckCSP", "C3", "C3Conv", "C3TR", "C3SPP", "C3Ghost",
    "nn.ConvTranspose2d", "DWConvTranspose2d", "C3x", "SimSPPF", "ASPP", "RFB",
    "SPPCSPC", "SPPCSPC_group", "SimCSPSPPF", "AttentionConv", "AttentionStem",
    "C3_DCN", "C2f", "C2f_DCN", "C3k2", "DCNV3_YoLo", "C3_DCNV3", "SimConv",
    "MixConv2d",
}
# Modules where the compiler inserts the repeat count as an `n` kwarg.
_REPEAT_AS_N = {
    "BottleneckCSP", "C3", "C3Conv", "C3TR", "C3Ghost", "C3x", "C3_DCN", "C2f",
    "C2f_DCN", "C3k2",
}
_TV_STAGES = {
    f"{base}{i}" for i in (1, 2, 3) for base in (
        "MobileNetV3s", "efficientnet_b0", "efficientnet_b1", "efficientnet_v2_s",
        "RegNety400", "resnet18", "resnet34", "resnet50", "mobilenet_v2",
        "wide_resnet50_2", "vgg11_bn", "convnext_tiny",
    )
}


def _resolve(a, symbols: dict):
    """Resolve YAML arg strings the way parse_model's guarded eval does."""
    if isinstance(a, str):
        if a in symbols:
            return symbols[a]
        low = a.lower()
        if low == "none":
            return None
        if low == "true":
            return True
        if low == "false":
            return False
        try:
            return int(a)
        except ValueError:
            pass
        try:
            return float(a)
        except ValueError:
            pass
        return a  # e.g. 'nearest'
    return a


# ---------------------------------------------------------------------------
# Per-module kwarg adapters: reference positional args (c1 stripped) -> kwargs
# ---------------------------------------------------------------------------

def _conv_kwargs(args, default_act):
    keys = ["c2", "k", "s", "p", "g", "d", "act"]
    kw = dict(zip(keys, args))
    if default_act is not None and kw.get("act", True) is True:
        kw["act"] = default_act
    return kw


def _adapt_args(name: str, args: list, n: int, default_act) -> Tuple[dict, int]:
    """Map positional YAML args to module kwargs. Returns (kwargs, n_repeats_left)."""
    a = list(args)
    act = default_act

    def actkw(kw):
        if act is not None and kw.get("act", True) is True:
            kw["act"] = act
        return kw

    if name in ("Conv", "SimConv"):
        return _conv_kwargs(a, act), n
    if name == "DWConv":
        return actkw(dict(zip(["c2", "k", "s", "d", "act"], a))), n
    if name == "Focus":
        return actkw(dict(zip(["c2", "k", "s", "p", "g", "act"], a))), n
    if name == "GhostConv":
        return actkw(dict(zip(["c2", "k", "s", "g", "act"], a))), n
    if name == "GhostBottleneck":
        return dict(zip(["c2", "k", "s"], a)), n
    if name == "Bottleneck":
        return actkw(dict(zip(["c2", "shortcut", "g", "e"], a))), n
    if name == "CrossConv":
        return dict(zip(["c2", "k", "s", "g", "e", "shortcut"], a)), n
    if name in _REPEAT_AS_N:
        # compiler moved row-repeat into kwargs as n
        kw = dict(zip(["c2", "n", "shortcut", "g", "e"], a))
        return actkw(kw), 1
    if name == "SegmentHead":
        kw = dict(zip(["nc", "width"], a))
        if act is not None:
            kw["act"] = act
        return kw, n
    if name == "C3SPP":
        return dict(zip(["c2", "k", "n", "shortcut", "g", "e"], a)), 1
    if name == "SPP":
        kw = dict(zip(["c2", "k"], a))
        if "k" in kw:
            kw["k"] = tuple(kw["k"])
        return kw, n
    if name in ("SPPF", "SimSPPF", "SimCSPSPPF"):
        return actkw(dict(zip(["c2", "k"], a))), n
    if name in ("SPPCSPC", "SPPCSPC_group"):
        kw = dict(zip(["c2", "n", "shortcut", "g", "e", "k"], a))
        if "k" in kw:
            kw["k"] = tuple(kw["k"])
        return kw, n
    if name == "ASPP":
        return dict(zip(["c2"], a)), n
    if name == "RFB":
        return dict(zip(["c2", "stride", "scale", "map_reduce", "vision", "groups"], a)), n
    if name == "GAM":
        return dict(zip(["c", "k", "s", "e"], a)), n
    if name in ("nn.Upsample", "Upsample"):
        return dict(zip(["size", "scale_factor", "mode"], a)), n
    if name == "MixConv2d":
        kw = dict(zip(["c2", "k", "s", "equal_ch"], a))
        if "k" in kw:
            kw["k"] = tuple(kw["k"])
        return kw, n
    if name == "Sum":
        return dict(zip(["n", "weight"], a)), 1  # n here = input count, not repeats
    if name == "Concat":
        return {"d": a[0] if a else 1}, n  # align flag added by parse_config
    if name in ("Contract", "Expand"):
        return {"gain": a[0] if a else 2}, n
    if name == "nn.BatchNorm2d":
        return {}, n
    if name == "nn.Softmax":
        return {"dim": a[0] if a else 1}, n
    if name in ("MaxPool2d", "nn.MaxPool2d"):
        return dict(zip(["k", "s", "p"], a)), n
    if name == "nn.ZeroPad2d":
        return {"padding": tuple(a[0])}, n
    if name == "TransformerBlock":
        return dict(zip(["c2", "num_heads", "num_layers"], a)), n
    if name in ("nn.ConvTranspose2d", "DWConvTranspose2d"):
        return dict(zip(["c2", "k", "s", "p"], a)), n
    if name == "ResNetStem":
        kw = dict(zip(["c2"], a))
        if act is not None:
            kw["act"] = act
        return kw, n
    if name == "ResNetLayer":
        kw = dict(zip(["c2", "n", "stride", "block"], a))
        if act is not None:
            kw["act"] = act
        return kw, n
    if name == "VGGBlock":
        kw = dict(zip(["c2", "n", "pool"], a))
        if act is not None:
            kw["act"] = act
        return kw, n
    if name == "Classify":
        return dict(zip(["c2", "k", "s", "p", "g"], a)), n
    if name in ("DCNv2", "DCNV3_YoLo"):
        return actkw(dict(zip(["c2", "k", "s", "p", "g", "d", "act"], a))), n
    if name in ("AttentionConv", "AttentionStem"):
        # reference signature (c1, c2, kernel, stride, padding, groups)
        return dict(zip(["c2", "k", "s", "p", "groups"], a)), n
    if name in _TV_STAGES:
        return {"c2": a[0]}, n
    # default: pass positionals straight through as c2-first
    return dict(zip(["c2"], a)), n


# ---------------------------------------------------------------------------
# Compiler
# ---------------------------------------------------------------------------


def parse_config(d: dict, ch: int = 3, nc: Optional[int] = None,
                 anchors_override=None, verbose: bool = False) -> ModelSpec:
    """Compile a model-config dict into a ModelSpec (reference models/yolo.py:299-382)."""
    style = d.get("compiler", "detect" if d.get("anchors") is not None else "semantic")
    anchors = anchors_override if anchors_override is not None else d.get("anchors")
    model_nc = nc if (nc is not None and nc != d.get("nc")) else d["nc"]
    gd = d.get("depth_multiple", 1.0)
    gw = d.get("width_multiple", 1.0)
    default_act = d.get("activation")
    if style == "semantic" and default_act is None:
        default_act = "relu"

    na = (len(anchors[0]) // 2) if isinstance(anchors, list) else (anchors or 0)
    no = na * (model_nc + 5)

    symbols = {"nc": model_nc, "anchors": anchors, "None": None}
    layers: list[LayerSpec] = []
    save: set[int] = set()
    chs = [ch]
    c2 = ch

    rows = list(d["backbone"]) + list(d["head"])
    for i, (f, n, name, args) in enumerate(rows):
        name = str(name)
        args = [_resolve(a, symbols) for a in args]
        if style == "semantic":
            # The reference standalone builders ignore the `number` column and
            # read C3 repeats from args[1] (int(False) == 0, reference
            # seg_diceloss_Resnet50.py:655-663); C3 there has conv-only inners.
            if name == "C3":
                name = "C3Conv"
                n = int(args[1]) if len(args) > 1 else 1
                shortcut = bool(args[2]) if len(args) > 2 else False
                args = [args[0], n, shortcut] + list(args[3:])
                n = 1
            elif name in ("C2f", "C2f_DCN", "C3k2"):
                if len(args) > 1:
                    args[1] = int(args[1])
                n = 1
            elif name in ("ResNet50Layer", "ResNet18Layer", "ResNet34Layer"):
                block = "bottleneck" if name == "ResNet50Layer" else "basic"
                name = "ResNetLayer"
                args = list(args) + [block] if len(args) >= 3 else list(args) + [1, block][len(args) - 1:]
                if len(args) == 2:
                    args = [args[0], 1, 1, block]
            else:
                n = 1  # number column unused in the reference semantic builders
        n_ = n = max(round(n * gd), 1) if n > 1 else n

        def in_ch(fi):
            return chs[fi]

        if name in _CONVLIKE:
            c1 = in_ch(f if isinstance(f, int) else f[0])
            c2 = args[0]
            if style == "detect" and c2 != no:
                c2 = make_divisible(c2 * gw, 8)
            args = [c2, *args[1:]]
            if (name in _REPEAT_AS_N or name == "C3SPP") and style != "semantic":
                if name == "C3SPP":
                    args.insert(2, n)
                else:
                    args.insert(1, n)
                n = 1
        elif name == "nn.BatchNorm2d":
            c2 = in_ch(f)
            args = []
        elif name == "Concat":
            c2 = sum(in_ch(x) for x in f)
        elif name == "Sum":
            c2 = in_ch(f[0] if isinstance(f, (list, tuple)) else f)
        elif name == "SegmentHead":
            c2 = args[0]
        elif name in ("Detect", "Segment"):
            pass  # handled below
        elif name == "Contract":
            c2 = in_ch(f) * args[0] ** 2
        elif name == "Expand":
            c2 = in_ch(f) // args[0] ** 2
        elif name in _TV_STAGES:
            c2 = args[0]
        elif name == "ResNetStem":
            c2 = args[0]
        elif name == "ResNetLayer":
            c2 = args[0]
        elif name == "VGGBlock":
            c2 = args[0]
        elif name == "GAM":
            c2 = in_ch(f)
            args = [c2, *args[1:]] if args else [c2]
        elif name == "Classify":
            c2 = args[0]
        else:
            c2 = in_ch(f if isinstance(f, int) else f[0])

        if name in ("Detect", "Segment"):
            head_anchors = args[1]
            n_levels = len(head_anchors) if isinstance(head_anchors, list) else None
            if name == "Detect" and n_levels and len(f) == 2 * n_levels:
                name = "DetectAux"  # AuxOTA dual-head config (loss/yolov5n_auxota.yaml)
            ch_list = tuple(in_ch(x) for x in f)
            if isinstance(head_anchors, int):
                # AutoAnchor placeholder: `anchors: 3` means 3 anchors per level,
                # evolved later (reference models/yolo.py:337-338)
                head_anchors = [list(range(head_anchors * 2))] * len(f)
            n_str = len(f) // 2 if name == "DetectAux" else len(f)
            kw = {"nc": args[0], "anchors": _freeze(head_anchors),
                  "strides": tuple(2 ** (3 + j) for j in range(n_str))}
            if name == "Segment":
                kw["nm"] = args[2] if len(args) > 2 else 32
                kw["npr"] = make_divisible(args[3] * gw, 8) if len(args) > 3 else 256
            c2 = 0
            kwargs = kw
        else:
            kwargs, n = _adapt_args(name, args, n, default_act)
            if name == "Concat" and style == "semantic":
                kwargs["align"] = True

        fi = f if isinstance(f, int) else tuple(f)
        layers.append(LayerSpec(i=i, f=fi, n=n, name=name, kwargs=_freeze(kwargs), c2=c2))
        save.update(x % i for x in ([f] if isinstance(f, int) else f) if x != -1)
        if i == 0:
            chs = []
        chs.append(c2)
        if verbose:
            LOGGER.info(f"{i:>3}{str(fi):>18}{n_:>3}  {name:<20}{str(kwargs):<40}")

    anchors_t = _freeze(anchors) if isinstance(anchors, list) else ()
    return ModelSpec(
        layers=tuple(layers), nc=model_nc, ch_in=ch, save=tuple(sorted(save)),
        out_ch=tuple(chs), anchors=anchors_t, strides=(), style=style,
        default_act=default_act, n_backbone=len(d["backbone"]),
    )


def with_strides(spec: ModelSpec, strides: Sequence[int]) -> ModelSpec:
    """Return a copy of `spec` with head strides fixed and anchor order checked.

    The reference normalizes anchors by stride and reverses them if their order
    disagrees with the stride order (utils/autoanchor.py check_anchor_order);
    we keep anchors in pixel units but apply the same order correction.
    """
    layers = list(spec.layers)
    head = layers[-1]
    if head.name not in ("Detect", "Segment", "DetectAux"):
        return dataclasses.replace(spec, strides=tuple(strides))
    kw = dict(head.kwargs)
    anchors = [list(a) for a in kw["anchors"]]
    # check_anchor_order: compare mean anchor area per level against stride order
    areas = [sum(a[j] * a[j + 1] for j in range(0, len(a), 2)) / (len(a) // 2) for a in anchors]
    da = areas[-1] - areas[0]
    ds = strides[-1] - strides[0]
    if da and ds and (da > 0) != (ds > 0):
        LOGGER.info("Reversing anchor order to match stride order")
        anchors = anchors[::-1]
    kw["anchors"] = _freeze(anchors)
    kw["strides"] = tuple(int(s) for s in strides)
    layers[-1] = dataclasses.replace(head, kwargs=_freeze(kw))
    return dataclasses.replace(spec, layers=tuple(layers), strides=tuple(int(s) for s in strides))
