"""Deformable-conv parity tests (the reference's own ops_dcnv3/test.py pattern:
fast path vs readable reference implementation)."""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# this environment's CPU backend uses reduced-precision matmuls by default;
# parity tests pin f32 accumulation (callers control precision the JAX way)
jax.config.update("jax_default_matmul_precision", "highest")

REFERENCE = Path("/root/reference")
DCNV3_PY = REFERENCE / "models" / "ops_dcnv3" / "build" / "lib.linux-x86_64-cpython-38"

torch = pytest.importorskip("torch")


def np_deform_conv2d(x, offset, mask, weight, bias, stride, padding, dilation, dg):
    """Direct-loop numpy oracle of torchvision deform_conv2d (NHWC, groups=1)."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    kk = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    out = np.zeros((b, ho, wo, cout), np.float64)
    offs = offset.reshape(b, ho, wo, dg, kk, 2)
    msk = mask.reshape(b, ho, wo, dg, kk)
    cpg = cin // dg

    def sample(bi, yy, xx, c0, c1):
        y0, x0 = int(np.floor(yy)), int(np.floor(xx))
        wy, wx = yy - y0, xx - x0
        acc = np.zeros(c1 - c0)
        for dy, fy in ((0, 1 - wy), (1, wy)):
            for dx, fx in ((0, 1 - wx), (1, wx)):
                yi, xi = y0 + dy, x0 + dx
                if 0 <= yi < h and 0 <= xi < w:
                    acc += fy * fx * x[bi, yi, xi, c0:c1]
        return acc

    for bi in range(b):
        for oy in range(ho):
            for ox in range(wo):
                for g in range(dg):
                    for k in range(kk):
                        kyi, kxi = divmod(k, kw)
                        yy = oy * stride - padding + kyi * dilation + offs[bi, oy, ox, g, k, 0]
                        xx = ox * stride - padding + kxi * dilation + offs[bi, oy, ox, g, k, 1]
                        v = sample(bi, yy, xx, g * cpg, (g + 1) * cpg) * msk[bi, oy, ox, g, k]
                        out[bi, oy, ox] += v @ weight[kyi, kxi, g * cpg:(g + 1) * cpg, :]
    return out + bias


def test_deform_conv2d_vs_numpy_oracle(rng):
    from yolo_dual_tpu.nn.dcn import deform_conv2d_v2
    b, h, w, cin, cout, k = 1, 6, 7, 4, 5, 3
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    offset = (rng.standard_normal((b, h, w, 2 * k * k)) * 1.5).astype(np.float32)
    mask = rng.uniform(0, 1, (b, h, w, k * k)).astype(np.float32)
    weight = rng.standard_normal((k, k, cin, cout)).astype(np.float32)
    bias = rng.standard_normal(cout).astype(np.float32)
    ours = np.asarray(deform_conv2d_v2(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
                                       jnp.asarray(weight), jnp.asarray(bias), 1, 1, 1, 1, 1))
    ref = np_deform_conv2d(x.astype(np.float64), offset.astype(np.float64),
                           mask.astype(np.float64), weight.astype(np.float64),
                           bias.astype(np.float64), 1, 1, 1, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not DCNV3_PY.exists(), reason="reference DCNv3 python build unavailable")
def test_dcnv3_core_vs_reference_oracle(rng):
    """Exactly the reference's own test strategy (ops_dcnv3/test.py): compare
    the fast kernel against dcnv3_core_pytorch."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_dcnv3_func", DCNV3_PY / "functions" / "dcnv3_func.py")
    # the module imports the compiled DCNv3 ext at top level; stub it
    import types
    sys.modules.setdefault("DCNv3", types.ModuleType("DCNv3"))
    sys.modules.setdefault("torch.cuda.amp", sys.modules.get("torch.cuda.amp") or torch.cuda.amp)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from yolo_dual_tpu.nn.dcn import dcnv3_core
    b, h, w, g, gc, k = 2, 8, 9, 2, 4, 3
    c = g * gc
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    offset = (rng.standard_normal((b, h, w, g * k * k * 2)) * 2).astype(np.float32)
    mask_logits = rng.standard_normal((b, h, w, g, k * k)).astype(np.float32)
    mask = torch.tensor(mask_logits).softmax(-1).reshape(b, h, w, -1).numpy()

    ref = mod.dcnv3_core_pytorch(
        torch.tensor(x), torch.tensor(offset), torch.tensor(mask),
        k, k, 1, 1, 1, 1, 1, 1, g, gc, 1.0).numpy()
    ours = np.asarray(dcnv3_core(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
                                 k, 1, 1, 1, g, gc, 1.0))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_dcn_modules_build_and_run(rng):
    from yolo_dual_tpu.nn.dcn import C3_DCN, C2f_DCN, DCNV3_YoLo, C3_DCNV3
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
    for mod in (C3_DCN(16, n=1), C2f_DCN(16, n=1), DCNV3_YoLo(16, 3, 1), C3_DCNV3(16, n=1)):
        v = mod.init(jax.random.PRNGKey(0), x, train=False)
        y = mod.apply(v, x, train=False)
        assert y.shape == x.shape and np.isfinite(np.asarray(y)).all(), type(mod).__name__


def test_dcn_zoo_configs_now_build():
    """yolov5n-DCN + the DCN-using semantic configs compile now."""
    from test_model_zoo import _shape_probe, CFG
    for name in ("backbone/yolov5n-DCN.yaml", "semantic/yolov5_seg.yaml", "semantic/yolov8_seg.yaml"):
        spec, out = _shape_probe(CFG / name, imgsz=64)
        assert spec.layers
