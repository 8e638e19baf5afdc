"""SimOTA loss parity vs the reference ComputeLossOTA run live as oracle."""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

REFERENCE = Path("/root/reference")
torch = pytest.importorskip("torch")

from test_losses import ANCHORS_PX, HYP, STRIDES, _FakeModel, make_targets, rand_preds  # noqa


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout unavailable")
def test_ota_loss_parity():
    from test_torch_parity import _stub_torchvision
    _stub_torchvision()
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    import utils.loss_OTA as ref_mod
    RefOTA = ref_mod.ComputeLossOTA
    # reference rot: its bbox_iou returns (n,1) which modern torch refuses to
    # broadcast into tobj[b,a,gj,gi] (loss_OTA.py:291); squeeze like old torch did
    _orig_iou = ref_mod.bbox_iou
    ref_mod.bbox_iou = lambda *a, **k: _orig_iou(*a, **k).squeeze(-1)

    rng = np.random.default_rng(11)
    bs, nc, M = 2, 5, 6
    size = 64
    preds = rand_preds(rng, bs, nc, 0, size)
    tgts, tmask, flat = make_targets(rng, bs, M, nc)

    ref = RefOTA(_FakeModel(nc, HYP))
    imgs = torch.zeros(bs, 3, size, size)
    ref_loss, ref_items = ref([torch.tensor(p) for p in preds], torch.tensor(flat), imgs)

    from yolo_dual_tpu.losses.ota import ComputeLossOTA
    ours = ComputeLossOTA(ANCHORS_PX, STRIDES, nc, HYP)
    loss, items = ours([jnp.asarray(p) for p in preds], jnp.asarray(tgts),
                       jnp.asarray(tmask), imgsz=size)

    np.testing.assert_allclose(np.asarray(items), ref_items.numpy(), rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=5e-4)


def test_auxota_runs_and_is_finite():
    rng = np.random.default_rng(12)
    bs, nc, M = 2, 4, 5
    size = 64
    lead = rand_preds(rng, bs, nc, 0, size)
    aux = rand_preds(rng, bs, nc, 0, size)
    tgts, tmask, _ = make_targets(rng, bs, M, nc)

    from yolo_dual_tpu.losses.ota import ComputeLossAuxOTA
    loss_fn = ComputeLossAuxOTA(ANCHORS_PX, STRIDES, nc, HYP)
    loss, items = loss_fn([jnp.asarray(p) for p in lead + aux], jnp.asarray(tgts),
                          jnp.asarray(tmask), imgsz=size)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(items)).all()


def test_ota_gradients_flow():
    rng = np.random.default_rng(13)
    bs, nc, M = 1, 3, 4
    size = 64
    preds = rand_preds(rng, bs, nc, 0, size)
    tgts, tmask, _ = make_targets(rng, bs, M, nc)
    from yolo_dual_tpu.losses.ota import ComputeLossOTA
    loss_fn = ComputeLossOTA(ANCHORS_PX, STRIDES, nc, HYP)

    def f(ps):
        return loss_fn(ps, jnp.asarray(tgts), jnp.asarray(tmask), imgsz=size)[0]

    grads = jax.grad(f)([jnp.asarray(p) for p in preds])
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)
    assert any(float(jnp.abs(g).sum()) > 0 for g in grads)
