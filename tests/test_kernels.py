"""Pallas kernel parity tests (interpret mode on CPU): kernel vs readable
reference — the reference's own ops_dcnv3/test.py strategy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")


def test_dcnv3_pallas_matches_lax_core(rng):
    from yolo_dual_tpu.kernels.dcn_sampling import _dcnv3_pallas_impl
    from yolo_dual_tpu.nn.dcn import dcnv3_core

    b, h, w, g, gc, k = 1, 8, 8, 2, 4, 3
    c = g * gc
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    offset = (rng.standard_normal((b, h, w, g * k * k * 2)) * 2).astype(np.float32)
    mask_logits = rng.standard_normal((b, h, w, g, k * k)).astype(np.float32)
    mask = np.exp(mask_logits) / np.exp(mask_logits).sum(-1, keepdims=True)
    mask = mask.reshape(b, h, w, -1).astype(np.float32)

    ref = np.asarray(dcnv3_core(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
                                k, 1, 1, 1, g, gc, 1.0))
    ours = np.asarray(_dcnv3_pallas_impl(jnp.asarray(x), jnp.asarray(offset),
                                         jnp.asarray(mask), k, 1, g, gc, 1.0,
                                         interpret=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_dcnv3_pallas_fallback_for_large_shapes(rng):
    from yolo_dual_tpu.kernels.dcn_sampling import dcnv3_core_pallas
    x = rng.standard_normal((1, 96, 96, 8)).astype(np.float32)
    offset = np.zeros((1, 96, 96, 18), np.float32)
    mask = np.full((1, 96, 96, 9), 1 / 9, np.float32)
    out = dcnv3_core_pallas(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
                            3, 1, 1, 1, 1, 8, 1.0)
    assert out.shape == x.shape  # lax fallback path


def test_letterbox_normalize_kernel(rng):
    from yolo_dual_tpu.kernels.preprocess import (
        letterbox_normalize, letterbox_normalize_reference)
    imgs = rng.integers(0, 255, (2, 48, 64, 3), dtype=np.uint8)
    ref = letterbox_normalize_reference(imgs, out_size=64)
    out = np.asarray(letterbox_normalize(jnp.asarray(imgs), out_size=64, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    # aspect preserved: vertical gray bars for a 48x64 input resized to 64
    assert np.allclose(out[:, :8], 114 / 255, atol=1e-5)
    assert np.allclose(out[:, -8:], 114 / 255, atol=1e-5)


def test_letterbox_normalize_matches_cv2_semantics(rng):
    """Against the CPU letterbox (cv2 INTER_LINEAR) the fused kernel should be
    close (not bit-equal: cv2 uses fixed-point interpolation)."""
    import cv2
    from yolo_dual_tpu.data.augment import letterbox
    from yolo_dual_tpu.kernels.preprocess import letterbox_normalize
    img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
    cpu, _, _ = letterbox(img, 128, auto=False)
    dev = np.asarray(letterbox_normalize(jnp.asarray(img[None]), out_size=128,
                                         interpret=True))[0]
    diff = np.abs(cpu.astype(np.float32) / 255.0 - dev)
    assert np.percentile(diff, 99) < 0.02, np.percentile(diff, 99)
