"""COCO RLE codec + predictions-JSON tests (reference segment/val.py:57-88
save_one_json / pycocotools format). pycocotools is optional in this image;
the codec is verified by round-trip through our own decoder (an independent
transcription of maskApi.c rleFrString/rleDecode), hand-checked vectors, and
— when pycocotools IS importable — bit-exactness against its encoder."""

import json

import numpy as np
import pytest

from yolo_dual_tpu.utils.coco import (
    binary_mask_to_rle,
    coco80_to_coco91_class,
    rle_to_binary_mask,
    save_one_json,
    write_predictions_json,
)


def test_rle_hand_vectors():
    # single foreground pixel: column-major runs [0,1] -> chars '0','1'
    rle = binary_mask_to_rle(np.ones((1, 1), np.uint8))
    assert rle == {"size": [1, 1], "counts": "01"}
    # all-zero mask: one run of h*w zeros
    rle0 = binary_mask_to_rle(np.zeros((2, 3), np.uint8))
    assert rle0["size"] == [2, 3]
    assert not rle_to_binary_mask(rle0).any()


@pytest.mark.parametrize("shape", [(1, 1), (7, 5), (13, 17), (64, 48)])
def test_rle_roundtrip_random(shape, rng):
    m = (rng.uniform(size=shape) > 0.6).astype(np.uint8)
    rle = binary_mask_to_rle(m)
    back = rle_to_binary_mask(rle)
    np.testing.assert_array_equal(back, m)
    # counts string only uses the 6-bit alphabet (48..111)
    assert all(48 <= ord(c) < 112 for c in rle["counts"])


def test_rle_matches_pycocotools_if_available(rng):
    pycoco = pytest.importorskip("pycocotools.mask")
    m = (rng.uniform(size=(33, 21)) > 0.5).astype(np.uint8)
    ref = pycoco.encode(np.asfortranarray(m))
    rle = binary_mask_to_rle(m)
    assert rle["counts"] == ref["counts"].decode("utf-8")
    assert rle["size"] == list(ref["size"])


def test_rle_large_runs(rng):
    """Runs long enough to need multi-char LEB encoding + negative deltas."""
    m = np.zeros((200, 200), np.uint8)
    m[50:150, :] = 1  # long alternating column runs: 50 zeros,100 ones,50 zeros
    rle = binary_mask_to_rle(m)
    np.testing.assert_array_equal(rle_to_binary_mask(rle), m)


def test_save_one_json_and_write(tmp_path, rng):
    jdict = []
    boxes = np.array([[10.0, 20.0, 110.0, 80.0], [5.0, 5.0, 25.0, 45.0]])
    scores = np.array([0.9, 0.4])
    classes = np.array([0.0, 2.0])
    masks = (rng.uniform(size=(2, 60, 60)) > 0.5).astype(np.uint8)
    save_one_json(jdict, "000123.jpg", boxes, scores, classes, pred_masks=masks,
                  class_map=coco80_to_coco91_class())
    assert len(jdict) == 2
    e = jdict[0]
    assert e["image_id"] == 123                      # numeric stem -> int id
    assert e["category_id"] == 1                     # coco80[0] -> 91-id 1
    assert e["bbox"] == [10.0, 20.0, 100.0, 60.0]    # xyxy -> xywh top-left
    assert e["score"] == 0.9
    np.testing.assert_array_equal(rle_to_binary_mask(e["segmentation"]), masks[0])
    assert jdict[1]["category_id"] == 3
    out = write_predictions_json(jdict, tmp_path)
    loaded = json.loads(out.read_text())
    assert loaded[0]["image_id"] == 123 and "segmentation" in loaded[0]


def test_coco91_map_shape():
    cm = coco80_to_coco91_class()
    assert len(cm) == 80 and cm[0] == 1 and cm[-1] == 90
