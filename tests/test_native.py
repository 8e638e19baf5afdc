"""Native C++ component tests: build, parity with json.loads, speed sanity."""

import json
import time

import numpy as np
import pytest


def _record(rng, h=120, w=160):
    mask = rng.integers(0, 12, (h, w)).astype(np.uint8)
    rec = {"filename": "x.png", "shape": [h, w], "dtype": "uint8",
           "class_names": ["a", "b"], "mask_data": mask.flatten().tolist()}
    return mask, json.dumps(rec).encode()


def test_fastmask_builds_and_matches_json(rng):
    from yolo_dual_tpu.native import _load, parse_mask_json_bytes
    mask, data = _record(rng)
    out = parse_mask_json_bytes(data)
    np.testing.assert_array_equal(out, mask)
    if _load() is None:
        pytest.skip("native toolchain unavailable; fallback verified")


def test_fastmask_is_faster_than_json(rng):
    from yolo_dual_tpu.native import _load
    mod = _load()
    if mod is None:
        pytest.skip("native module unavailable")
    mask, data = _record(rng, 480, 640)
    t0 = time.perf_counter()
    for _ in range(3):
        mod.parse_mask_json(data)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        d = json.loads(data)
        np.asarray(d["mask_data"], np.uint8)
    t_py = time.perf_counter() - t0
    assert t_native < t_py, (t_native, t_py)


def test_fastmask_error_paths(rng):
    from yolo_dual_tpu.native import _load
    mod = _load()
    if mod is None:
        pytest.skip("native module unavailable")
    with pytest.raises(ValueError):
        mod.parse_mask_json(b'{"nope": 1}')
    with pytest.raises(ValueError):
        mod.parse_mask_json(b'{"shape": [4, 4], "mask_data": [1, 2]}')
    # values clamp to uint8
    h, w, raw = mod.parse_mask_json(b'{"shape": [1, 3], "mask_data": [300, -5, 7]}')
    assert list(raw) == [255, 0, 7]
