"""Streaming-prediction engine tests: video in -> annotated video out
(reference segment/predict.py:189-216 VideoWriter path), source dispatch."""

from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

ANCHORS = [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119],
           [116, 90, 156, 198, 373, 326]]


def _tiny_seg_model():
    from yolo_dual_tpu.models.model import SegmentationModel
    cfg = dict(
        nc=2, depth_multiple=0.33, width_multiple=0.125,
        anchors=[list(a) for a in ANCHORS],
        backbone=[
            [-1, 1, "Conv", [64, 6, 2, 2]], [-1, 1, "Conv", [128, 3, 2]],
            [-1, 1, "C3", [128]], [-1, 1, "Conv", [256, 3, 2]], [-1, 1, "C3", [256]],
            [-1, 1, "Conv", [512, 3, 2]], [-1, 1, "C3", [512]],
            [-1, 1, "Conv", [1024, 3, 2]], [-1, 1, "C3", [1024]], [-1, 1, "SPPF", [1024, 5]],
        ],
        head=[
            [-1, 1, "Conv", [512, 1, 1]], [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
            [[-1, 6], 1, "Concat", [1]], [-1, 1, "C3", [512, False]],
            [-1, 1, "Conv", [256, 1, 1]], [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
            [[-1, 4], 1, "Concat", [1]], [-1, 1, "C3", [256, False]],
            [-1, 1, "Conv", [256, 3, 2]], [[-1, 14], 1, "Concat", [1]], [-1, 1, "C3", [512, False]],
            [-1, 1, "Conv", [512, 3, 2]], [[-1, 10], 1, "Concat", [1]], [-1, 1, "C3", [1024, False]],
            [[17, 20, 23], 1, "Segment", ["nc", "anchors", 8, 32]],
        ],
    )
    model = SegmentationModel(cfg)
    variables = model.init(imgsz=64)
    return model, variables


def _write_clip(path, n_frames=4, size=(96, 80), fps=10):
    wtr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
    rng = np.random.default_rng(0)
    for i in range(n_frames):
        frame = rng.integers(0, 255, (size[1], size[0], 3), dtype=np.uint8)
        cv2.rectangle(frame, (10 + 5 * i, 10), (50 + 5 * i, 50), (255, 255, 255), -1)
        wtr.write(frame)
    wtr.release()
    assert path.exists() and path.stat().st_size > 0


def test_video_in_annotated_video_out(tmp_path):
    from yolo_dual_tpu.engine import predict_images
    clip = tmp_path / "clip.mp4"
    _write_clip(clip, n_frames=4)
    model, variables = _tiny_seg_model()
    nm = model.spec.layers[-1].kw()["nm"]
    save_dir = tmp_path / "out"
    results = predict_images(model, variables, clip, imgsz=64, conf_thres=0.01,
                             nm=nm, save_dir=str(save_dir), save_img=True,
                             save_txt=True)
    assert len(results) == 4  # one result per frame, not last-frame-only
    # per-frame label files (reference txt_path + f'_{frame}'), not one
    # interleaved file
    label_files = sorted(p.name for p in Path(str(save_dir)).parent
                         .rglob("labels/*.txt"))
    if any(len(r) for r in results):
        assert label_files == [f"clip_{i}.txt" for i in range(1, 5) if len(results[i - 1])], \
            label_files
    outs = list(Path(str(save_dir)).parent.rglob("clip.mp4"))
    # predict_images increments save_dir; find the written clip under it
    outs = [p for p in outs if p != clip]
    assert outs, "annotated output video missing"
    cap = cv2.VideoCapture(str(outs[0]))
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.release()
    assert n == 4, f"expected 4 frames in output video, got {n}"
    assert (w, h) == (96, 80)  # native resolution, not letterboxed


def test_iter_source_vid_stride_and_max_frames(tmp_path):
    from yolo_dual_tpu.engine.predictor import iter_source
    clip = tmp_path / "clip2.mp4"
    _write_clip(clip, n_frames=6)
    frames = list(iter_source(clip, vid_stride=2))
    assert len(frames) == 3
    assert all(f[2] is not None for f in frames)  # fps set for video frames
    frames = list(iter_source(clip, max_frames=2))
    assert len(frames) == 2


def test_iter_source_stream_detection():
    from yolo_dual_tpu.data.streams import is_screenshot_source, is_stream_source
    assert is_stream_source("0")
    assert is_stream_source("rtsp://cam/live")
    assert is_stream_source("lists.streams")
    assert not is_stream_source("data/images")
    assert is_screenshot_source("screen 0 0 0 640 480")
    assert not is_screenshot_source("screenshots/")


def test_save_one_box_crops_and_increments(tmp_path):
    """save_one_box crops with gain/pad and increments existing filenames
    (reference utils/plots.py:560)."""
    import numpy as np
    from yolo_dual_tpu.utils.plots import save_one_box

    im = np.random.default_rng(0).integers(0, 255, (80, 90, 3), dtype=np.uint8)
    f = tmp_path / "crops" / "person" / "img.jpg"
    c1 = save_one_box([20, 20, 40, 50], im, file=f)
    assert c1.shape[0] > 30 and c1.shape[1] > 20          # gain+pad expanded
    assert f.exists()
    save_one_box([20, 20, 40, 50], im, file=f)            # second call increments
    assert (tmp_path / "crops" / "person" / "img2.jpg").exists()
    sq = save_one_box([20, 20, 40, 50], im, square=True, save=False)
    assert sq.shape[0] == sq.shape[1]


def test_predict_device_preprocess_matches_host(tmp_path):
    """Pallas letterbox path (device_preprocess=True, interpret on CPU) is a
    drop-in for the host cv2 letterbox: same detection count on an image
    whose aspect ratio forces real letterbox padding."""
    from yolo_dual_tpu.engine import predict_images
    img = np.random.default_rng(1).integers(0, 255, (48, 96, 3), dtype=np.uint8)
    p = tmp_path / "img.jpg"
    cv2.imwrite(str(p), img)
    model, variables = _tiny_seg_model()
    nm = model.spec.layers[-1].kw()["nm"]
    host = predict_images(model, variables, p, imgsz=64, conf_thres=0.01, nm=nm,
                          save_dir=str(tmp_path / "h"), save_img=False,
                          device_preprocess=False)
    dev = predict_images(model, variables, p, imgsz=64, conf_thres=0.01, nm=nm,
                         save_dir=str(tmp_path / "d"), save_img=False,
                         device_preprocess=True)
    assert len(host) == len(dev) == 1
    # random weights near conf threshold can flip a detection either way at
    # the pixel-level resize difference (cv2 vs matmul bilinear); counts must
    # stay close and box geometry of shared detections must agree coarsely
    assert abs(host[0].shape[0] - dev[0].shape[0]) <= max(2, host[0].shape[0] // 2)
