"""Instance-segmentation streaming prediction CLI.

Equivalent of reference segment/predict.py:53-263: images/dirs/videos in,
annotated images + optional txt out, per-stage speed report.

Usage:
    python segment/predict.py --weights runs/train-seg/exp/best --source data/images
"""

import argparse
import sys
from pathlib import Path

FILE = Path(__file__).resolve()
ROOT = FILE.parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from yolo_dual_tpu.engine import predict_images
from yolo_dual_tpu.utils.general import check_img_size

sys.path.insert(0, str(ROOT / "segment"))
from val import find_cfg, load_model_and_weights  # noqa: E402


def run(weights="", cfg="yolov5s-seg.yaml", source="data/images", imgsz=640,
        conf_thres=0.25, iou_thres=0.45, max_det=300, classes=None,
        agnostic_nms=False, retina_masks=False, project="runs/predict-seg",
        name="exp", save_txt=False, nosave=False, line_thickness=3,
        hide_labels=False, hide_conf=False, soft_nms=False, nc=80, data=None,
        augment=False, vid_stride=1, max_frames=None, view_img=False,
        fuse=True, save_crop=False, device="", save_conf=False, exist_ok=False,
        visualize=False, update=False, half=False, **kw):
    from yolo_dual_tpu.utils.general import select_device
    select_device(device)
    if update and weights and not str(weights).endswith(".pt"):
        # reference --update: strip optimizer state from the weights file
        # (predict.py:266 → strip_optimizer)
        from yolo_dual_tpu.train.checkpoint import strip_optimizer
        strip_optimizer(weights)
    imgsz = check_img_size(imgsz, 32)
    if data:
        from yolo_dual_tpu.utils.general import check_dataset
        # names/nc only — prediction must not demand the val split on disk
        d = check_dataset(find_cfg(data, "data"), require_splits=False)
        nc = int(d["nc"])
        names = d.get("names")
    else:
        names = None
    model, variables = load_model_and_weights(weights, cfg, nc, imgsz)
    head_kw = model.spec.layers[-1].kw()
    return predict_images(
        model, variables, source, imgsz=imgsz, conf_thres=conf_thres,
        iou_thres=iou_thres, max_det=max_det, nm=head_kw.get("nm", 32),
        classes=classes, agnostic_nms=agnostic_nms, retina_masks=retina_masks,
        save_dir=str(Path(project) / name), save_txt=save_txt, save_img=not nosave,
        names=names, line_thickness=line_thickness, hide_labels=hide_labels,
        hide_conf=hide_conf, use_soft_nms=soft_nms, augment=augment,
        vid_stride=vid_stride, max_frames=max_frames, view_img=view_img, fuse=fuse,
        save_crop=save_crop, save_conf=save_conf, exist_ok=exist_ok,
        visualize=visualize)


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--cfg", type=str, default="yolov5s-seg.yaml")
    p.add_argument("--source", type=str, default=str(ROOT / "data" / "images"))
    p.add_argument("--data", type=str, default=None, help="dataset yaml for class names")
    p.add_argument("--imgsz", "--img", "--img-size", type=int, default=640)
    p.add_argument("--conf-thres", type=float, default=0.25)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--classes", nargs="+", type=int)
    p.add_argument("--agnostic-nms", action="store_true")
    p.add_argument("--retina-masks", action="store_true")
    p.add_argument("--project", default=str(ROOT / "runs" / "predict-seg"))
    p.add_argument("--name", default="exp")
    p.add_argument("--save-txt", action="store_true")
    p.add_argument("--save-conf", action="store_true", help="include confidence in txt rows")
    p.add_argument("--exist-ok", action="store_true")
    p.add_argument("--visualize", action="store_true", help="save per-layer feature maps for the first frame")
    p.add_argument("--update", action="store_true", help="strip optimizer from --weights")
    p.add_argument("--half", action="store_true", help="accepted for parity (fused path runs bf16 on TPU)")
    p.add_argument("--dnn", action="store_true", help="accepted for parity (OpenCV-DNN N/A)")
    p.add_argument("--nosave", action="store_true")
    p.add_argument("--line-thickness", type=int, default=3)
    p.add_argument("--hide-labels", action="store_true")
    p.add_argument("--hide-conf", action="store_true")
    p.add_argument("--soft-nms", action="store_true")
    p.add_argument("--augment", action="store_true", help="TTA: multi-scale + flip inference")
    p.add_argument("--vid-stride", type=int, default=1, help="video frame-rate stride")
    p.add_argument("--max-frames", type=int, default=None, help="stop streams after N frames")
    p.add_argument("--view-img", action="store_true", help="show annotated frames live")
    p.add_argument("--no-fuse", dest="fuse", action="store_false",
                   help="disable conv+BN inference folding")
    p.add_argument("--save-crop", action="store_true",
                   help="save per-detection crops under crops/<class>/")
    p.add_argument("--nc", type=int, default=80)
    p.add_argument("--device", default="", help="parity flag")
    return p.parse_args(argv)


if __name__ == "__main__":
    run(**vars(parse_opt()))
