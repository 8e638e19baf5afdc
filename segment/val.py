"""Instance-segmentation validation CLI (box + mask mAP50-95).

Equivalent of reference segment/val.py:128-465 with the same metric
definitions; supports reference .pt weights via the torch importer.

Usage:
    python segment/val.py --weights runs/train-seg/exp/best --data coco128-seg.yaml
    python segment/val.py --weights yolov5s-seg.pt --cfg yolov5s-seg.yaml --task val
"""

import argparse
import sys
from pathlib import Path

FILE = Path(__file__).resolve()
ROOT = FILE.parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

import jax
import numpy as np

from yolo_dual_tpu.data import create_dataloader
from yolo_dual_tpu.engine import evaluate_segment
from yolo_dual_tpu.models.model import SegmentationModel
from yolo_dual_tpu.utils.general import LOGGER, check_dataset, check_img_size, yaml_load

CONFIGS = ROOT / "yolo_dual_tpu" / "configs"


def find_cfg(name, *dirs):
    p = Path(name)
    if p.exists():
        return p
    for d in dirs:
        c = CONFIGS / d / name
        if c.exists():
            return c
    raise FileNotFoundError(f"config {name} not found")


def load_model_and_weights(weights, cfg, nc, imgsz):
    model = SegmentationModel(find_cfg(cfg, "segment", "models"), nc=nc)
    variables = model.init(imgsz=imgsz)
    if weights:
        from yolo_dual_tpu.io.weights import resolve_variables
        variables = resolve_variables(model, weights, variables)
    return model, variables


def run(data="coco128-seg.yaml", weights="", cfg="yolov5s-seg.yaml", batch_size=16,
        imgsz=640, conf_thres=0.001, iou_thres=0.6, max_det=300, task="val",
        single_cls=False, verbose=False, soft_nms=False, mask_ratio=4, plots=False,
        save_dir=None, augment=False, save_json=False, rect=False, cache=False,
        fuse=True, device="", save_txt=False, save_conf=False, save_hybrid=False,
        project="runs/val-seg", name="exp", exist_ok=False, data_parallel=False,
        no_download=False, device_preprocess=False, **kw):
    from yolo_dual_tpu.utils.general import increment_path, select_device
    select_device(device)
    mesh = None
    if data_parallel and jax.device_count() > 1:
        from yolo_dual_tpu.parallel import make_mesh
        mesh = make_mesh()
        if batch_size % mesh.devices.size:
            batch_size = -(-batch_size // mesh.devices.size) * mesh.devices.size
            LOGGER.info(f"--data-parallel: batch size rounded up to {batch_size} "
                        f"({mesh.devices.size} devices)")
    if save_dir is None:
        if save_txt or save_json or plots:
            save_dir = str(increment_path(Path(project) / name, exist_ok=exist_ok,
                                          mkdir=True))
        else:
            save_dir = "."
    data = check_dataset(find_cfg(data, "data"), autodownload=not no_download)
    imgsz = check_img_size(imgsz, 32)
    nc = 1 if single_cls else int(data["nc"])
    model, variables = load_model_and_weights(weights, cfg, nc, imgsz)
    loader, _ = create_dataloader(data[task if task in data else "val"], imgsz, batch_size,
                                  device_preprocess=device_preprocess,
                                  augment=False, mask_downsample_ratio=mask_ratio,
                                  overlap_mask=True, task="segment", single_cls=single_cls,
                                  rect=rect, cache_images=cache)
    head_kw = model.spec.layers[-1].kw()
    # COCO-91 category remap + annotation file for COCOeval (reference
    # segment/val.py:230,372-390)
    is_coco = "coco" in str(data.get("val", ""))
    class_map = None
    anno_json = None
    if save_json and is_coco:
        from yolo_dual_tpu.utils.coco import coco80_to_coco91_class
        class_map = coco80_to_coco91_class()
        cand = Path(str(data.get("path", ""))) / "annotations" / "instances_val2017.json"
        anno_json = cand if cand.exists() else None
    mean, maps, t = evaluate_segment(model, variables, loader, nc,
                                     conf_thres=conf_thres, iou_thres=iou_thres,
                                     max_det=max_det, nm=head_kw.get("nm", 32),
                                     mask_ratio=mask_ratio, names=data.get("names"),
                                     plots=plots, save_dir=save_dir,
                                     use_soft_nms=soft_nms, verbose=verbose,
                                     augment=augment, save_json=save_json,
                                     anno_json=anno_json, class_map=class_map,
                                     fuse=fuse, save_txt=save_txt,
                                     save_conf=save_conf, save_hybrid=save_hybrid,
                                     mesh=mesh)
    if save_txt:
        LOGGER.info(f"labels saved to {Path(save_dir) / 'labels'}")
    return mean, maps, t


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, default="coco128-seg.yaml")
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--cfg", type=str, default="yolov5s-seg.yaml")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--imgsz", "--img", "--img-size", type=int, default=640)
    p.add_argument("--save-txt", action="store_true", help="save results to labels/*.txt")
    p.add_argument("--save-conf", action="store_true", help="include confidence in txt rows")
    p.add_argument("--save-hybrid", action="store_true",
                   help="also write GT rows at conf 1.0 (autolabelling artifact)")
    p.add_argument("--project", default=str(ROOT / "runs" / "val-seg"))
    p.add_argument("--name", default="exp")
    p.add_argument("--exist-ok", action="store_true")
    p.add_argument("--dnn", action="store_true", help="accepted for parity (OpenCV-DNN N/A)")
    p.add_argument("--conf-thres", type=float, default=0.001)
    p.add_argument("--iou-thres", type=float, default=0.6)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--task", default="val", help="val, test, or speed/study sweeps")
    p.add_argument("--single-cls", action="store_true")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--soft-nms", action="store_true", help="Gaussian soft-NMS variant")
    p.add_argument("--augment", action="store_true", help="TTA: multi-scale + flip inference")
    p.add_argument("--save-json", action="store_true",
                   help="save COCO-RLE predictions.json (+COCOeval if pycocotools present)")
    p.add_argument("--mask-ratio", type=int, default=4)
    p.add_argument("--plots", action="store_true")
    p.add_argument("--rect", action="store_true",
                   help="aspect-bucket batching (static shape set; recovers padding FLOPs)")
    p.add_argument("--cache", type=str, default=False, nargs="?", const="ram",
                   help="image cache: ram or disk")
    p.add_argument("--no-fuse", dest="fuse", action="store_false",
                   help="disable conv+BN inference folding")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard eval batches over all devices (SPMD data-parallel val)")
    p.add_argument("--device", default="", help="parity flag (JAX selects devices)")
    p.add_argument("--workers", type=int, default=0, help="parity flag")
    p.add_argument("--half", action="store_true", help="parity flag (bf16 policy instead)")
    p.add_argument("--no-download", action="store_true",
                   help="refuse to execute the data yaml's download: hook")
    p.add_argument("--device-preprocess", action="store_true",
                   help="letterbox+normalize on the TPU (uniform-shape datasets: "
                        "CamVid, video frames) — the serving predictor's path")
    return p.parse_args(argv)


def main(opt):
    if opt.task == "speed":
        run(**{**vars(opt), "task": "val", "conf_thres": 0.25, "iou_thres": 0.45})
    elif opt.task == "study":
        # resolution sweep -> study_{data}_{weights}.txt rows of
        # [8 metrics, 3 times] + speed-vs-mAP plot (reference :454-465)
        f = f"study_{Path(opt.data).stem}_{Path(str(opt.weights)).stem}.txt"
        sizes, rows = list(range(256, 1536 + 128, 128)), []
        for sz in sizes:
            LOGGER.info(f"--- study imgsz {sz}")
            mean, _, t = run(**{**vars(opt), "task": "val", "imgsz": sz})
            rows.append(tuple(mean) + tuple(t))
        np.savetxt(f, rows, fmt="%10.4g")
        LOGGER.info(f"study saved to {f}")
        try:
            from yolo_dual_tpu.utils.plots import plot_val_study
            plot_val_study(dir=".", x=sizes)
        except Exception as e:
            LOGGER.info(f"study plot skipped: {e}")
    else:
        run(**vars(opt))


if __name__ == "__main__":
    main(parse_opt())
