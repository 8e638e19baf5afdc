#!/bin/bash
# Download the coco128-seg miniset into datasets/ (reference data/scripts/get_coco128.sh).
# Gated: refuses to run when YOLO_DUAL_TPU_OFFLINE=1.
set -e
[ "${YOLO_DUAL_TPU_OFFLINE:-0}" = "1" ] && { echo "offline mode: place coco128-seg under datasets/"; exit 1; }
d='datasets'
mkdir -p $d
for f in coco128-seg.zip; do
  url=https://github.com/ultralytics/yolov5/releases/download/v1.0/$f
  echo "Downloading $url ..."
  curl -L $url -o $d/$f --retry 3
  unzip -o -q $d/$f -d $d && rm $d/$f
done
