#!/bin/bash
# Download full COCO 2017 (images + YOLO labels) into datasets/ (reference data/scripts/get_coco.sh).
set -e
[ "${YOLO_DUAL_TPU_OFFLINE:-0}" = "1" ] && { echo "offline mode"; exit 1; }
d='datasets/coco'
mkdir -p $d/images
curl -L https://github.com/ultralytics/yolov5/releases/download/v1.0/coco2017labels-segments.zip -o $d/labels.zip --retry 3
unzip -o -q $d/labels.zip -d datasets && rm $d/labels.zip
for f in train2017.zip val2017.zip test2017.zip; do
  curl -L http://images.cocodataset.org/zips/$f -o $d/images/$f --retry 3
  unzip -o -q $d/images/$f -d $d/images && rm $d/images/$f
done
