#!/bin/bash
# Fetch CamVid and convert PNG masks to the JSON dense-mask format this
# framework trains from (see yolo_dual_tpu/data/json_dataset.py).
set -e
[ "${YOLO_DUAL_TPU_OFFLINE:-0}" = "1" ] && { echo "offline mode: place CamVid under datasets/camvid"; exit 1; }
echo "CamVid has no single canonical mirror; download it manually (e.g. the"
echo "Cambridge-driving set) into datasets/camvid/{train,val,test}/{images,masks}"
echo "then convert masks:"
echo "  python -c \"from yolo_dual_tpu.data import batch_convert_masks_to_json as c; c('datasets/camvid/train/masks','datasets/camvid/train/jsons')\""
