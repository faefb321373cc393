#!/usr/bin/env bash
# Dataset setup: VQA-v2 QA JSONs + bottom-up-attention features, then pack
# the features into the fp16 memmap cache the TPU input pipeline reads.
# (Reference equivalent: setup.sh — downloads the same five QA zips and
# three BUTD feature tarballs.)
set -euo pipefail

DATASET_DIR=${DATASET_DIR:-./datasets/vqa}
FEATURE_DIR=${FEATURE_DIR:-./datasets/coco_extract}
CACHE_DIR=${CACHE_DIR:-./datasets/feature_cache}

mkdir -p "$DATASET_DIR" "$FEATURE_DIR"

QA_URLS=(
  https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/v2_Questions_Train_mscoco.zip
  https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/v2_Questions_Val_mscoco.zip
  https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/v2_Questions_Test_mscoco.zip
  https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/v2_Annotations_Train_mscoco.zip
  https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/v2_Annotations_Val_mscoco.zip
)

for url in "${QA_URLS[@]}"; do
  f="$DATASET_DIR/$(basename "$url")"
  [ -f "$f" ] || wget -O "$f" "$url"
  unzip -o -d "$DATASET_DIR" "$f"
done

# Bottom-up-attention features (per-image npz archives; ~60GB total).
# Mirror locations change over time — see the MCAN-VQA README ("BUTD
# features") for current links; place the tarballs in $FEATURE_DIR first.
for tarball in train2014 val2014 test2015; do
  t="$FEATURE_DIR/${tarball}.tar.gz"
  if [ -f "$t" ]; then
    tar -xzf "$t" -C "$FEATURE_DIR"
  else
    echo "note: $t not present; download the BUTD ${tarball} features first"
  fi
done

# Pack features into the fp16 memmap cache (fast TPU-host input path).
for split in train val test; do
  python -m mcan_vqa_tpu.cli.pack_features --split "$split" \
    --feature_path "$FEATURE_DIR" --cache_path "$CACHE_DIR" || true
done

echo "setup complete"
