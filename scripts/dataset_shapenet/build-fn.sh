#!/usr/bin/env bash
# Per-class fn ground-truth build (reference scripts/dataset_shapenet/
# build-fn.sh analog): pseudo-normal labels from watertight meshes.
set -euo pipefail
HERE=$(cd "$(dirname "$0")" && pwd)
source "$HERE/config.sh"
mkdir -p "$BUILD_PATH"

for c in $CLASSES; do
  echo "Processing class $c"
  build_path_c=$BUILD_PATH/$c
  mkdir -p "$build_path_c/4_fn"
  echo "Process watertight meshes"
  python "$HERE/../sample_mesh_fn.py" \
      --mesh-dir "$build_path_c/4_watertight_scaled" \
      --out-dir "$build_path_c/4_fn" \
      --n-surface "$N_SURFACE"
done
