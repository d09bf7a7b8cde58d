#!/usr/bin/env bash
# Per-class fd ground-truth build (reference scripts/dataset_shapenet/
# build-fd.sh analog): ray-distance labels from watertight meshes.
set -euo pipefail
HERE=$(cd "$(dirname "$0")" && pwd)
source "$HERE/config.sh"
mkdir -p "$BUILD_PATH"

for c in $CLASSES; do
  echo "Processing class $c"
  build_path_c=$BUILD_PATH/$c
  mkdir -p "$build_path_c/4_fd"
  echo "Process watertight meshes"
  python "$HERE/../sample_mesh_rd.py" \
      --mesh-dir "$build_path_c/4_watertight_scaled" \
      --out-dir "$build_path_c/4_fd" \
      --n-samples "$N_RD"
done
