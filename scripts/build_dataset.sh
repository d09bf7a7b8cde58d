#!/usr/bin/env bash
# Dataset build driver (scripts/dataset_shapenet/build-fn.sh / build-fd.sh
# analog): generates self-supervised fn + fd ground truth for a mesh
# directory and audits the outputs.
#
# Usage: scripts/build_dataset.sh <mesh_dir> <out_root> [n_surface] [n_rd]
set -euo pipefail

MESH_DIR=${1:?mesh dir}
OUT_ROOT=${2:?output root}
N_SURFACE=${3:-800000}
N_RD=${4:-100000}

HERE=$(dirname "$0")

mkdir -p "$OUT_ROOT/fn" "$OUT_ROOT/fd"

echo "== fn ground truth (pseudo-normals) =="
python "$HERE/sample_mesh_fn.py" --mesh-dir "$MESH_DIR" \
    --out-dir "$OUT_ROOT/fn" --n-surface "$N_SURFACE"

echo "== fd ground truth (distance labels) =="
python "$HERE/sample_mesh_rd.py" --mesh-dir "$MESH_DIR" \
    --out-dir "$OUT_ROOT/fd" --n-samples "$N_RD"

echo "== audit =="
python "$HERE/scan_gt_normals.py" --dir "$OUT_ROOT"
