#!/usr/bin/env bash
# Reorganize built fd labels into the legacy dataset layout
# (<OUTPUT_PATH>/<class>/<model>/fd.npz) consumed by data/legacy.py.
set -euo pipefail
HERE=$(cd "$(dirname "$0")" && pwd)
source "$HERE/config.sh"
mkdir -p "$OUTPUT_PATH"

for c in $CLASSES; do
  echo "Parsing class $c"
  build_c=$BUILD_PATH/$c
  out_c=$OUTPUT_PATH/$c
  mkdir -p "$out_c"
  for f in "$build_c"/4_fd/*_fd.npz; do
    [ -e "$f" ] || continue
    m=$(basename "$f" _fd.npz)
    mkdir -p "$out_c/$m"
    cp "$f" "$out_c/$m/fd.npz"
    echo "Copying model $out_c/$m"
  done
done
