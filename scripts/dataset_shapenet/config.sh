# Shared configuration for the ShapeNet dataset build drivers.
# (The reference sources dataset_shapenet/config.sh but never ships it —
# a latent gap; these defaults make the drivers self-contained.)
INPUT_PATH=${INPUT_PATH:-data/ShapeNet.raw}
BUILD_PATH=${BUILD_PATH:-data/ShapeNet.build}
OUTPUT_PATH=${OUTPUT_PATH:-data/ShapeNet}
CLASSES=${CLASSES:-$(ls "$INPUT_PATH" 2>/dev/null || true)}
NPROC=${NPROC:-4}
TIMEOUT=${TIMEOUT:-180}
N_SURFACE=${N_SURFACE:-800000}
N_RD=${N_RD:-100000}
