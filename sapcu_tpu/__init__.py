"""sapcu_tpu — TPU-native self-supervised arbitrary-scale point-cloud upsampling via SNNs.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
PyTorch pipeline (GitHub: itz-sayak/C-Users-Sayakdutta-Self-Supervised-
Arbitrary-Scale-Point-Cloud-Upsampling-via-SNN), re-designed TPU-first:

- ``ops``      pure jittable point-cloud kernels (kNN, FPS, graph features,
               rotations, point-triangle distance, Chamfer/HD metrics)
- ``snn``      functional LIF/EIF neurons with surrogate-gradient spikes
- ``nn``       minimal functional layer library (dense / batchnorm / etc.)
- ``models``   fn (normal estimation) and fd (distance estimation) models
- ``data``     PU1K mesh + HDF5 datasets, legacy ShapeNet fields, augment
- ``train``    optax training loops mirroring trainfn.py / trainfd.py
- ``generate`` end-to-end jitted upsampling pipeline (generation.py analog)
- ``parallel`` jax.sharding mesh helpers (data-parallel train, seed-sharded
               inference)
- ``utils``    config loading, checkpoint I/O, logging
"""

__version__ = "0.1.0"
