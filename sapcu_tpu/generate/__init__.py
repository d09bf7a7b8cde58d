from sapcu_tpu.generate.pipeline import Upsampler, normalize_pointcloud, refine_chunk

__all__ = ["Upsampler", "normalize_pointcloud", "refine_chunk"]
