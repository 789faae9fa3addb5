from mspl_tpu.ops.resize import adaptive_avg_pool, resize_bilinear, resize_nearest

__all__ = ["adaptive_avg_pool", "resize_bilinear", "resize_nearest"]
