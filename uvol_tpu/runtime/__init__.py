from uvol_tpu.runtime.prefetch import PrefetchPool

__all__ = ["PrefetchPool"]
