from .inject import ChaosConfig, inject_map_chaos, inject_reduce_chaos, inject_heavy_key

__all__ = ["ChaosConfig", "inject_map_chaos", "inject_reduce_chaos", "inject_heavy_key"]
