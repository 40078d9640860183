from flypylib_tpu.infer.tiled import TiledInference, infer_volume

__all__ = ["TiledInference", "infer_volume"]
