from sags_tpu.ops import knn, rasterize  # noqa: F401
