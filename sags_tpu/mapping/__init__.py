from sags_tpu.mapping import gaussian_map  # noqa: F401
