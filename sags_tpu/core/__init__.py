from sags_tpu.core import camera, config, sh, transforms  # noqa: F401
