from scenedino_tpu.core import cameras, compositing, encoding, grid_sample, rays, sampling  # noqa: F401
