from scenedino_tpu.eval import metrics, sscbench  # noqa: F401
