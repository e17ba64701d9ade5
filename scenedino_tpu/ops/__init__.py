from scenedino_tpu.ops.kmeans import (  # noqa: F401
    kmeans_cosine_assign,
    kmeans_cosine_update,
    kmeans_fit,
    kmeans_plus_plus_init,
)
