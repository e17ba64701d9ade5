"""scenedino_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
feed-forward unsupervised semantic scene completion from a single image.

Built from scratch with the capabilities of tum-vision/scenedino (ICCV 2025):
a DINO/DINOv2 ViT encoder + DPT decoder produce a pixel-aligned 2D feature
map; 3D points are featurized by camera projection + bilinear lookup + a
positional code and mapped by a small MLP to volumetric density and a
distilled 3D DINO feature field. Volume rendering composites density into
depth / color / feature images; training is self-supervised multi-view
photometric + feature reconstruction; a second stage distills the feature
field into unsupervised semantics (STEGO correlation loss + cosine k-means).

Everything on the compute path is pure-functional jnp / Pallas under jit and
shards over a `jax.sharding.Mesh` for multi-chip execution.
"""

__version__ = "0.1.0"
