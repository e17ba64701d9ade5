from scenedino_tpu.models.field import EncoderDummy, FieldConfig, SceneField, SceneState  # noqa: F401
from scenedino_tpu.models.heads import ImplicitNet, ResnetFC, make_head  # noqa: F401
