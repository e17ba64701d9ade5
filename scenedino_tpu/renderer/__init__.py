from scenedino_tpu.renderer.nerf import RenderConfig, render_rays  # noqa: F401
