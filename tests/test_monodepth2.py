"""Monodepth2 legacy backbone: shapes + factory."""
import jax
import jax.numpy as jnp
import numpy as np

from scenedino_tpu.models.backbone_util import make_backbone
from scenedino_tpu.models.monodepth2 import Monodepth2


def test_monodepth2_multiscale_shapes():
    m = Monodepth2(d_out=32, scales=(0, 1, 2, 3))
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 64, 128)) * 2 - 1
    params = m.init(jax.random.PRNGKey(1), x)
    outs = m.apply(params, x)
    assert len(outs) == 4
    assert outs[0].shape == (1, 32, 64, 128)
    assert outs[1].shape == (1, 32, 32, 64)
    assert outs[3].shape == (1, 32, 8, 16)
    for o in outs:
        assert np.all(np.isfinite(np.asarray(o)))


def test_make_backbone_factory():
    m = make_backbone({"type": "monodepth2", "d_out": 16})
    assert m.latent_size == 16
    # ibrnet is a real legacy path since IBRNetWithNeuRay landed
    from scenedino_tpu.models.multi_view_head import IBRNetWithNeuRay

    ib = make_backbone({"type": "ibrnet", "att_feat": 8})
    assert isinstance(ib, IBRNetWithNeuRay)
    try:
        make_backbone({"type": "no_such_backbone"})
        assert False
    except NotImplementedError:
        pass
