"""View-parallel multi-chip inference: sharded output must match the
single-device path (virtual 8-device CPU mesh, SURVEY.md §5.7)."""
import jax
import numpy as np
import pytest

from panfusion_tpu.models import PanFusion, PanFusionConfig

# slow tier: the session fixture compiles full sharded inference on the
# 8-virtual-device CPU mesh (~8 min cold on 1 CPU). The driver's
# __graft_entry__.dryrun_multichip exercises the sharded compile+execute
# path every round; the sharded==single numeric pins live here and in
# test_multichip_train_parity (also slow).
pytestmark = pytest.mark.slow

TINY = dict(
    pano_height=64,
    pers_resolution=64,
    num_views=4,  # gcd(4, 8 devices) = 4 -> (1, 4) mesh
    diff_timestep=4,
    latent_pad=1,
    unet_kwargs=dict(
        block_out_channels=(16, 32, 32, 32),
        layers_per_block=1,
        heads=(1, 1, 1, 1),
        dim_head=8,
        context_dim=16,
    ),
    vae_kwargs=dict(block_out_channels=(4, 8, 8, 8)),
    text_kwargs=dict(
        vocab_size=49408, hidden_size=16, intermediate_size=32,
        num_layers=2, num_heads=2,
    ),
)


@pytest.fixture(scope="module")
def model_and_params():
    model = PanFusion(PanFusionConfig(**TINY))
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_prepare_inference_mesh_builds_view_mesh(model_and_params):
    model, params = model_and_params
    sharded, mesh = model.prepare_inference_mesh(params)
    assert mesh is not None
    assert dict(mesh.shape) == {"data": 1, "model": 4}


def test_pano_only_stays_single_device():
    model = PanFusion(PanFusionConfig(**{**TINY, "use_pers_branch": False}))
    params = model.init_params(jax.random.PRNGKey(0))
    _, mesh = model.prepare_inference_mesh(params)
    assert mesh is None


def test_sharded_inference_matches_single_device(model_and_params):
    model, params = model_and_params
    batch = {"pano_prompt": ["a cozy bedroom"], "prompt": None}
    images_ref, pano_ref = model.inference(params, batch,
                                           jax.random.PRNGKey(1))

    sharded, mesh = model.prepare_inference_mesh(params)
    images_sh, pano_sh = model.inference(sharded, batch,
                                         jax.random.PRNGKey(1), mesh=mesh)
    assert pano_sh.shape == pano_ref.shape
    assert images_sh.shape == images_ref.shape
    # uint8 outputs; collective reduction order may flip the odd LSB
    assert np.abs(pano_sh.astype(int) - pano_ref.astype(int)).max() <= 1
    assert np.abs(images_sh.astype(int) - images_ref.astype(int)).max() <= 1
