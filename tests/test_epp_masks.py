"""EPP mask engine tests: scatter construction vs dense identity-warp oracle.

The oracle reimplements the reference's get_masks semantics
(models/pano/utils.py:10-84) literally: warp identity "pixel images"
through p2e/e2p, symmetrize sequentially with clamping, blur, normalize.
Our production builder constructs the same matrices directly from bilinear
weights (panfusion_tpu/models/epp.py) — they must agree to float tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panfusion_tpu.geometry.projection import e2p, p2e
from panfusion_tpu.models.epp import (
    _blur5,
    build_coords,
    build_epp_phase_cache,
    build_epp_sites,
    build_masks,
    warp_attn_resolutions,
)

M, PH, PW, EH, EW = 3, 4, 4, 8, 16
FOV = np.full(M, 90.0, np.float32)
THETA = np.array([0.0, 120.0, 240.0], np.float32)
PHI = np.array([0.0, 30.0, -30.0], np.float32)


def _oracle_masks():
    """Dense reference-semantics mask build (identity-image warps)."""
    fov = jnp.asarray(FOV)
    theta = jnp.asarray(THETA)
    phi = jnp.asarray(PHI)
    P, E = PH * PW, EH * EW

    pers_pixels = jnp.eye(P, dtype=jnp.float32).reshape(P, PH, PW)
    equi_pixels = jnp.eye(E, dtype=jnp.float32).reshape(E, EH, EW)

    pers_raw = []  # (m, E, P): e2p warp of equi identity
    equi_raw = []  # (m, P, E): p2e warp of pers identity (masked)
    for i in range(M):
        w = e2p(equi_pixels, fov[i], theta[i], phi[i], (PH, PW))
        pers_raw.append(w.reshape(E, P))
        w2, _ = p2e(
            pers_pixels[None].repeat(1, axis=0).reshape(1, P, PH, PW),
            fov[i : i + 1], theta[i : i + 1], phi[i : i + 1], (EH, EW),
        )
        equi_raw.append(w2[0].reshape(P, E))
    pers_raw = jnp.stack(pers_raw)
    equi_raw = jnp.stack(equi_raw)

    pers = jnp.clip(pers_raw + jnp.swapaxes(equi_raw, 1, 2), 0, 1)
    equi = jnp.clip(equi_raw + jnp.swapaxes(pers, 1, 2), 0, 1)

    pers = _blur5(pers.reshape(M * E, PH, PW), False).reshape(M, E, P)
    equi = _blur5(equi.reshape(M * P, EH, EW), True).reshape(M, P, E)

    def norm(x):
        mx = jnp.max(x, axis=-1, keepdims=True)
        mx = jnp.where(mx == 0, 1.0, mx)
        return x / mx * 2 - 1

    return np.asarray(norm(pers)), np.asarray(norm(equi))


def test_masks_match_dense_oracle():
    pm, em = build_masks((PH, PW), (EH, EW), jnp.asarray(FOV), jnp.asarray(THETA), jnp.asarray(PHI))
    opm, oem = _oracle_masks()
    np.testing.assert_allclose(np.asarray(pm), opm, atol=2e-5)
    np.testing.assert_allclose(np.asarray(em), oem, atol=2e-5)


def test_masks_range_and_coverage():
    pm, em = build_masks((PH, PW), (EH, EW), jnp.asarray(FOV), jnp.asarray(THETA), jnp.asarray(PHI))
    pm, em = np.asarray(pm), np.asarray(em)
    assert pm.min() >= -1 - 1e-6 and pm.max() <= 1 + 1e-6
    # each pers pixel sees some equi pixel at full weight (max-normalized)
    assert np.allclose(em.max(axis=-1), 1.0, atol=1e-5)


def test_coords_shapes_and_values():
    pc, ec = build_coords((PH, PW), (EH, EW), jnp.asarray(FOV), jnp.asarray(THETA), jnp.asarray(PHI))
    assert pc.shape == (M, PH, PW, 2)
    assert ec.shape == (EH, EW, 2)
    # equi grid corners (reference get_coords: x in [-pi, pi], y in [pi/2, -pi/2])
    assert np.isclose(float(ec[0, 0, 0]), -np.pi)
    assert np.isclose(float(ec[0, -1, 0]), np.pi)
    assert np.isclose(float(ec[0, 0, 1]), np.pi / 2)
    assert np.isclose(float(ec[-1, 0, 1]), -np.pi / 2)


def test_warp_attn_resolutions():
    sites = warp_attn_resolutions(32, (64, 128))
    assert len(sites) == 7
    assert sites[0] == ((16, 16), (32, 64))
    assert sites[3] == ((4, 4), (8, 16))  # mid
    assert sites[6] == ((16, 16), (32, 64))
    assert len({s for s in sites}) == 3  # only 3 unique resolutions


def test_build_epp_sites_layout():
    sites = build_epp_sites(8, (16, 32), jnp.asarray(FOV), jnp.asarray(THETA), jnp.asarray(PHI))
    assert len(sites) == 7
    s0 = sites[0]
    assert s0.pers_mask.shape == (1, 8 * 16, M * 4 * 4)
    assert s0.equi_mask.shape == (1, M * 4 * 4, 8 * 16)
    assert s0.pers_coords.shape == (M, 4, 4, 2)


def test_phase_cache_cycles():
    cache = build_epp_phase_cache(8, (16, 32), FOV, THETA, PHI, rot_diff=90.0)
    assert len(cache) == 4
    # phase 3 = theta + 360 == original theta rotated by 0 => equals building
    # sites at the original cameras
    direct = build_epp_sites(
        8, (16, 32), jnp.asarray(FOV), jnp.asarray(THETA), jnp.asarray(PHI)
    )
    np.testing.assert_allclose(
        np.asarray(cache[3][0].pers_mask), np.asarray(direct[0].pers_mask), atol=1e-4
    )
