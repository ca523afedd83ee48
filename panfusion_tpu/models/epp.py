"""EPP correspondence masks/coords — the TPU-native mask engine.

Numeric parity with the reference's get_masks/get_coords
(models/pano/utils.py:10-106) but a different construction: the reference
warps (m, h*w, hh, ww) identity "pixel images" through p2e/e2p — O(m * E * P
* 4) memory traffic with per-view host numpy grids rebuilt *every forward at
every WarpAttn site*. Here the warp of an identity image is recognized as
the bilinear interpolation weight matrix itself, built directly with 4
scatter-adds per direction from the closed-form jnp grids, then symmetrized
/ blurred / normalized exactly like the reference. Everything jits, so:

* training: masks build on device inside the jitted train step (cameras are
  random per sample, dataset/PanoDataset.py:99-103);
* inference: cameras are the fixed icosahedron-20 plus a 90-degree/step
  rotation schedule (mod 360 => 4 phases), so `build_epp_cache` precomputes
  all sites x phases once and the 50-step scan just indexes them.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.projection import (
    map_equi_pix_to_pers,
    map_pers_coords_to_equi,
    map_pers_pix_to_equi,
)
from ..nn.epp import EPPSite


def _gaussian_kernel5(sigma: float = 1.0) -> np.ndarray:
    x = np.arange(5, dtype=np.float64) - 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def _blur5(x: jnp.ndarray, circular_w: bool) -> jnp.ndarray:
    """(n, h, w) -> 5x5 sigma-1 gaussian blur.

    Border: replicate (kornia gaussian_blur2d parity, models/pano/utils.py:
    65-67); for equi masks the width is circularly padded first
    (pad_pano(...2) ... unpad_pano, utils.py:66-68).
    """
    n, h, w = x.shape
    if circular_w:
        x = jnp.concatenate([x[..., -2:], x, x[..., :2]], axis=-1)
    else:
        x = jnp.concatenate(
            [jnp.repeat(x[..., :1], 2, -1), x, jnp.repeat(x[..., -1:], 2, -1)],
            axis=-1,
        )
    x = jnp.concatenate(
        [jnp.repeat(x[:, :1], 2, 1), x, jnp.repeat(x[:, -1:], 2, 1)], axis=1
    )
    k = jnp.asarray(_gaussian_kernel5())[:, :, None, None]  # HWIO
    out = jax.lax.conv_general_dilated(
        x[..., None], k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out[..., 0]


def _e2p_weights(eh, ew, ph, pw, fov, theta, phi) -> jnp.ndarray:
    """(P, E) bilinear weight matrix of the e2p warp for one view."""
    x, y = map_pers_pix_to_equi(eh, ew, fov, theta, phi, ph, pw)
    return _scatter_bilinear(x.reshape(-1), y.reshape(-1), eh, ew)


def _p2e_weights(eh, ew, ph, pw, fov, theta, phi) -> jnp.ndarray:
    """(E, P) bilinear weight matrix of the p2e warp (masked) for one view."""
    x, y, mask = map_equi_pix_to_pers(ph, pw, fov, theta, phi, eh, ew)
    w = _scatter_bilinear(x.reshape(-1), y.reshape(-1), ph, pw)
    return w * mask.reshape(-1, 1)


def _scatter_bilinear(x: jnp.ndarray, y: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(n,) float coords -> (n, h*w) bilinear weight rows (zeros border)."""
    n = x.shape[0]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    out = jnp.zeros((n, h * w), jnp.float32)
    rows = jnp.arange(n)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0.astype(jnp.int32) + dx
            yi = y0.astype(jnp.int32) + dy
            wgt = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
            valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            out = out.at[rows, idx].add(jnp.where(valid, wgt, 0.0))
    return out


@functools.partial(jax.jit, static_argnames=("pers_hw", "equi_hw"))
def build_masks(
    pers_hw: Tuple[int, int],
    equi_hw: Tuple[int, int],
    fov: jnp.ndarray,
    theta: jnp.ndarray,
    phi: jnp.ndarray,
):
    """EPP attention biases for one camera set.

    Returns (pers_masks (m, E, P), equi_masks (m, P, E)), values in [-1, 1].
    Pipeline parity with reference get_masks (models/pano/utils.py:10-84):
    raw bilinear correspondences -> sequential symmetrization with clamping
    -> 5x5 sigma-1 blur (circular width pad on the equi side) -> per-query
    max-normalize -> rescale to [-1, 1].
    """
    ph, pw = pers_hw
    eh, ew = equi_hw
    P, E = ph * pw, eh * ew

    w_e2p = jax.vmap(lambda f, t, p: _e2p_weights(eh, ew, ph, pw, f, t, p))(
        fov, theta, phi
    )  # (m, P, E)
    w_p2e = jax.vmap(lambda f, t, p: _p2e_weights(eh, ew, ph, pw, f, t, p))(
        fov, theta, phi
    )  # (m, E, P)

    # sequential symmetrization (reference utils.py:52-60: pers first, then
    # equi picks up the *updated* pers masks)
    pers = jnp.clip(jnp.swapaxes(w_e2p, 1, 2) + w_p2e, 0.0, 1.0)  # (m, E, P)
    equi = jnp.clip(
        jnp.swapaxes(w_p2e, 1, 2) + jnp.swapaxes(pers, 1, 2), 0.0, 1.0
    )  # (m, P, E)

    m = pers.shape[0]
    pers = _blur5(pers.reshape(m * E, ph, pw), circular_w=False).reshape(m, E, P)
    equi = _blur5(equi.reshape(m * P, eh, ew), circular_w=True).reshape(m, P, E)

    def norm(x):
        mx = jnp.max(x, axis=-1, keepdims=True)
        mx = jnp.where(mx == 0, 1.0, mx)
        return (x / mx) * 2.0 - 1.0

    return norm(pers), norm(equi)


def build_coords(
    pers_hw: Tuple[int, int],
    equi_hw: Tuple[int, int],
    fov: jnp.ndarray,
    theta: jnp.ndarray,
    phi: jnp.ndarray,
):
    """(pers_coords (m, ph, pw, 2), equi_coords (eh, ew, 2)) lon/lat grids.

    Parity with reference get_coords (models/pano/utils.py:87-106).
    """
    ph, pw = pers_hw
    eh, ew = equi_hw
    lon = jnp.linspace(-jnp.pi, jnp.pi, ew)
    lat = jnp.linspace(jnp.pi / 2, -jnp.pi / 2, eh)
    lon, lat = jnp.meshgrid(lon, lat)
    equi_coords = jnp.stack([lon, lat], axis=-1).astype(jnp.float32)

    pers_coords = jax.vmap(
        lambda f, t, p: jnp.stack(
            map_pers_coords_to_equi(f, t, p, ph, pw), axis=-1
        )
    )(fov, theta, phi)
    return pers_coords.astype(jnp.float32), equi_coords


def warp_attn_resolutions(
    pers_res: int, equi_hw: Tuple[int, int], n_levels: int = 4
) -> List[Tuple[Tuple[int, int], Tuple[int, int]]]:
    """The WarpAttn sites' (pers_hw, equi_hw), in traversal order:
    one per encoder downsample point, mid, one per decoder upsample point
    (reference MVGenModel.py:19-33; 3+1+3 for the 4-level SD2 UNet). For
    pers 32 / equi 64x128: [(16,32x64), (8,16x32), (4,8x16), (4,8x16),
    (4,8x16), (8,16x32), (16,32x64)] — only n_levels-1 unique resolutions,
    which the cache exploits."""
    eh, ew = equi_hw
    enc = [
        ((pers_res >> k, pers_res >> k), (eh >> k, ew >> k))
        for k in range(1, n_levels)
    ]
    mid = [enc[-1]]
    dec = list(reversed(enc))
    return enc + mid + dec


def _pack_masks(pm: jnp.ndarray, em: jnp.ndarray, e_hw, pers_hw):
    """(b, m, E, P)/(b, m, P, E) per-view masks -> the (b, q, kv) layout
    WarpAttn consumes: pers_mask (b, E, m*P), equi_mask (b, m*P, E).
    The single place that encodes the view-major kv packing contract."""
    b, m = pm.shape[:2]
    E = e_hw[0] * e_hw[1]
    P = pers_hw[0] * pers_hw[1]
    return (
        pm.transpose(0, 2, 1, 3).reshape(b, E, m * P),
        em.reshape(b, m * P, E),
    )


def build_epp_sites(
    pers_res: int,
    equi_hw: Tuple[int, int],
    fov: jnp.ndarray,
    theta: jnp.ndarray,
    phi: jnp.ndarray,
    batch: int = 1,
    n_levels: int = 4,
) -> List[EPPSite]:
    """All sites for one camera set (single sample), deduplicated by
    resolution, packed in the (b, q, kv) layout WarpAttn consumes."""
    unique: Dict[Tuple, Tuple] = {}
    sites = []
    for pers_hw, e_hw in warp_attn_resolutions(pers_res, equi_hw, n_levels):
        key = (pers_hw, e_hw)
        if key not in unique:
            pm, em = build_masks(pers_hw, e_hw, fov, theta, phi)
            pc, ec = build_coords(pers_hw, e_hw, fov, theta, phi)
            pers_mask, equi_mask = _pack_masks(
                pm[None], em[None], e_hw, pers_hw
            )
            unique[key] = (pers_mask, equi_mask, pc, ec)
        pm_, em_, pc_, ec_ = unique[key]
        sites.append(
            EPPSite(
                pers_mask=jnp.broadcast_to(pm_, (batch, *pm_.shape[1:])),
                equi_mask=jnp.broadcast_to(em_, (batch, *em_.shape[1:])),
                pers_coords=jnp.tile(pc_, (batch, 1, 1, 1)),
                equi_coords=ec_,
            )
        )
    return sites


def build_epp_sites_batched(
    pers_res: int,
    equi_hw: Tuple[int, int],
    fov: jnp.ndarray,  # (b, m)
    theta: jnp.ndarray,  # (b, m)
    phi: jnp.ndarray,  # (b, m)
    n_levels: int = 4,
) -> List[EPPSite]:
    """Training-path sites: per-sample random cameras (reference
    dataset/PanoDataset.py:99-103), vmapped over the batch inside the jitted
    train step."""
    b, m = theta.shape
    unique: Dict[Tuple, EPPSite] = {}
    sites = []
    for pers_hw, e_hw in warp_attn_resolutions(pers_res, equi_hw, n_levels):
        key = (pers_hw, e_hw)
        if key not in unique:
            pm, em = jax.vmap(
                lambda f, t, p: build_masks(pers_hw, e_hw, f, t, p)
            )(fov, theta, phi)  # (b, m, E, P), (b, m, P, E)
            pc, ec = jax.vmap(
                lambda f, t, p: build_coords(pers_hw, e_hw, f, t, p)
            )(fov, theta, phi)  # (b, m, ph, pw, 2), (b, eh, ew, 2)
            pers_mask, equi_mask = _pack_masks(pm, em, e_hw, pers_hw)
            unique[key] = EPPSite(
                pers_mask=pers_mask,
                equi_mask=equi_mask,
                pers_coords=pc.reshape(b * m, *pers_hw, 2),
                equi_coords=ec[0],
            )
        sites.append(unique[key])
    return sites


def build_epp_phase_cache(
    pers_res: int,
    equi_hw: Tuple[int, int],
    fov: np.ndarray,
    theta: np.ndarray,
    phi: np.ndarray,
    rot_diff: float = 90.0,
    batch: int = 1,
    n_levels: int = 4,
) -> List[List[EPPSite]]:
    """Inference cache: one site list per rotation phase.

    The inference loop rotates cameras by rot_diff degrees per step
    (reference PanFusion.py:146-162); with rot_diff=90 the camera set cycles
    through 4 phases, so 4 cached variants cover all 50 steps.
    """
    if rot_diff <= 0 or abs(360.0 % rot_diff) > 1e-9:
        # a non-divisor would silently desynchronize the cached camera
        # phases from the latent's accumulated roll after one cycle
        raise ValueError(
            f"rot_diff={rot_diff} must be a positive divisor of 360"
        )
    n_phases = int(round(360.0 / rot_diff)) if rot_diff % 360 != 0 else 1
    phases = []
    for k in range(n_phases):
        th = (np.asarray(theta) + (k + 1) * rot_diff) % 360.0
        phases.append(
            build_epp_sites(
                pers_res, equi_hw,
                jnp.asarray(fov, jnp.float32), jnp.asarray(th, jnp.float32),
                jnp.asarray(phi, jnp.float32), batch, n_levels,
            )
        )
    return phases
