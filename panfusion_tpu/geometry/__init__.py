from .cubemap import Cubemap, Equirectangular, c2e, e2c
from .pano_ops import pad_pano, roll_pano, unpad_pano
from .projection import (
    e2p,
    map_equi_pix_to_pers,
    map_pers_coords_to_equi,
    map_pers_pix_to_equi,
    mp2e,
    p2e,
    pers_ray_grid,
)
from .rotations import camera_rotations, get_K_R, rodrigues
from .sampling import (
    horizon_sample_camera,
    icosahedron_sample_camera,
    random_sample_camera,
)
from .stretch import cor2xybound, pano_stretch, sample_stretch_factors
from .vp_align import find_main_directions, pano_vp_align, rotate_panorama

__all__ = [
    "Cubemap",
    "Equirectangular",
    "c2e",
    "e2c",
    "e2p",
    "p2e",
    "mp2e",
    "pad_pano",
    "unpad_pano",
    "roll_pano",
    "map_pers_coords_to_equi",
    "map_pers_pix_to_equi",
    "map_equi_pix_to_pers",
    "pers_ray_grid",
    "rodrigues",
    "camera_rotations",
    "get_K_R",
    "horizon_sample_camera",
    "icosahedron_sample_camera",
    "random_sample_camera",
    "pano_stretch",
    "cor2xybound",
    "sample_stretch_factors",
    "pano_vp_align",
    "find_main_directions",
    "rotate_panorama",
]
