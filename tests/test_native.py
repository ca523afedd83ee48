"""Native host resampler: parity with the jnp geometry path."""
import numpy as np
import pytest

from panfusion_tpu.ops import host

pytestmark = pytest.mark.skipif(
    not host.available(), reason="native library not built"
)


def test_remap_matches_jax_bilinear_wrap():
    import jax.numpy as jnp

    from panfusion_tpu.ops.resample import remap as remap_jax

    rng = np.random.default_rng(0)
    img = rng.random((32, 64, 3)).astype(np.float32)
    x = rng.uniform(-5, 70, (16, 24)).astype(np.float32)
    y = rng.uniform(0, 31, (16, 24)).astype(np.float32)

    got = host.remap(img, x, y, "bilinear", "wrap")
    chw = jnp.asarray(np.moveaxis(img, -1, 0))
    want = np.moveaxis(np.asarray(remap_jax(chw, jnp.asarray(x), jnp.asarray(y), "bilinear", "wrap")), 0, -1)
    # wrap-y differs (jax wraps, native clamps y) — restrict to interior y
    assert np.abs(got - want).max() < 1e-4


def test_host_grid_matches_jnp():
    import jax.numpy as jnp

    from panfusion_tpu.geometry.host_grids import map_pers_pix_to_equi_np
    from panfusion_tpu.geometry.projection import map_pers_pix_to_equi

    for theta, phi in ((0.0, 0.0), (45.0, -30.0), (180.0, 60.0)):
        xn, yn = map_pers_pix_to_equi_np(64, 128, 90.0, theta, phi, 16, 16)
        xj, yj = map_pers_pix_to_equi(64, 128, 90.0, theta, phi, 16, 16)
        assert np.abs(xn - np.asarray(xj)).max() < 1e-2, (theta, phi)
        assert np.abs(yn - np.asarray(yj)).max() < 1e-2, (theta, phi)


def test_to_perspective_native_vs_jax(monkeypatch):
    from panfusion_tpu.geometry.cubemap import Equirectangular

    rng = np.random.default_rng(1)
    pano = (rng.random((64, 128, 3)) * 255).astype(np.uint8)

    native = Equirectangular(pano.copy()).to_perspective(
        (90, 90), 30.0, 15.0, (32, 32)
    )

    monkeypatch.setattr(host, "remap", lambda *a, **k: None)
    jax_out = Equirectangular(pano.copy()).to_perspective(
        (90, 90), 30.0, 15.0, (32, 32)
    )
    diff = np.abs(native.astype(np.float32) - np.asarray(jax_out, np.float32))
    assert diff.mean() < 1.5, diff.mean()  # sub-LSB interp differences only


def test_u8_bilinear_many_channels():
    """The uint8 bilinear path chunks through a fixed 16-float buffer; >16
    channels must not smash the stack (reproduced as SIGBUS before)."""
    if not host.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    img = (rng.random((8, 8, 32)) * 255).astype(np.uint8)
    x = np.full((4, 4), 3.5, np.float32)
    y = np.full((4, 4), 2.5, np.float32)
    out = host.remap(img, x, y, "bilinear", "clamp")
    assert out.shape == (4, 4, 32)
    want = img[2:4, 3:5].astype(np.float32).mean(axis=(0, 1))
    np.testing.assert_allclose(out[0, 0], np.round(want), atol=1.0)


def test_remap_rejects_mismatched_coords():
    if not host.available():
        pytest.skip("native library unavailable")
    img = np.zeros((8, 8, 3), np.float32)
    with pytest.raises(ValueError):
        host.remap(img, np.zeros((4, 4), np.float32),
                   np.zeros((2, 2), np.float32))


def test_jnp_remap_integer_dtype():
    """Integer images interpolate in f32 (weights cast to uint8 used to
    collapse the output to the floor corner)."""
    import jax.numpy as jnp

    from panfusion_tpu.ops.resample import remap

    img = jnp.asarray([[50, 100], [50, 100]], jnp.uint8)[None]
    out = remap(img, jnp.asarray([[0.5]]), jnp.asarray([[0.5]]),
                "bilinear", "clamp")
    assert int(out[0, 0, 0]) == 75
