"""FourierFeatures block: parity with the torch rfft2 formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dquartic_tpu.models import FourierFeatures


def test_fourier_shapes_and_identity_weight():
    h, w, dim = 12, 6, 3
    m = FourierFeatures(dim=dim, h=h, w=w)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, h, w, dim)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)

    # identity filter: complex weight = 1 + 0j reproduces the input
    ident = {
        "params": {
            "complex_weight": jnp.stack(
                [jnp.ones((dim, h, w)), jnp.zeros((dim, h, w))], axis=-1
            )
        }
    }
    out = m.apply(ident, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-4, atol=1e-5)


def test_fourier_matches_torch():
    torch = pytest.importorskip("torch")
    h, w, dim = 10, 8, 2
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, h, w, dim)).astype(np.float32)
    weight = rng.normal(size=(dim, h, w, 2)).astype(np.float32) * 0.1

    # torch formulation (channel-first), unet1d.py:854-870
    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    wt = torch.view_as_complex(torch.tensor(weight))
    xf = torch.fft.rfft2(xt, dim=(2, 3), norm="ortho")
    xf = xf * wt[None, :, :, : xf.shape[-1]]
    expected = torch.fft.irfft2(xf, s=(h, w), dim=(2, 3), norm="ortho").numpy()

    m = FourierFeatures(dim=dim, h=h, w=w)
    out = m.apply({"params": {"complex_weight": jnp.asarray(weight)}}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), expected, rtol=1e-4, atol=1e-5
    )
