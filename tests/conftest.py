"""Test configuration: force an 8-device virtual CPU mesh.

Tests must run without TPU hardware and must exercise multi-device sharding,
so we force the JAX CPU backend with 8 virtual devices BEFORE jax is
imported anywhere (mirrors the reference CI's CUDA_VISIBLE_DEVICES=-1
pattern, ``.github/workflows/pytest.yml:35``).
"""

import os

# Neutralise the axon TPU auto-registration (sitecustomize) and force CPU.
# sitecustomize may already have imported jax, so set the platform via
# jax.config too (backends are not initialised until first device use).
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(42)


def assert_deep_almost_equal(expected, actual, rtol=1e-7, atol=0.0, path="root"):
    """Recursive comparator for nested result dicts.

    Analog of the reference test helper ``assertDeepAlmostEqual``
    (``mdsuite/utils/testing.py:36-62``).
    """
    if isinstance(expected, dict):
        assert set(expected) == set(actual), f"{path}: keys differ"
        for k in expected:
            assert_deep_almost_equal(
                expected[k], actual[k], rtol, atol, f"{path}.{k}"
            )
    elif isinstance(expected, (list, tuple, np.ndarray)):
        np.testing.assert_allclose(
            np.asarray(actual, dtype=float),
            np.asarray(expected, dtype=float),
            rtol=rtol,
            atol=atol,
            err_msg=path,
        )
    elif isinstance(expected, float):
        np.testing.assert_allclose(actual, expected, rtol=rtol, atol=atol, err_msg=path)
    else:
        assert expected == actual, f"{path}: {expected!r} != {actual!r}"
