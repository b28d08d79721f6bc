"""The TPU jnp-fallback guard (VERDICT r3 weak #1): a TPU run must never
silently land on the pure-jnp cost/aggregate/select path — XLA is proven
to miscompile it on TPU (r19 diag: rows >= 376 wrong at 750x1500). On CPU
the guard is a no-op; these tests force the on-TPU branch by patching the
device probe."""

import numpy as np
import jax.numpy as jnp
import pytest

import tpustereo.utils.backend as backend_mod
from tpustereo.config import Config
from tpustereo.data.synthetic import synthetic_pair
from tpustereo.pipeline import sgbm
from tpustereo.utils.backend import TPUFallbackError, TPUFallbackWarning


@pytest.fixture()
def fake_tpu(monkeypatch):
    monkeypatch.setattr(backend_mod, "_on_tpu", lambda: True)


@pytest.fixture(scope="module")
def tiny():
    L, R, _, _ = synthetic_pair((16, 32), disparity=3.0, seed=1)
    return jnp.asarray(L), jnp.asarray(R)


def test_guard_refuses_forced_jnp_on_tpu(fake_tpu, tiny):
    l8, r8 = tiny
    cfg = Config(num_disparities=16, backend="jnp")
    with pytest.raises(TPUFallbackError, match="miscompile"):
        sgbm(l8, r8, cfg)


def test_guard_refuses_offgate_config_on_tpu(fake_tpu, tiny):
    # D = 1024 falls off every Pallas gate (the family covers <= 512) ->
    # jnp cost path -> refuse before any kernel or jnp compute is traced
    l8, r8 = tiny
    cfg = Config(num_disparities=1024)
    with pytest.raises(TPUFallbackError, match="census/cost_volume"):
        sgbm(l8, r8, cfg)


def test_guard_env_optout_downgrades_to_warning(fake_tpu, tiny, monkeypatch):
    monkeypatch.setenv("TPUSTEREO_UNSAFE_TPU_FALLBACK", "1")
    l8, r8 = tiny
    cfg = Config(num_disparities=16, backend="jnp",
                 speckle_window_size=0)  # speckle would probe pallas_mode
    with pytest.warns(TPUFallbackWarning):
        out = np.asarray(sgbm(l8, r8, cfg))
    assert out.shape == (16, 32)


def test_guard_noop_on_cpu(tiny):
    l8, r8 = tiny
    cfg = Config(num_disparities=16, backend="jnp")
    out = np.asarray(sgbm(l8, r8, cfg))
    assert out.shape == (16, 32)


def test_guard_refuses_offgate_tiled_on_tpu(fake_tpu):
    """The tiled dispatch path refuses off-gate configs on TPU too."""
    import jax.numpy as jnp2
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.dist import make_mesh, sgbm_tiled
    L, R, _, _ = synthetic_pair((16, 32), disparity=3.0, seed=2)
    mesh = make_mesh(data=1, strip=2)
    cfg = Config(mode="sgm", num_disparities=1024,  # off every gate
                 speckle_window_size=0, median_filter=False)
    with pytest.raises(TPUFallbackError, match="tiled"):
        sgbm_tiled(jnp.asarray(L), jnp.asarray(R), cfg, mesh)
