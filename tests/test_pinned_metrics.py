"""Pinned metric-regression tests (SURVEY.md §5.0 last bullet).

The other golden tests compute both sides live, so a quality regression
that moves the TPU pipeline and the golden oracle together would pass
them. Here D1-all / bad-2.0 / EPE / valid-fraction on a fixed synthetic
suite are asserted against STORED values checked into
tests/data/pinned_metrics.json.

To intentionally re-pin after a semantics change:
    python tests/test_pinned_metrics.py --regen
and commit the diff with a justification.
"""

import json
import os
import sys

import numpy as np
import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
if os.path.dirname(_HERE) not in sys.path:  # `python tests/...py --regen`
    sys.path.insert(0, os.path.dirname(_HERE))

from tpustereo.config import Config  # noqa: E402
PIN_PATH = os.path.join(_HERE, "data", "pinned_metrics.json")

# the fixed suite: (name, pair kwargs, config kwargs)
SUITE = [
    ("sgm8", dict(shape=(64, 96), disparity=10.0, slope=0.05, seed=5, noise=2.0),
     dict(mode="sgm", paths=8, num_disparities=32, speckle_window_size=50)),
    ("sgm4_adaptive", dict(shape=(64, 96), disparity=10.0, slope=0.05, seed=5, noise=2.0),
     dict(mode="sgm", paths=4, num_disparities=32, adaptive_p2=True,
          speckle_window_size=50)),
    ("sgm8_census9x7", dict(shape=(64, 96), disparity=10.0, slope=0.05, seed=5, noise=2.0),
     dict(mode="sgm", paths=8, num_disparities=32, census_window=(9, 7),
          speckle_window_size=50)),
    ("census_wta", dict(shape=(64, 96), disparity=8.0, slope=0.02, seed=6, noise=0.0),
     dict(mode="census_wta", num_disparities=32, disp12_max_diff=-1,
          speckle_window_size=0, median_filter=False)),
    ("sad", dict(shape=(64, 96), disparity=8.0, slope=0.0, seed=6, noise=0.0),
     dict(mode="sad", num_disparities=32, sad_block=9, disp12_max_diff=-1,
          speckle_window_size=0, median_filter=False)),
    ("sgm8_min_disp", dict(shape=(64, 96), disparity=10.0, slope=0.05, seed=5, noise=2.0),
     dict(mode="sgm", paths=8, num_disparities=16, min_disparity=4,
          speckle_window_size=50)),
    # round-5 surface rows (VERDICT r4 next #3): fill modes, a D=256
    # multi-lane-block point, and SAD with the LR check + min_disparity
    ("sgm8_fill_bg", dict(shape=(64, 96), disparity=10.0, slope=0.05, seed=5, noise=2.0),
     dict(mode="sgm", paths=8, num_disparities=32, speckle_window_size=50,
          fill_mode="background")),
    ("sgm8_fill_hm", dict(shape=(64, 96), disparity=10.0, slope=0.05, seed=5, noise=2.0),
     dict(mode="sgm", paths=8, num_disparities=32, speckle_window_size=50,
          fill_mode="hirschmuller")),
    ("sgm8_d256", dict(shape=(64, 320), disparity=150.0, slope=0.05, seed=7, noise=2.0),
     dict(mode="sgm", paths=8, num_disparities=256,
          speckle_window_size=50)),
    ("sad_lr", dict(shape=(64, 96), disparity=12.0, slope=0.0, seed=6, noise=0.0),
     dict(mode="sad", num_disparities=32, sad_block=9, disp12_max_diff=1,
          min_disparity=4, speckle_window_size=0, median_filter=False)),
]

# rates are quantised in units of 1/(64*96) ~ 2e-4; 3e-3 allows a couple of
# pixels of cross-platform float-subpixel drift while catching any real
# quality regression (which moves these by percents)
RATE_TOL = 3e-3
EPE_TOL = 0.02


def _compute(name):
    import jax.numpy as jnp
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.eval.metrics import bad, d1_all, end_point_error
    from tpustereo.pipeline import sgbm

    pair_kw, cfg_kw = next((p, c) for n, p, c in SUITE if n == name)
    L, R, gt, mask = synthetic_pair(**pair_kw)
    gtm = np.where(mask, gt, -1.0).astype(np.float32)
    disp = np.asarray(sgbm(jnp.asarray(L), jnp.asarray(R), Config(**cfg_kw)))
    return {
        "bad2": round(float(bad(disp, gtm)), 6),
        "d1_all": round(float(d1_all(disp, gtm)), 6),
        "epe": round(float(end_point_error(disp, gtm)), 6),
        "valid_frac": round(float((disp >= 0).mean()), 6),
    }


@pytest.fixture(scope="module")
def pinned():
    assert os.path.exists(PIN_PATH), (
        f"{PIN_PATH} missing — run `python tests/test_pinned_metrics.py "
        "--regen` and commit it")
    with open(PIN_PATH) as f:
        return json.load(f)


@pytest.mark.parametrize("name", [n for n, _, _ in SUITE])
def test_pinned_metrics(pinned, name):
    assert name in pinned, f"no pinned entry for {name} — regen and commit"
    got = _compute(name)
    want = pinned[name]
    for k in ("bad2", "d1_all", "valid_frac"):
        assert abs(got[k] - want[k]) <= RATE_TOL, (name, k, got, want)
    assert abs(got["epe"] - want["epe"]) <= EPE_TOL, (name, got, want)


def test_pinned_file_covers_suite(pinned):
    assert set(pinned) == {n for n, _, _ in SUITE}, (
        "pinned file out of sync with SUITE — regen and commit")


def test_opencv_sgm_metric_level():
    """Metric-level oracle agreement beyond the constant-shift pair
    (VERDICT r1 #6): on a sloped noisy pair, our SGM and cv2.StereoSGBM
    (different cost: BT vs census) must land within a few points of
    bad-2.0 of each other against the analytic GT."""
    from tpustereo.golden.opencv_ref import HAVE_CV2, opencv_sgbm
    if not HAVE_CV2:
        pytest.skip("cv2 unavailable")
    import jax.numpy as jnp
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.eval.metrics import bad
    from tpustereo.pipeline import sgbm

    L, R, gt, mask = synthetic_pair((96, 128), disparity=10.0, slope=0.05,
                                    seed=5, noise=2.0)
    gtm = np.where(mask, gt, -1.0).astype(np.float32)
    cfg = Config(mode="sgm", paths=8, num_disparities=32,
                 speckle_window_size=50)
    ours = np.asarray(sgbm(jnp.asarray(L), jnp.asarray(R), cfg))
    cv = opencv_sgbm(L, R, cfg)
    # the eval protocol counts invalid as error, and OpenCV's BT cost +
    # default uniqueness invalidates far more of this noisy pair — compare
    # accuracy on the jointly-valid pixels, coverage separately
    both = (ours >= 0) & (cv >= 0) & (gtm >= 0)
    assert both.mean() > 0.5, both.mean()
    e_ours = (np.abs(ours - gtm)[both] > 2.0).mean()
    e_cv = (np.abs(cv - gtm)[both] > 2.0).mean()
    assert abs(e_ours - e_cv) < 0.05, (e_ours, e_cv)
    assert e_ours < 0.1 and e_cv < 0.1, (e_ours, e_cv)
    # our census-cost pipeline keeps at least OpenCV's coverage here
    assert (ours >= 0).mean() >= (cv >= 0).mean() - 0.02
    assert bad(ours, gtm) < 0.08, bad(ours, gtm)


if __name__ == "__main__":
    import sys
    if "--regen" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
        os.makedirs(os.path.dirname(PIN_PATH), exist_ok=True)
        out = {n: _compute(n) for n, _, _ in SUITE}
        with open(PIN_PATH, "w") as f:
            json.dump(out, f, indent=2, sort_keys=True)
            f.write("\n")
        print(f"wrote {PIN_PATH}:")
        print(json.dumps(out, indent=2, sort_keys=True))
    else:
        print("use --regen to (re)pin the stored metrics")
