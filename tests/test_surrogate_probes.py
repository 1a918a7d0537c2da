"""Operator-learning guards for the round-5 NACA/elasticity/cylinder
surrogates: a pointwise oracle on query-local inputs must NOT be able to
represent the targets (the r4 surrogates were pointwise-computable, so
their accuracy columns measured nothing — VERDICT r4). Mini versions of
scripts/surrogate_ablation.py's data-level probes, with relaxed
thresholds so they stay cheap and seed-stable."""

import importlib.util
import os

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "surrogate_ablation",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "surrogate_ablation.py"),
)
_abl = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_abl)

from position_induced_transformer_tpu.data import synthetic  # noqa: E402


def test_naca_not_pointwise_computable():
    r = _abl.eval_naca(n=120, ntr=90)
    # r4 surrogate scored ~0 here; the probe must stay well above noise
    assert r["pointwise_coords_oracle_relL2"] > 0.05
    assert r["input_shuffle_bound_relL2"] > 0.1


def test_elasticity_not_pointwise_computable():
    r = _abl.eval_elasticity(n=120, ntr=90)
    assert r["pointwise_coords_oracle_relL2"] > 0.1
    assert r["input_shuffle_bound_relL2"] > 0.2


def test_cylinder_one_step_not_pointwise_invertible():
    r = _abl.eval_cylinder(n=80, ntr=60)
    assert r["pointwise_local_oracle_relL2"] > 0.05
    assert r["input_shuffle_bound_relL2"] > 0.2


def test_naca_grid_conforms_without_folding():
    # the C-grid must encode the shape (TF-family input is the grid alone,
    # reference: tensorflow/6_NACA/utils.py:45-52) while staying a valid
    # (monotone) grid
    _, X, _ = synthetic.naca(n=6, nx=111, ny=26)
    assert float(np.diff(X[..., 1], axis=2).min()) > 0  # no folding
    spread = X[..., 1].std(axis=0).max()  # shape-driven deformation exists
    assert spread > 0.005


def test_elasticity_void_profile_and_stress_sanity():
    # PRODUCTION scale: the raw harmonic profile exceeds the cloud radius
    # on ~2.5e-4 of points at n=1200 (tail control radii meeting a cloud
    # dip), which the generator clamps to 0.92*radius — the invariant must
    # hold at the scale the benchmark actually trains on, not just on a
    # small sample where the raw profile happens to stay inside
    X, ext, Y = synthetic.elasticity(n=1200, L=972)
    r_ctrl = (X[:, 0, 2:] + 1) / 5.0
    theta = np.arctan2(ext[..., 1] - 0.5, ext[..., 0] - 0.5)
    cloud_r = np.hypot(ext[..., 0] - 0.5, ext[..., 1] - 0.5)
    a_raw, da_raw = synthetic._void_radius(r_ctrl, theta)
    # the clamp must actually be exercised at production scale (else this
    # test could pass with the clamp deleted just because the raw profile
    # stayed inside)
    assert np.any(a_raw >= 0.92 * cloud_r)
    # the GENERATOR'S clamp helper (the exact code elasticity() runs — not
    # a re-derivation, so breaking the clamp in synthetic.py fails here)
    a, _ = synthetic._clamp_void_inside(
        a_raw, da_raw, cloud_r, np.zeros_like(cloud_r)
    )
    assert np.all(a > 0.05) and np.all(a < cloud_r)
    # Kirsch is now evaluated strictly outside the void everywhere, so the
    # stress extremes come only from the designed shape-gradient
    # amplification (finite, no unphysical r < a evaluations)
    assert np.isfinite(Y).all() and float(Y.max()) < 50.0
    # Kirsch stress is positive, finite, and void-shape-driven: matched
    # quantiles differ across samples far more than within-sample noise
    assert np.isfinite(Y).all() and (Y > 0).all()
    per_sample_mean = Y.mean(axis=(1, 2))
    assert per_sample_mean.std() > 0.01
