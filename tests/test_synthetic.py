"""Synthetic-data generator invariants.

The generators stand in for the reference's external datasets
(reference: README.md:17-22), so their physics must be trustworthy:
the Sod generator is an EXACT Euler Riemann solver (pinned here against
Toro's published star-region values) and the Darcy generator must be
resolution-consistent (the same continuous field at every grid size),
which is what makes the ZSSR evaluation meaningful on synthetic data.
"""

import numpy as np
import pytest

from position_induced_transformer_tpu.data import synthetic as syn

GAMMA = 1.4


class TestRiemannExact:
    def test_classic_sod_star_state_matches_toro(self):
        """Toro, 'Riemann Solvers and Numerical Methods', table 4.2 test 1:
        (1,0,1)/(0.125,0,0.1) -> p*=0.30313, u*=0.92745,
        rho*L=0.42632 (rarefaction), rho*R=0.26557 (shock)."""
        rl, ul, pl, rr, ur, pr = 1.0, 0.0, 1.0, 0.125, 0.0, 0.1
        ps, us, cl, cr = syn._riemann_star(rl, ul, pl, rr, ur, pr)
        assert ps == pytest.approx(0.30313, abs=1e-5)
        assert us == pytest.approx(0.92745, abs=1e-5)
        b = (GAMMA - 1) / (GAMMA + 1)
        assert rl * (ps / pl) ** (1 / GAMMA) == pytest.approx(
            0.42632, abs=1e-5
        )
        assert rr * (ps / pr + b) / (b * ps / pr + 1) == pytest.approx(
            0.26557, abs=1e-5
        )

    def test_two_shock_case_matches_toro(self):
        """Toro table 4.2 test 3 variant — the colliding-flow two-shock
        problem (test 5): (5.99924, 19.5975, 460.894) /
        (5.99242, -6.19633, 46.0950) -> p*=1691.64, u*=8.68975."""
        ps, us, _, _ = syn._riemann_star(
            5.99924, 19.5975, 460.894, 5.99242, -6.19633, 46.0950
        )
        assert ps == pytest.approx(1691.64, rel=1e-4)
        assert us == pytest.approx(8.68975, rel=1e-4)

    def test_sampled_solution_is_self_similar(self):
        """W depends on x/t only: sampling at t and 2t with doubled
        coordinates is identical."""
        rl, ul, pl, rr, ur, pr = 1.1, 0.0, 0.9, 0.14, 0.0, 0.11
        ps, us, cl, cr = syn._riemann_star(rl, ul, pl, rr, ur, pr)
        x = np.linspace(-2, 2, 257)
        a = syn._riemann_sample(
            rl, ul, pl, rr, ur, pr, ps, us, cl, cr, x / 1.0
        )
        b = syn._riemann_sample(
            rl, ul, pl, rr, ur, pr, ps, us, cl, cr, (2 * x) / 2.0
        )
        for ai, bi in zip(a, b):
            np.testing.assert_allclose(ai, bi, rtol=1e-12)

    def test_rankine_hugoniot_across_right_shock(self):
        """Mass and momentum fluxes are continuous across the sampled
        right shock in the shock frame — i.e. the sampler places a TRUE
        shock, not a smoothed stand-in."""
        rl, ul, pl, rr, ur, pr = 1.0, 0.0, 1.0, 0.125, 0.0, 0.1
        ps, us, cl, cr = syn._riemann_star(rl, ul, pl, rr, ur, pr)
        # right shock speed (Toro 4.59)
        s_r = ur + cr * np.sqrt(
            (GAMMA + 1) / (2 * GAMMA) * ps / pr
            + (GAMMA - 1) / (2 * GAMMA)
        )
        xi = np.array([s_r - 1e-9, s_r + 1e-9])
        rho, u, p = syn._riemann_sample(
            rl, ul, pl, rr, ur, pr, ps, us, cl, cr, xi
        )
        m_flux = rho * (u - s_r)
        mom_flux = rho * (u - s_r) ** 2 + p
        assert m_flux[0] == pytest.approx(m_flux[1], rel=1e-10)
        assert mom_flux[0] == pytest.approx(mom_flux[1], rel=1e-10)
        # and it IS a jump
        assert abs(rho[0] - rho[1]) > 0.1

    def test_generator_shapes_and_positivity(self):
        x, y = syn.sod(n=16, L=512, seed=3)
        assert x.shape == (16, 512, 3) and y.shape == (16, 512, 3)
        assert x.dtype == np.float32 and y.dtype == np.float32
        assert np.isfinite(y).all()
        assert (y[..., 0] > 0).all() and (y[..., 2] > 0).all()
        # initial condition: exactly two states, zero velocity
        assert (x[..., 1] == 0).all()
        for i in range(16):
            assert len(np.unique(x[i, :, 0])) == 2

    def test_waves_stay_inside_domain(self):
        """At t_final the full wave fan must sit strictly inside [-5, 5):
        the outermost samples still carry the unperturbed initial states
        (otherwise targets are silently clipped by the domain)."""
        x, y = syn.sod(n=64, L=1024, seed=0)
        np.testing.assert_allclose(y[:, 0, :], x[:, 0, :], atol=1e-6)
        np.testing.assert_allclose(y[:, -1, :], x[:, -1, :], atol=1e-6)


class TestDarcyResolutionConsistency:
    def test_coarse_grid_is_subsample_of_fine(self):
        """darcy(s=43) and darcy(s=421) evaluate the SAME continuous
        per-sample field: the 43-grid equals the 421-grid strided by 10
        (421 = 42*10 + 1) — the property the ZSSR evaluation rests on."""
        xa, ya = syn.darcy(n=6, s=43, seed=7)
        xb, yb = syn.darcy(n=6, s=421, seed=7)
        np.testing.assert_allclose(
            xa, xb[:, ::10, ::10], rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            ya, yb[:, ::10, ::10], rtol=1e-5, atol=1e-5
        )

    def test_no_constant_pixels(self):
        """Per-pixel std must never vanish (PixelWiseNormalizer divides
        by it); boundary pixels are the risk case for sine-mode fields."""
        x, _ = syn.darcy(n=64, s=43, seed=1)
        assert x[..., 0].std(axis=0).min() > 1e-3

    def test_solution_satisfies_dirichlet_boundary(self):
        """The real Darcy target solves with u=0 on the boundary
        (reference: the FNO piececonst dataset); the surrogate's window
        restores that structure (round-4 error-map diagnosis: without it
        a trained model's error concentrates on the boundary ring)."""
        _, y = syn.darcy(n=4, s=43, seed=3)
        assert abs(y[:, 0]).max() == 0 and abs(y[:, -1]).max() == 0
        assert abs(y[:, :, 0]).max() == 0 and abs(y[:, :, -1]).max() == 0
        # and the interior is NOT degenerate
        assert abs(y[:, 5:-5, 5:-5]).max() > 1e-3
