"""Pallas kernel parity (interpret mode on CPU) vs the XLA solvers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muscle_synergies_tpu.models.batch import mu_iterations_batch
from muscle_synergies_tpu.models.hals import fit_cd
from muscle_synergies_tpu.models.kernels import (
    cd_iterations_pallas,
    mu_iterations_pallas,
)

RNG = np.random.default_rng(55)
B, N, L, K = 8, 16, 8, 4


@pytest.fixture(scope="module")
def problem():
    xs = jnp.asarray(RNG.random((B, N, L)), dtype=jnp.float32)
    w = jnp.asarray(RNG.random((B, N, K)), dtype=jnp.float32)
    h = jnp.asarray(RNG.random((B, K, L)), dtype=jnp.float32)
    return xs, w, h


class TestMUKernel:
    def test_matches_xla_updates(self, problem):
        xs, w, h = problem
        wp, hp = mu_iterations_pallas(xs, w, h, 5, block_b=B, interpret=True)
        wx, hx = mu_iterations_batch(xs, w, h, 5)
        np.testing.assert_allclose(np.asarray(wp), np.asarray(wx),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(hp), np.asarray(hx),
                                   rtol=1e-4, atol=1e-6)

    def test_loss_decreases(self, problem):
        xs, w, h = problem
        w1, h1 = mu_iterations_pallas(xs, w, h, 1, block_b=B, interpret=True)
        w9, h9 = mu_iterations_pallas(xs, w, h, 30, block_b=B, interpret=True)
        l1 = float(jnp.linalg.norm(xs - w1 @ h1))
        l9 = float(jnp.linalg.norm(xs - w9 @ h9))
        assert l9 < l1

    def test_bad_block_size(self, problem):
        xs, w, h = problem
        with pytest.raises(ValueError, match="multiple"):
            mu_iterations_pallas(xs, w, h, 1, block_b=3)

    def test_inner_iter_matches_xla_accelerated_mu(self, problem):
        # accelerated MU (Gram reuse) must agree with the XLA
        # mu_update(inner_iter=...) trajectory exactly
        xs, w, h = problem
        wp, hp = mu_iterations_pallas(
            xs, w, h, 4, block_b=B, interpret=True, inner_iter=3
        )
        wx, hx = mu_iterations_batch(xs, w, h, 4, inner_iter=3)
        np.testing.assert_allclose(np.asarray(wp), np.asarray(wx),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(hp), np.asarray(hx),
                                   rtol=1e-4, atol=1e-6)

    def test_inner_iter_accelerates_per_outer_iteration(self, problem):
        xs, w, h = problem
        w1, h1 = mu_iterations_pallas(
            xs, w, h, 10, block_b=B, interpret=True, inner_iter=1
        )
        w3, h3 = mu_iterations_pallas(
            xs, w, h, 10, block_b=B, interpret=True, inner_iter=3
        )
        l1 = float(jnp.linalg.norm(xs - w1 @ h1))
        l3 = float(jnp.linalg.norm(xs - w3 @ h3))
        assert l3 < l1


class TestCDKernel:
    def test_matches_xla_solver(self, problem):
        xs, w, h = problem
        wp, hp = cd_iterations_pallas(xs, w, h, 5, block_b=B, interpret=True)
        ref = jax.vmap(
            lambda x, w0, h0: fit_cd(x, w0, h0, max_iter=5, tol=0.0)
        )(xs, w, h)
        np.testing.assert_allclose(
            np.asarray(wp), np.asarray(ref.w), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(hp),
            np.asarray(jnp.swapaxes(ref.ht, -1, -2)),
            rtol=1e-4,
            atol=1e-5,
        )

    def test_nonnegative_outputs(self, problem):
        xs, w, h = problem
        wp, hp = cd_iterations_pallas(xs, w, h, 10, block_b=B, interpret=True)
        assert float(jnp.min(wp)) >= 0.0
        assert float(jnp.min(hp)) >= 0.0


class TestFitMUKernel:
    def test_exact_stopping_parity_with_xla_fit(self, problem):
        from muscle_synergies_tpu.models.batch import fit_mu_batch
        from muscle_synergies_tpu.models.kernels import fit_mu_pallas

        xs, w, h = problem
        # structured data so trials converge at different iterations
        rng = np.random.default_rng(4)
        wt = rng.random((B, N, 2))
        ht = rng.random((B, 2, L))
        xs2 = jnp.asarray(wt @ ht + 0.01 * rng.random((B, N, L)),
                          dtype=jnp.float32)
        wp, hp, n_iter, prev_err, conv = fit_mu_pallas(
            xs2, w, h, max_iter=2000, tol=1e-5, block_b=B, interpret=True
        )
        ref = fit_mu_batch(xs2, w, h, max_iter=2000, tol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(n_iter), np.asarray(ref.n_iter)
        )
        np.testing.assert_array_equal(
            np.asarray(conv), np.asarray(ref.converged)
        )
        np.testing.assert_allclose(
            np.asarray(wp), np.asarray(ref.w), rtol=1e-4, atol=1e-5
        )
        # same field semantics as the XLA path: error at each trial's
        # last convergence check, not a freshly recomputed final error
        np.testing.assert_allclose(
            np.asarray(prev_err), np.asarray(ref.previous_error),
            rtol=1e-4, atol=1e-6,
        )

    def test_max_iter_cap(self, problem):
        from muscle_synergies_tpu.models.kernels import fit_mu_pallas

        xs, w, h = problem
        _, _, n_iter, _, conv = fit_mu_pallas(
            xs, w, h, max_iter=30, tol=1e-12, block_b=B, interpret=True
        )
        assert np.all(np.asarray(n_iter) == 30)
        assert not np.any(np.asarray(conv))

    def test_tol_zero_disables_convergence_check(self, problem):
        """tol=0 must run to max_iter, like the XLA fit's static branch.

        A near-converged f32 trial can see its Frobenius error tick up
        at a checkpoint; with tol=0 the kernel must not interpret that
        as convergence (reference point: sklearn treats tol=0 as "run
        all of max_iter").
        """
        from muscle_synergies_tpu.models.kernels import fit_mu_pallas

        xs, w, h = problem
        # structured, fast-converging data maximizes the chance of an
        # error uptick at some checkpoint
        rng = np.random.default_rng(11)
        wt = rng.random((B, N, 2))
        ht = rng.random((B, 2, L))
        xs2 = jnp.asarray(wt @ ht, dtype=jnp.float32)
        wp, hp, n_iter, prev_err, conv = fit_mu_pallas(
            xs2, w, h, max_iter=200, tol=0.0, block_b=B, interpret=True
        )
        assert np.all(np.asarray(n_iter) == 200)
        assert not np.any(np.asarray(conv))
        # factors equal the plain 200-iteration run (no frozen trials)
        wi, hi = mu_iterations_pallas(xs2, w, h, 200, block_b=B,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(wp), np.asarray(wi),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(hp), np.asarray(hi),
                                   rtol=1e-6, atol=1e-7)


def test_fit_mu_batch_pallas_impl(problem=None):
    from muscle_synergies_tpu.models.batch import fit_mu_batch, init_batch

    rng = np.random.default_rng(7)
    wt = rng.random((8, 32, 2))
    ht = rng.random((8, 2, 6))
    xs = jnp.asarray(wt @ ht + 0.01 * rng.random((8, 32, 6)),
                     dtype=jnp.float32)
    w0, h0 = init_batch(xs, 2, init="nndsvda")
    w0, h0 = w0.astype(jnp.float32), h0.astype(jnp.float32)
    # interpret path not plumbed through fit_mu_batch; on CPU tests the
    # pallas backend runs in Mosaic-interpret via force flag
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        state_p = fit_mu_batch(xs, w0, h0, max_iter=500, tol=1e-5,
                               impl="pallas")
    state_x = fit_mu_batch(xs, w0, h0, max_iter=500, tol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(state_p.n_iter), np.asarray(state_x.n_iter)
    )
    np.testing.assert_allclose(
        np.asarray(state_p.w), np.asarray(state_x.w), rtol=1e-4, atol=1e-5
    )


class TestKLKernel:
    def test_matches_beta_updates(self, problem):
        from muscle_synergies_tpu.models.beta import mu_update_beta
        from muscle_synergies_tpu.models.kernels import kl_mu_iterations_pallas

        xs, w, h = problem
        wp, hp = kl_mu_iterations_pallas(xs, w, h, 7, block_b=B,
                                         interpret=True)
        wr, hr = w, h
        for _ in range(7):
            out = jax.vmap(lambda x, wi, hi: mu_update_beta(x, wi, hi, 1.0))(
                xs, wr, hr
            )
            wr, hr = out
        np.testing.assert_allclose(np.asarray(wp), np.asarray(wr),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(hp), np.asarray(hr),
                                   rtol=1e-4, atol=1e-6)

    def test_kl_divergence_decreases(self, problem):
        from muscle_synergies_tpu.models.beta import beta_divergence
        from muscle_synergies_tpu.models.kernels import kl_mu_iterations_pallas

        xs, w, h = problem
        w1, h1 = kl_mu_iterations_pallas(xs, w, h, 1, block_b=B,
                                         interpret=True)
        w30, h30 = kl_mu_iterations_pallas(xs, w, h, 30, block_b=B,
                                           interpret=True)
        d1 = sum(float(beta_divergence(xs[i], w1[i], h1[i], 1.0))
                 for i in range(B))
        d30 = sum(float(beta_divergence(xs[i], w30[i], h30[i], 1.0))
                  for i in range(B))
        assert d30 < d1


def test_is_kernel_matches_beta_updates(problem):
    """Itakura-Saito kernel vs the XLA beta updates (beta=0)."""
    from muscle_synergies_tpu.models.beta import mu_update_beta
    from muscle_synergies_tpu.models.kernels import beta_mu_iterations_pallas

    xs, w, h = problem
    xs = xs + 0.05  # strictly positive for IS
    wp, hp = beta_mu_iterations_pallas(xs, w, h, 6, beta=0.0, block_b=B,
                                       interpret=True)
    wr, hr = w, h
    for _ in range(6):
        wr, hr = jax.vmap(lambda x, wi, hi: mu_update_beta(x, wi, hi, 0.0))(
            xs, wr, hr
        )
    np.testing.assert_allclose(np.asarray(wp), np.asarray(wr),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hp), np.asarray(hr),
                               rtol=1e-4, atol=1e-6)


class TestFitCDKernel:
    def test_exact_stopping_parity_with_xla_fit(self, problem):
        from muscle_synergies_tpu.models.batch import fit_cd_batch
        from muscle_synergies_tpu.models.kernels import fit_cd_pallas

        xs, w, h = problem
        rng = np.random.default_rng(5)
        wt = rng.random((B, N, 2))
        ht = rng.random((B, 2, L))
        xs2 = jnp.asarray(wt @ ht + 0.01 * rng.random((B, N, L)),
                          dtype=jnp.float32)
        wp, hp, n_iter, viol_init, conv = fit_cd_pallas(
            xs2, w, h, max_iter=500, tol=1e-4, block_b=B, interpret=True
        )
        ref = fit_cd_batch(xs2, w, h, max_iter=500, tol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(n_iter), np.asarray(ref.n_iter)
        )
        np.testing.assert_array_equal(
            np.asarray(conv), np.asarray(ref.converged)
        )
        np.testing.assert_allclose(
            np.asarray(wp), np.asarray(ref.w), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(hp), np.asarray(jnp.swapaxes(ref.ht, -1, -2)),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(viol_init), np.asarray(ref.violation_init),
            rtol=1e-4,
        )

    def test_batch_impl_pallas_roundtrip(self, problem):
        """fit_cd_batch(impl='pallas') returns a CDState-shaped result."""
        from jax.experimental.pallas import tpu as pltpu

        from muscle_synergies_tpu.models.batch import fit_cd_batch

        xs, w, h = problem
        with pltpu.force_tpu_interpret_mode():
            state = fit_cd_batch(
                xs, w, h, max_iter=50, tol=1e-4, impl="pallas", block_b=B
            )
        assert state.w.shape == (B, N, K)
        assert state.ht.shape == (B, L, K)

    def test_max_iter_cap(self, problem):
        from muscle_synergies_tpu.models.kernels import fit_cd_pallas

        xs, w, h = problem
        _, _, n_iter, _, conv = fit_cd_pallas(
            xs, w, h, max_iter=20, tol=0.0, block_b=B, interpret=True
        )
        assert np.all(np.asarray(n_iter) == 20)
        assert not np.any(np.asarray(conv))


class TestCNMFKernel:
    """Convolutive-NMF kernel vs the lag-stacked XLA updates."""

    D = 6

    @pytest.fixture(scope="class")
    def cnmf_problem(self):
        rng = np.random.default_rng(91)
        xs = jnp.asarray(rng.uniform(0.1, 1.0, (B, N, L)), jnp.float32)
        c = jnp.asarray(rng.uniform(0.1, 1.0, (B, N, K)), jnp.float32)
        s = jnp.asarray(
            rng.uniform(0.1, 1.0, (B, K, self.D, L)), jnp.float32
        )
        return xs, c, s

    def test_matches_xla_updates(self, cnmf_problem):
        from muscle_synergies_tpu.models.cnmf import cnmf_iterations_batch
        from muscle_synergies_tpu.models.kernels import (
            cnmf_iterations_pallas,
        )

        xs, c, s = cnmf_problem
        cp, sp = cnmf_iterations_pallas(xs, c, s, 5, block_b=B,
                                        interpret=True)
        cx, sx = cnmf_iterations_batch(xs, c, s, 5)
        np.testing.assert_allclose(np.asarray(cp), np.asarray(cx),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sp), np.asarray(sx),
                                   rtol=1e-4, atol=1e-6)

    def test_batch_dispatch_impl_pallas(self, cnmf_problem):
        from jax.experimental.pallas import tpu as pltpu

        from muscle_synergies_tpu.models.cnmf import cnmf_iterations_batch

        xs, c, s = cnmf_problem
        with pltpu.force_tpu_interpret_mode():
            cp, sp = cnmf_iterations_batch(
                xs, c, s, 3, impl="pallas", block_b=B
            )
        cx, sx = cnmf_iterations_batch(xs, c, s, 3)
        np.testing.assert_allclose(np.asarray(cp), np.asarray(cx),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sp), np.asarray(sx),
                                   rtol=1e-4, atol=1e-6)

    def test_update_c_false_requires_xla(self, cnmf_problem):
        from muscle_synergies_tpu.models.cnmf import cnmf_iterations_batch

        xs, c, s = cnmf_problem
        with pytest.raises(ValueError, match="update_c"):
            cnmf_iterations_batch(
                xs, c, s, 3, update_c=False, impl="pallas", block_b=B
            )

    def test_bad_block_size(self, cnmf_problem):
        from muscle_synergies_tpu.models.kernels import (
            cnmf_iterations_pallas,
        )

        xs, c, s = cnmf_problem
        with pytest.raises(ValueError, match="multiple"):
            cnmf_iterations_pallas(xs, c, s, 1, block_b=3)

    def test_error_decreases(self, cnmf_problem):
        from muscle_synergies_tpu.models.cnmf import cnmf_reconstruct
        from muscle_synergies_tpu.models.kernels import (
            cnmf_iterations_pallas,
        )

        xs, c, s = cnmf_problem
        c1, s1 = cnmf_iterations_pallas(xs, c, s, 1, block_b=B,
                                        interpret=True)
        c20, s20 = cnmf_iterations_pallas(xs, c, s, 20, block_b=B,
                                          interpret=True)
        rec = jax.vmap(cnmf_reconstruct)
        e1 = float(jnp.linalg.norm(xs - rec(c1, s1)))
        e20 = float(jnp.linalg.norm(xs - rec(c20, s20)))
        assert e20 < e1
