"""sklearn parity for the NMF solver suite.

North-star requirement (BASELINE.md): match
``sklearn.decomposition.NMF`` reconstruction error to 1e-6.  Trajectory
parity is checked with identical custom inits (same starting point ->
same update rules -> same iterates); end-to-end parity via the default
init path at loss level.
"""

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
from sklearn.decomposition import NMF as SkNMF

import muscle_synergies_tpu as mst
from muscle_synergies_tpu.models import (
    NMFModel,
    fit_cd,
    fit_mu,
    frobenius_error,
    initialize_nmf,
)

RNG = np.random.default_rng(3)

N, L, K = 120, 8, 4


def _factorizable(n=N, l=L, k=K, noise=0.02, rng=RNG):
    w = rng.random((n, k))
    h = rng.random((k, l))
    x = w @ h + noise * rng.random((n, l))
    return np.maximum(x, 0)


@pytest.fixture(scope="module")
def x():
    return _factorizable()


@pytest.fixture(scope="module")
def custom_init(x):
    rng = np.random.default_rng(11)
    avg = np.sqrt(x.mean() / K)
    w0 = avg * np.abs(rng.standard_normal((N, K)))
    h0 = avg * np.abs(rng.standard_normal((K, L)))
    return w0, h0


class TestMUSolver:
    def test_trajectory_matches_sklearn(self, x, custom_init):
        w0, h0 = custom_init
        for max_iter in (10, 50, 200):
            sk = SkNMF(
                n_components=K,
                solver="mu",
                init="custom",
                max_iter=max_iter,
                tol=1e-12,
            )
            w_sk = sk.fit_transform(x, W=w0.copy(), H=h0.copy())
            state = fit_mu(x, w0, h0, max_iter=max_iter, tol=1e-12)
            np.testing.assert_allclose(np.asarray(state.w), w_sk, rtol=1e-8)
            np.testing.assert_allclose(
                np.asarray(state.h), sk.components_, rtol=1e-8
            )

    def test_convergence_iteration_matches_sklearn(self, x, custom_init):
        w0, h0 = custom_init
        sk = SkNMF(
            n_components=K, solver="mu", init="custom", max_iter=5000, tol=1e-6
        )
        sk.fit_transform(x, W=w0.copy(), H=h0.copy())
        state = fit_mu(x, w0, h0, max_iter=5000, tol=1e-6)
        assert int(state.n_iter) == sk.n_iter_

    def test_loss_parity_1e6(self, x, custom_init):
        w0, h0 = custom_init
        sk = SkNMF(
            n_components=K, solver="mu", init="custom", max_iter=2000, tol=1e-6
        )
        sk.fit_transform(x, W=w0.copy(), H=h0.copy())
        state = fit_mu(x, w0, h0, max_iter=2000, tol=1e-6)
        ours = float(frobenius_error(x, state.w, state.h))
        assert abs(ours - sk.reconstruction_err_) < 1e-6


class TestCDSolver:
    def test_trajectory_matches_sklearn(self, x, custom_init):
        w0, h0 = custom_init
        for max_iter in (5, 50, 500):
            sk = SkNMF(
                n_components=K,
                solver="cd",
                init="custom",
                max_iter=max_iter,
                tol=1e-14,
            )
            w_sk = sk.fit_transform(x, W=w0.copy(), H=h0.copy())
            state = fit_cd(x, w0, h0, max_iter=max_iter, tol=1e-14)
            np.testing.assert_allclose(np.asarray(state.w), w_sk, rtol=1e-7, atol=1e-12)
            np.testing.assert_allclose(
                np.asarray(state.ht.T), sk.components_, rtol=1e-7, atol=1e-12
            )

    def test_convergence_iteration_matches_sklearn(self, x, custom_init):
        w0, h0 = custom_init
        sk = SkNMF(
            n_components=K, solver="cd", init="custom", max_iter=5000, tol=1e-6
        )
        sk.fit_transform(x, W=w0.copy(), H=h0.copy())
        state = fit_cd(x, w0, h0, max_iter=5000, tol=1e-6)
        assert int(state.n_iter) == sk.n_iter_

    def test_regularized_matches_sklearn(self, x, custom_init):
        w0, h0 = custom_init
        sk = SkNMF(
            n_components=K,
            solver="cd",
            init="custom",
            max_iter=300,
            tol=1e-10,
            alpha_W=0.01,
            l1_ratio=0.5,
        )
        w_sk = sk.fit_transform(x, W=w0.copy(), H=h0.copy())
        model = NMFModel(
            n_components=K,
            solver="cd",
            max_iter=300,
            tol=1e-10,
            alpha_W=0.01,
            l1_ratio=0.5,
        )
        w_ours = model.fit_transform(x, w=w0, h=h0)
        np.testing.assert_allclose(w_ours, w_sk, rtol=1e-6, atol=1e-10)
        np.testing.assert_allclose(
            model.components_, sk.components_, rtol=1e-6, atol=1e-10
        )


class TestInit:
    @pytest.mark.parametrize("variant", ["nndsvd", "nndsvda"])
    def test_nndsvd_matches_sklearn(self, x, variant):
        from sklearn.decomposition._nmf import _initialize_nmf

        w_sk, h_sk = _initialize_nmf(x, K, init=variant, random_state=0)
        w, h = initialize_nmf(x, K, init=variant)
        # randomized vs exact SVD may differ slightly; factors must
        # agree closely in this tiny, well-separated regime.
        np.testing.assert_allclose(np.asarray(w), w_sk, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(h), h_sk, rtol=1e-5, atol=1e-6)

    def test_invalid_rank_raises(self, x):
        with pytest.raises(ValueError, match="n_components"):
            initialize_nmf(x, L + 1, init="nndsvd")

    def test_random_init_shapes_and_scale(self, x):
        w, h = initialize_nmf(x, K, init="random", seed=1)
        assert w.shape == (N, K) and h.shape == (K, L)
        assert np.all(np.asarray(w) >= 0) and np.all(np.asarray(h) >= 0)


class TestNMFModelEndToEnd:
    def test_default_path_loss_parity(self, x):
        # both use nndsvda init + cd solver; final loss must agree to
        # the 1e-6 north star even though SVDs may differ in sign detail
        sk = SkNMF(n_components=K, max_iter=2000, tol=1e-6)
        sk.fit_transform(x)
        model = NMFModel(n_components=K, max_iter=2000, tol=1e-6)
        model.fit_transform(x)
        assert abs(model.reconstruction_err_ - sk.reconstruction_err_) < 1e-6

    def test_rejects_negative_input(self, x):
        model = NMFModel(n_components=2)
        with pytest.raises(ValueError, match="Negative"):
            model.fit_transform(x - 1.0)

    def test_transform_after_fit(self, x):
        model = NMFModel(n_components=K, max_iter=500, tol=1e-8)
        model.fit(x)
        w = model.transform(x)
        rel = np.linalg.norm(x - w @ model.components_) / np.linalg.norm(x)
        assert rel < 0.05


class TestFindSynergies:
    @pytest.fixture(scope="class")
    def emg_df(self):
        x = _factorizable(n=200, l=8, k=3, rng=np.random.default_rng(5))
        cols = ["VL", "RF", "GMED", "TFL", "GMAXS", "GMAXI", "BF", "ST"]
        return pd.DataFrame(x, columns=cols)

    def test_single_rank(self, emg_df):
        res = mst.find_synergies(emg_df, 3, max_iter=3000, tol=1e-6)
        assert res.vaf_values.shape == (1, 9)
        assert res.components.shape == (3, 8)
        assert list(res.components.columns) == list(emg_df.columns)
        assert res.vaf_values["All signals"].iloc[0] > 0.99
        assert res.model.n_iter_ > 0

    def test_rank_sweep(self, emg_df):
        res = mst.find_synergies(emg_df, 1, 4, max_iter=3000, tol=1e-6)
        assert list(res.vaf_values.index) == [1, 2, 3, 4]
        assert set(res.components.keys()) == {1, 2, 3, 4}
        vafs = res.vaf_values["All signals"].to_numpy()
        assert np.all(np.diff(vafs) >= -1e-9)  # VAF grows with rank
        assert vafs[2] > 0.99  # true rank is 3

    def test_vaf_matches_sklearn_pipeline(self, emg_df):
        sk = SkNMF(n_components=3, max_iter=3000, tol=1e-6)
        w = sk.fit_transform(emg_df.to_numpy())
        res = mst.find_synergies(emg_df, 3, max_iter=3000, tol=1e-6)
        err = emg_df.to_numpy() - w @ sk.components_
        sk_vaf = 1 - (err**2).sum() / (emg_df.to_numpy() ** 2).sum()
        assert abs(res.vaf_values["All signals"].iloc[0] - sk_vaf) < 1e-6

    def test_validation(self, emg_df):
        with pytest.raises(ValueError, match="invalid number"):
            mst.find_synergies(emg_df, 0)
        with pytest.raises(ValueError, match="invalid number"):
            mst.find_synergies(emg_df, 9)
        with pytest.raises(ValueError, match="invalid number"):
            mst.find_synergies(emg_df, 3, 2)
        with pytest.raises(ValueError, match="empty"):
            mst.find_synergies(emg_df.iloc[:0], 2)

    @pytest.mark.parametrize("solver", ["cd", "mu"])
    def test_batched_sweep_matches_loop(self, emg_df, solver):
        """sweep='batched' (one padded device solve) equals the loop."""
        loop = mst.find_synergies(
            emg_df, 1, 4, max_iter=3000, tol=1e-6, solver=solver
        )
        batched = mst.find_synergies(
            emg_df, 1, 4, max_iter=3000, tol=1e-6, solver=solver,
            sweep="batched",
        )
        assert list(batched.vaf_values.index) == [1, 2, 3, 4]
        for k in (1, 2, 3, 4):
            assert batched.model[k].n_iter_ == loop.model[k].n_iter_, k
            np.testing.assert_allclose(
                batched.components[k].to_numpy(),
                loop.components[k].to_numpy(),
                rtol=1e-7,
                atol=1e-10,
            )
        np.testing.assert_allclose(
            batched.vaf_values.to_numpy(),
            loop.vaf_values.to_numpy(),
            rtol=1e-9,
        )

    def test_batched_sweep_rejects_unsupported_kwargs(self, emg_df):
        with pytest.raises(ValueError, match="does not support"):
            mst.find_synergies(
                emg_df, 1, 3, sweep="batched", nonsense_kwarg=0.1
            )
        with pytest.raises(ValueError, match="unknown sweep"):
            mst.find_synergies(emg_df, 1, 3, sweep="bogus")

    @pytest.mark.parametrize("solver", ["cd", "mu"])
    def test_batched_sweep_regularized_matches_loop(self, emg_df, solver):
        """Batched sweeps with L1/L2 penalties equal the loop path.

        The one-dispatch sweep supports sklearn's full sparsity
        surface (VERDICT r3 item 5): penalties reach the vmapped
        solvers and every rank's iterate matches an independent fit.
        """
        kwargs = dict(
            max_iter=3000, tol=1e-6, solver=solver, alpha_W=0.01,
            l1_ratio=0.5,
        )
        loop = mst.find_synergies(emg_df, 1, 4, **kwargs)
        batched = mst.find_synergies(emg_df, 1, 4, sweep="batched", **kwargs)
        for k in (1, 2, 3, 4):
            assert batched.model[k].n_iter_ == loop.model[k].n_iter_, k
            np.testing.assert_allclose(
                batched.components[k].to_numpy(),
                loop.components[k].to_numpy(),
                rtol=1e-7,
                atol=1e-10,
            )
            assert batched.model[k].alpha_W == 0.01

    def test_batched_sweep_legacy_alpha_matches_loop(self, emg_df):
        """The sklearn <= 0.24 alpha=/regularization= spelling too."""
        kwargs = dict(
            max_iter=2000, tol=1e-6, solver="mu", alpha=0.02,
            regularization="components", l1_ratio=0.3,
        )
        loop = mst.find_synergies(emg_df, 2, 3, **kwargs)
        batched = mst.find_synergies(emg_df, 2, 3, sweep="batched", **kwargs)
        for k in (2, 3):
            assert batched.model[k].n_iter_ == loop.model[k].n_iter_, k
            np.testing.assert_allclose(
                batched.components[k].to_numpy(),
                loop.components[k].to_numpy(),
                rtol=1e-7,
                atol=1e-10,
            )

    def test_batched_sweep_inner_iter_matches_loop(self, emg_df):
        """inner_iter (accelerated MU) threads through both sweep modes."""
        kwargs = dict(max_iter=2000, tol=1e-6, solver="mu", inner_iter=3)
        loop = mst.find_synergies(emg_df, 1, 3, **kwargs)
        batched = mst.find_synergies(emg_df, 1, 3, sweep="batched", **kwargs)
        for k in (1, 2, 3):
            assert batched.model[k].n_iter_ == loop.model[k].n_iter_, k
            np.testing.assert_allclose(
                batched.components[k].to_numpy(),
                loop.components[k].to_numpy(),
                rtol=1e-7,
                atol=1e-10,
            )
        with pytest.raises(ValueError, match="inner_iter"):
            mst.find_synergies(
                emg_df, 1, 3, sweep="batched", solver="cd", inner_iter=2
            )

    @pytest.mark.parametrize("solver", ["cd", "mu"])
    def test_padded_components_stay_zero_under_penalties(self, solver):
        """Zero-padded sweep components remain EXACTLY zero with L1/L2.

        MU: a padded component's update numerator (X Ht / Wt X columns)
        is identically zero, and penalties only enter denominators.
        CD: the Newton step from zero is max(0, -l1/hess) = 0.
        """
        from muscle_synergies_tpu.models.batch import rank_sweep_batch

        rng = np.random.default_rng(7)
        x = jnp.asarray(np.abs(rng.random((60, 6))) + 0.05)
        states, _ = rank_sweep_batch(
            x, [1, 2, 3], solver=solver, max_iter=50, tol=0.0,
            l1_reg_w=0.3, l2_reg_w=0.2, l1_reg_h=0.25, l2_reg_h=0.15,
        )
        if solver == "mu":
            w_all, h_all = np.asarray(states.w), np.asarray(states.h)
        else:
            w_all = np.asarray(states.w)
            h_all = np.asarray(jnp.swapaxes(states.ht, -1, -2))
        for i, k in enumerate([1, 2, 3]):
            assert np.all(w_all[i][:, k:] == 0.0), (solver, k)
            assert np.all(h_all[i][k:, :] == 0.0), (solver, k)


class TestAcceleratedMU:
    def test_inner_iter_one_is_sklearn_exact(self, x, custom_init):
        # already covered by trajectory tests; assert the default
        import inspect

        from muscle_synergies_tpu.models.mu import fit_mu as f

        assert inspect.signature(f).parameters["inner_iter"].default == 1

    def test_inner_iter_accelerates_convergence(self, x, custom_init):
        from muscle_synergies_tpu.models import fit_mu, frobenius_error

        w0, h0 = custom_init
        plain = fit_mu(x, w0, h0, max_iter=100, tol=0.0)
        accel = fit_mu(x, w0, h0, max_iter=100, tol=0.0, inner_iter=3)
        loss_plain = float(frobenius_error(x, plain.w, plain.h))
        loss_accel = float(frobenius_error(x, accel.w, accel.h))
        # same outer-iteration budget: inner repeats must not hurt and
        # should typically help
        assert loss_accel <= loss_plain * 1.0001

    def test_inner_iter_monotone_loss(self, x, custom_init):
        from muscle_synergies_tpu.models import frobenius_error, mu_update

        w, h = custom_init
        prev = float(frobenius_error(x, w, h))
        for _ in range(10):
            w, h = mu_update(x, w, h, inner_iter=2)
            cur = float(frobenius_error(x, w, h))
            assert cur <= prev + 1e-9
            prev = cur


def test_custom_init_requires_factors():
    from muscle_synergies_tpu.models import NMFModel

    rng = np.random.default_rng(0)
    data = np.abs(rng.random((30, 5)))
    model = NMFModel(n_components=2, init="custom")
    with pytest.raises(ValueError, match="custom"):
        model.fit_transform(data)
    # with factors, works like sklearn's init='custom'
    w0 = np.abs(rng.random((30, 2)))
    h0 = np.abs(rng.random((2, 5)))
    w = model.fit_transform(data, w=w0, h=h0)
    assert w.shape == (30, 2)


def test_convergence_warning_matches_sklearn():
    """A fit that exhausts max_iter warns, exactly like sklearn."""
    from sklearn.exceptions import ConvergenceWarning

    rng = np.random.default_rng(31)
    x = rng.random((80, 8)) + 0.01
    with pytest.warns(ConvergenceWarning, match="Maximum number of"):
        mst.NMFModel(n_components=3, max_iter=5, tol=1e-12).fit(x)

    # tol=0 disables the check and must not warn
    import warnings as _warnings

    with _warnings.catch_warnings():
        _warnings.simplefilter("error", ConvergenceWarning)
        mst.NMFModel(n_components=3, max_iter=5, tol=0.0).fit(x)

    # batched sweeps warn per unconverged rank
    df = pd.DataFrame(x, columns=[f"m{i}" for i in range(8)])
    with pytest.warns(ConvergenceWarning):
        mst.find_synergies(df, 1, 3, max_iter=5, tol=1e-12, sweep="batched")
