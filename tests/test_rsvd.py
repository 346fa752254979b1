"""Bit-exact parity of the host-side randomized SVD / default NMF init.

sklearn's default NMF init is NNDSVDA over ``randomized_svd`` with a
``RandomState`` stream; :mod:`muscle_synergies_tpu.models.rsvd`
replicates it bit-for-bit so *default-init* solver trajectories (not
just losses) match sklearn iterate-by-iterate.
"""

import numpy as np
import pytest
from sklearn.decomposition import NMF as SkNMF
from sklearn.decomposition._nmf import _initialize_nmf as sk_initialize_nmf
from sklearn.utils.extmath import randomized_svd as sk_randomized_svd

from muscle_synergies_tpu.models import (
    NMFModel,
    fit_cd,
    fit_mu,
    initialize_nmf,
    initialize_nmf_sklearn,
    randomized_svd,
)

RNG = np.random.default_rng(7)

# Shapes cover both transpose branches (tall / wide), the square-ish
# case, and — via (300, 200) with k=4 < 0.1 * 200 — the n_iter=7 /
# LU-normalized power-iteration branch.
SHAPES = [(200, 8), (8, 200), (50, 40), (300, 200)]


def _nonneg(shape, rng=RNG):
    return np.abs(rng.standard_normal(shape))


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("seed", [0, 42])
def test_randomized_svd_bit_matches_sklearn(shape, seed):
    x = _nonneg(shape)
    k = min(4, min(shape))
    mine = randomized_svd(x, k, random_state=seed)
    ref = sk_randomized_svd(x, k, random_state=seed)
    for a, b in zip(mine, ref):
        assert a.shape == b.shape
        assert (a == b).all()


def test_randomized_svd_float32_path():
    x = _nonneg((100, 12)).astype(np.float32)
    mine = randomized_svd(x, 3, random_state=5)
    ref = sk_randomized_svd(x, 3, random_state=5)
    for a, b in zip(mine, ref):
        assert a.dtype == b.dtype
        assert (a == b).all()


@pytest.mark.parametrize(
    "init", [None, "nndsvd", "nndsvda", "nndsvdar", "random"]
)
def test_initialize_nmf_sklearn_bit_matches(init):
    x = _nonneg((150, 10))
    w1, h1 = initialize_nmf_sklearn(x, 4, init=init, random_state=3)
    w2, h2 = sk_initialize_nmf(x, 4, init=init, random_state=3)
    assert (w1 == w2).all() and (h1 == h2).all()


def test_initialize_nmf_randomized_dispatch():
    x = _nonneg((150, 10))
    w, h = initialize_nmf(x, 4, svd_method="randomized", seed=3)
    w_ref, h_ref = sk_initialize_nmf(x, 4, init=None, random_state=3)
    np.testing.assert_array_equal(np.asarray(w), w_ref)
    np.testing.assert_array_equal(np.asarray(h), h_ref)


def test_initialize_nmf_rejects_unknown_svd_method():
    with pytest.raises(ValueError, match="svd_method"):
        initialize_nmf(_nonneg((20, 5)), 2, svd_method="qr")


def test_initialize_nmf_sklearn_validation():
    with pytest.raises(ValueError, match="Negative"):
        initialize_nmf_sklearn(-np.ones((10, 4)), 2)
    with pytest.raises(ValueError, match="n_components"):
        initialize_nmf_sklearn(_nonneg((10, 4)), 6, init="nndsvd")
    with pytest.raises(ValueError, match="Invalid init"):
        initialize_nmf_sklearn(_nonneg((10, 4)), 2, init="svd")


class TestDefaultInitTrajectoryParity:
    """Same default init -> same iterates, for both solvers."""

    def _x(self):
        rng = np.random.default_rng(3)
        w = rng.random((120, 4))
        h = rng.random((4, 8))
        return np.maximum(w @ h + 0.02 * rng.random((120, 8)), 0)

    def test_mu_default_init_trajectory(self):
        x = self._x()
        for max_iter in (10, 100):
            sk = SkNMF(
                n_components=4,
                solver="mu",
                max_iter=max_iter,
                tol=1e-12,
                random_state=0,
            )
            w_sk = sk.fit_transform(x)
            w0, h0 = initialize_nmf(x, 4, svd_method="randomized", seed=0)
            state = fit_mu(x, w0, h0, max_iter=max_iter, tol=1e-12)
            np.testing.assert_allclose(
                np.asarray(state.w), w_sk, rtol=1e-8, atol=1e-12
            )
            np.testing.assert_allclose(
                np.asarray(state.h), sk.components_, rtol=1e-8, atol=1e-12
            )

    def test_cd_default_init_trajectory(self):
        x = self._x()
        sk = SkNMF(
            n_components=4, solver="cd", max_iter=50, tol=1e-12, random_state=0
        )
        w_sk = sk.fit_transform(x)
        w0, h0 = initialize_nmf(x, 4, svd_method="randomized", seed=0)
        state = fit_cd(x, w0, h0, max_iter=50, tol=1e-12)
        np.testing.assert_allclose(
            np.asarray(state.w), w_sk, rtol=1e-7, atol=1e-11
        )
        np.testing.assert_allclose(
            np.asarray(state.ht.T), sk.components_, rtol=1e-7, atol=1e-11
        )

    def test_nmfmodel_default_init_matches_sklearn(self):
        x = self._x()
        sk = SkNMF(
            n_components=4, solver="mu", max_iter=200, tol=1e-6, random_state=0
        )
        w_sk = sk.fit_transform(x)
        model = NMFModel(
            n_components=4,
            solver="mu",
            max_iter=200,
            tol=1e-6,
            random_state=0,
            svd_method="randomized",
        )
        w = model.fit_transform(x)
        assert model.n_iter_ == sk.n_iter_
        np.testing.assert_allclose(w, w_sk, rtol=1e-8, atol=1e-12)
        np.testing.assert_allclose(
            model.components_, sk.components_, rtol=1e-8, atol=1e-12
        )
