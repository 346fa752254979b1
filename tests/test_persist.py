"""Round-trip tests for the pickle-free model persistence layer.

The reference keeps fitted sklearn NMF objects inside
``SynergyRunResult.model`` (reference analysis.py:713-914) and relies
on pickle for persistence; ``models/persist.py`` replaces that with a
single-npz format.  These tests pin the round-trip guarantee: a loaded
model's ``transform`` / ``inverse_transform`` reproduce the original
bit-for-bit, DataFrames keep their muscle-name columns, and the loader
rejects foreign payloads without executing anything.
"""

import numpy as np
import pandas
import pytest

from muscle_synergies_tpu.models import (
    CNMFModel,
    NM3FModel,
    NMFModel,
    SynergyRunResult,
    find_synergies,
    load_model,
    load_synergy_run,
    save_model,
    save_synergy_run,
)

RNG = np.random.default_rng(7)

MUSCLES = [f"m{i}" for i in range(5)]


def _emg_df(n=60, l=5):
    w = RNG.uniform(0.1, 1.0, size=(n, 3))
    h = RNG.uniform(0.1, 1.0, size=(3, l))
    return pandas.DataFrame(w @ h, columns=MUSCLES)


def _assert_models_equal(a: NMFModel, b: NMFModel, x):
    np.testing.assert_array_equal(a.components_, b.components_)
    assert a.n_components_ == b.n_components_
    assert a.n_iter_ == b.n_iter_
    assert a.reconstruction_err_ == b.reconstruction_err_
    assert a.solver == b.solver
    assert a.beta_loss == b.beta_loss
    assert a._legacy_alpha == b._legacy_alpha
    np.testing.assert_array_equal(a.transform(x), b.transform(x))


class TestNMFModel:
    def test_round_trip_cd(self, tmp_path):
        x = _emg_df()
        model = NMFModel(n_components=2, random_state=0, max_iter=300).fit(x)
        path = save_model(model, tmp_path / "nmf.npz")
        loaded = load_model(path)
        assert isinstance(loaded, NMFModel)
        _assert_models_equal(model, loaded, x)
        np.testing.assert_array_equal(
            model.inverse_transform(model.transform(x)),
            loaded.inverse_transform(loaded.transform(x)),
        )

    def test_round_trip_mu_kl(self, tmp_path):
        x = _emg_df()
        model = NMFModel(
            n_components=2, solver="mu", beta_loss="kullback-leibler",
            random_state=1, max_iter=200,
        ).fit(x)
        loaded = load_model(save_model(model, tmp_path / "kl"))
        _assert_models_equal(model, loaded, x)

    def test_round_trip_float_beta_and_sparsity(self, tmp_path):
        x = _emg_df()
        model = NMFModel(
            n_components=2, solver="mu", beta_loss=1.5, alpha_W=0.01,
            l1_ratio=0.5, random_state=2, max_iter=150,
        ).fit(x)
        loaded = load_model(save_model(model, tmp_path / "beta"))
        assert loaded.beta_loss == 1.5
        assert loaded.alpha_W == 0.01 and loaded.l1_ratio == 0.5
        _assert_models_equal(model, loaded, x)

    def test_round_trip_legacy_alpha(self, tmp_path):
        x = _emg_df()
        model = NMFModel(
            n_components=2, solver="mu", alpha=0.02,
            regularization="components", random_state=3, max_iter=150,
        ).fit(x)
        loaded = load_model(save_model(model, tmp_path / "legacy"))
        assert loaded._legacy_alpha == (0.02, "components")
        _assert_models_equal(model, loaded, x)

    def test_save_appends_npz_suffix(self, tmp_path):
        model = NMFModel(n_components=2, random_state=0).fit(_emg_df())
        path = model.save(tmp_path / "bare")
        assert path.name == "bare.npz" and path.exists()
        loaded = NMFModel.load(path)
        np.testing.assert_array_equal(model.components_, loaded.components_)

    def test_unfitted_raises(self, tmp_path):
        with pytest.raises(ValueError, match="not fitted"):
            save_model(NMFModel(n_components=2), tmp_path / "x")

    def test_wrong_class_load_raises(self, tmp_path):
        model = NMFModel(n_components=2, random_state=0).fit(_emg_df())
        path = model.save(tmp_path / "m")
        with pytest.raises(TypeError, match="NMFModel"):
            CNMFModel.load(path)

    def test_foreign_payload_rejected(self, tmp_path):
        p = tmp_path / "foreign.npz"
        np.savez(p, data=np.zeros(3))
        with pytest.raises(ValueError, match="not a muscle_synergies_tpu"):
            load_model(p)

    def test_run_payload_rejected_by_model_loader(self, tmp_path):
        res = find_synergies(_emg_df(), 2, max_iter=200, random_state=0)
        path = save_synergy_run(res, tmp_path / "run")
        with pytest.raises(ValueError, match="format"):
            load_model(path)


class TestCNMFModel:
    def test_round_trip(self, tmp_path):
        x = RNG.uniform(0.1, 1.0, size=(40, 4))
        model = CNMFModel(
            2, 3, max_iter=30, n_inits=2, random_state=0, impl="xla"
        ).fit(x)
        loaded = CNMFModel.load(model.save(tmp_path / "cnmf"))
        np.testing.assert_array_equal(model.synergies_, loaded.synergies_)
        np.testing.assert_array_equal(
            model.restart_errors_, loaded.restart_errors_
        )
        assert loaded.n_components_ == 2 and loaded.n_lags_ == 3
        assert loaded.n_iter_ == model.n_iter_
        assert loaded.reconstruction_err_ == model.reconstruction_err_
        assert loaded.impl == "xla"
        x_new = RNG.uniform(0.1, 1.0, size=(40, 4))
        np.testing.assert_array_equal(
            model.transform(x_new), loaded.transform(x_new)
        )

    def test_unfitted_raises(self, tmp_path):
        with pytest.raises(ValueError, match="not fitted"):
            CNMFModel(2, 3).save(tmp_path / "x")


class TestNM3FModel:
    def test_round_trip(self, tmp_path):
        x = RNG.uniform(0.1, 1.0, size=(3, 20, 5))
        model = NM3FModel(
            2, 2, max_iter=30, n_inits=2, random_state=0
        ).fit(x)
        loaded = NM3FModel.load(model.save(tmp_path / "nm3f"))
        np.testing.assert_array_equal(
            model.temporal_modules_, loaded.temporal_modules_
        )
        np.testing.assert_array_equal(
            model.spatial_modules_, loaded.spatial_modules_
        )
        assert loaded.vaf_ == model.vaf_
        assert loaded.n_iter_ == model.n_iter_
        x_new = RNG.uniform(0.1, 1.0, size=(2, 20, 5))
        np.testing.assert_array_equal(
            model.transform(x_new), loaded.transform(x_new)
        )
        coeffs = model.transform(x_new)
        np.testing.assert_array_equal(
            model.inverse_transform(coeffs),
            loaded.inverse_transform(coeffs),
        )

    def test_precision_enum_round_trips_as_string(self, tmp_path):
        import jax

        x = RNG.uniform(0.1, 1.0, size=(2, 16, 4))
        model = NM3FModel(
            2, 2, max_iter=10, n_inits=1, random_state=0,
            precision=jax.lax.Precision.HIGHEST,
        ).fit(x)
        loaded = NM3FModel.load(model.save(tmp_path / "prec"))
        assert loaded.precision == "highest"
        x_new = RNG.uniform(0.1, 1.0, size=(1, 16, 4))
        np.testing.assert_array_equal(
            model.transform(x_new), loaded.transform(x_new)
        )


class TestSynergyRun:
    def test_single_run_round_trip(self, tmp_path):
        x = _emg_df()
        res = find_synergies(x, 2, max_iter=300, random_state=0)
        loaded = SynergyRunResult.load(res.save(tmp_path / "run"))
        pandas.testing.assert_frame_equal(
            res.vaf_values, loaded.vaf_values, check_index_type=False
        )
        pandas.testing.assert_frame_equal(res.components, loaded.components)
        assert list(loaded.components.columns) == MUSCLES
        _assert_models_equal(res.model, loaded.model, x)

    def test_sweep_round_trip(self, tmp_path):
        x = _emg_df()
        res = find_synergies(x, 1, 3, max_iter=300, random_state=0)
        loaded = load_synergy_run(save_synergy_run(res, tmp_path / "sweep"))
        assert sorted(loaded.model) == [1, 2, 3]
        pandas.testing.assert_frame_equal(
            res.vaf_values, loaded.vaf_values, check_index_type=False
        )
        for rank in (1, 2, 3):
            pandas.testing.assert_frame_equal(
                res.components[rank], loaded.components[rank]
            )
            _assert_models_equal(res.model[rank], loaded.model[rank], x)

    def test_model_payload_rejected_by_run_loader(self, tmp_path):
        model = NMFModel(n_components=2, random_state=0).fit(_emg_df())
        path = model.save(tmp_path / "m")
        with pytest.raises(ValueError, match="format"):
            load_synergy_run(path)


class TestFromResult:
    """Estimator wrappers over raw find_* results (the CLI save path)."""

    def test_cnmf_from_result_matches_fit(self, tmp_path):
        x = RNG.uniform(0.1, 1.0, size=(30, 4))
        from muscle_synergies_tpu.models import find_time_varying_synergies

        res = find_time_varying_synergies(
            x, 2, 3, max_iter=20, n_inits=2, seed=0, impl="xla"
        )
        model = CNMFModel.from_result(
            res, 3, max_iter=20, n_inits=2, random_state=0, impl="xla"
        )
        np.testing.assert_array_equal(
            model.synergies_,
            np.stack([res.synergies[k].to_numpy() for k in range(2)]),
        )
        loaded = CNMFModel.load(model.save(tmp_path / "c"))
        np.testing.assert_array_equal(model.synergies_, loaded.synergies_)

    def test_nm3f_from_temporal_result(self, tmp_path):
        from muscle_synergies_tpu.models import find_temporal_synergies

        x = RNG.uniform(0.1, 1.0, size=(3, 16, 4))
        res = find_temporal_synergies(x, 2, max_iter=20, n_inits=2)
        model = NM3FModel.from_temporal_result(res, max_iter=20, n_inits=2)
        # tMod = NM3F with the spatial side frozen at identity
        np.testing.assert_array_equal(model.spatial_modules_, np.eye(4))
        np.testing.assert_array_equal(
            model.temporal_modules_, res.temporal_modules.to_numpy()
        )
        assert model.vaf_ == float(res.vaf)
        loaded = NM3FModel.load(model.save(tmp_path / "t"))
        x_new = RNG.uniform(0.1, 1.0, size=(2, 16, 4))
        w = model.transform(x_new)
        assert w.shape == (2, 2, 4)  # per-trial (P, L) muscle weights
        np.testing.assert_array_equal(w, loaded.transform(x_new))

    def test_nm3f_from_shared_spatial_result(self, tmp_path):
        from muscle_synergies_tpu.models import find_shared_spatial_synergies

        x = RNG.uniform(0.1, 1.0, size=(3, 12, 5))
        res = find_shared_spatial_synergies(x, 2, max_iter=20, n_inits=2)
        model = NM3FModel.from_shared_spatial_result(
            res, max_iter=20, n_inits=2
        )
        np.testing.assert_array_equal(model.temporal_modules_, np.eye(12))
        np.testing.assert_array_equal(
            model.spatial_modules_, res.spatial_modules.to_numpy()
        )
        loaded = NM3FModel.load(model.save(tmp_path / "s"))
        x_new = RNG.uniform(0.1, 1.0, size=(1, 12, 5))
        a = model.transform(x_new)
        assert a.shape == (1, 12, 2)  # per-trial (T, Q) activations
        np.testing.assert_array_equal(a, loaded.transform(x_new))
