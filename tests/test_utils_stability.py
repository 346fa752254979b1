"""Tests for config presets, checkpoint/resume, telemetry and stability."""

import numpy as np
import pandas as pd
import pytest

from muscle_synergies_tpu.models import (
    bootstrap_synergies,
    cv_rank_selection,
    fit_mu,
    fit_mu_masked,
    initialize_nmf,
)
from muscle_synergies_tpu.utils import (
    FilterSpec,
    PipelineConfig,
    SweepCheckpoint,
    Timer,
    debug_nans,
    find_synergies_checkpointed,
    solver_report,
)

RNG = np.random.default_rng(21)


def _emg_df(n=300, l=6, k=2):
    w = RNG.random((n, k))
    h = RNG.random((k, l))
    x = np.maximum(w @ h + 0.02 * RNG.random((n, l)), 0)
    return pd.DataFrame(x, columns=[f"M{i}" for i in range(l)])


class TestPipelineConfig:
    def test_roundtrip_json(self):
        cfg = PipelineConfig(
            envelope=FilterSpec(order=2, critical_freqs=(5.0,)),
            use_rms=True,
            max_rank=3,
        )
        restored = PipelineConfig.from_json(cfg.to_json())
        assert restored == cfg

    def test_hashable(self):
        assert hash(PipelineConfig()) == hash(PipelineConfig())

    def test_preprocess_rms_path(self):
        cfg = PipelineConfig(use_rms=True, rms_window_s=0.05, reduce_to=50)
        x = RNG.standard_normal((400, 4))
        out = np.asarray(cfg.preprocess(x, sampling_frequency=200))
        assert out.shape == (50, 4)
        assert np.all(out >= 0)
        assert np.allclose(np.max(np.abs(out), axis=0), 1.0)

    def test_preprocess_envelope_path(self):
        cfg = PipelineConfig(
            envelope=FilterSpec(order=2, critical_freqs=(5.0,)), reduce_to=None
        )
        x = RNG.standard_normal((400, 4))
        out = np.asarray(cfg.preprocess(x, sampling_frequency=200))
        assert out.shape == (400, 4)

    def test_find_synergies_through_config(self):
        cfg = PipelineConfig(min_rank=1, max_rank=2, max_iter=2000, tol=1e-6)
        res = cfg.find_synergies(_emg_df())
        assert list(res.vaf_values.index) == [1, 2]


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        ckpt = SweepCheckpoint(tmp_path / "sweep")
        vaf = pd.DataFrame({"All signals": [0.9], "M0": [0.91]})
        ckpt.save(3, np.ones((10, 3)), np.ones((3, 4)), vaf, meta={"n_iter": 7})
        assert ckpt.has(3) and not ckpt.has(2)
        stored = ckpt.load(3)
        assert stored["meta"]["n_iter"] == 7
        assert stored["vaf_values"].equals(vaf)
        assert ckpt.completed_ranks() == [3]

    def test_resume_skips_completed(self, tmp_path):
        df = _emg_df()
        res1 = find_synergies_checkpointed(
            df, 1, 3, tmp_path / "ck", max_iter=2000, tol=1e-6
        )
        ckpt = SweepCheckpoint(tmp_path / "ck")
        assert ckpt.completed_ranks() == [1, 2, 3]
        # poison rank 2's stored VAF to prove it is loaded, not re-fit
        stored = ckpt.load(2)
        poisoned = stored["vaf_values"].copy()
        poisoned["All signals"] = 0.123456
        ckpt.save(2, stored["w"], stored["h"], poisoned, stored["meta"])
        res2 = find_synergies_checkpointed(
            df, 1, 3, tmp_path / "ck", max_iter=2000, tol=1e-6
        )
        assert res2.vaf_values.loc[2, "All signals"] == 0.123456
        assert (
            res1.vaf_values.loc[3, "All signals"]
            == res2.vaf_values.loc[3, "All signals"]
        )


class TestOrbaxCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        ckpt = SweepCheckpoint(tmp_path / "sweep", backend="orbax")
        vaf = pd.DataFrame({"All signals": [0.9], "M0": [0.91]})
        w, h = np.arange(30.0).reshape(10, 3), np.ones((3, 4))
        ckpt.save(3, w, h, vaf, meta={"n_iter": 7})
        assert ckpt.has(3) and not ckpt.has(2)
        stored = ckpt.load(3)
        assert stored["meta"]["n_iter"] == 7
        assert stored["vaf_values"].equals(vaf)
        np.testing.assert_array_equal(stored["w"], w)
        np.testing.assert_array_equal(stored["h"], h)
        assert ckpt.completed_ranks() == [3]

    def test_overwrite_same_rank(self, tmp_path):
        ckpt = SweepCheckpoint(tmp_path / "sweep", backend="orbax")
        vaf = pd.DataFrame({"All signals": [0.5]})
        ckpt.save(1, np.zeros((4, 1)), np.zeros((1, 2)), vaf, meta={"v": 1})
        ckpt.save(1, np.ones((4, 1)), np.ones((1, 2)), vaf, meta={"v": 2})
        stored = ckpt.load(1)
        assert stored["meta"]["v"] == 2
        np.testing.assert_array_equal(stored["w"], np.ones((4, 1)))

    def test_backends_are_interchangeable(self, tmp_path):
        vaf = pd.DataFrame({"All signals": [0.8], "M0": [0.7]})
        w, h = np.full((6, 2), 1.5), np.full((2, 3), 2.5)
        a = SweepCheckpoint(tmp_path / "npz", backend="npz")
        b = SweepCheckpoint(tmp_path / "orbax", backend="orbax")
        for ckpt in (a, b):
            ckpt.save(2, w, h, vaf, meta={"n_iter": 4})
        sa, sb = a.load(2), b.load(2)
        np.testing.assert_array_equal(sa["w"], sb["w"])
        np.testing.assert_array_equal(sa["h"], sb["h"])
        assert sa["vaf_values"].equals(sb["vaf_values"])
        assert sa["meta"] == sb["meta"]

    def test_resume_through_orbax(self, tmp_path):
        df = _emg_df()
        find_synergies_checkpointed(
            df, 1, 2, tmp_path / "ck", max_iter=500, tol=1e-6, backend="orbax"
        )
        ckpt = SweepCheckpoint(tmp_path / "ck", backend="orbax")
        assert ckpt.completed_ranks() == [1, 2]
        stored = ckpt.load(2)
        poisoned = stored["vaf_values"].copy()
        poisoned["All signals"] = 0.654321
        ckpt.save(2, stored["w"], stored["h"], poisoned, stored["meta"])
        res = find_synergies_checkpointed(
            df, 1, 2, tmp_path / "ck", max_iter=500, tol=1e-6, backend="orbax"
        )
        assert res.vaf_values.loc[2, "All signals"] == 0.654321

    def test_unknown_backend_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="backend"):
            SweepCheckpoint(tmp_path, backend="s3")


class TestProfiling:
    def test_timer(self):
        with Timer("t") as t:
            sum(range(1000))
        assert t.elapsed is not None and t.elapsed >= 0

    def test_solver_report(self):
        df = _emg_df()
        x = df.to_numpy()
        w0, h0 = initialize_nmf(x, 2, init="nndsvda")
        state = fit_mu(x, w0, h0, max_iter=500, tol=1e-6)
        report = solver_report(state, x)
        assert report["n_iter"] > 0
        assert 0.0 <= report["converged_fraction"] <= 1.0
        assert np.isfinite(report["final_error"])

    def test_debug_nans_restores(self):
        import jax

        before = jax.config.jax_debug_nans
        with debug_nans(True):
            assert jax.config.jax_debug_nans
        assert jax.config.jax_debug_nans == before


class TestStability:
    def test_bootstrap_recovers_stable_components(self):
        df = _emg_df(n=400, l=8, k=3)
        res = bootstrap_synergies(
            df.to_numpy(), 3, n_boot=12, max_iter=300, tol=1e-6
        )
        assert res.similarities.shape == (12, 3)
        # clean low-rank data: components should be highly stable
        assert np.all(res.mean > 0.95)
        assert res.reference_components.shape == (3, 8)

    def test_masked_fit_ignores_heldout(self):
        x = _emg_df(n=200, l=6, k=2).to_numpy()
        rng = np.random.default_rng(0)
        mask = (rng.random(x.shape) >= 0.2).astype(float)
        w0, h0 = initialize_nmf(x * mask, 2, init="nndsvda")
        state = fit_mu_masked(x, mask, w0, h0, max_iter=500, tol=1e-8)
        rec = np.asarray(state.w) @ np.asarray(state.h)
        # low-rank structure lets held-out entries be recovered
        err = np.linalg.norm((1 - mask) * (x - rec)) / np.linalg.norm(x)
        assert err < 0.05

    def test_cv_picks_true_rank(self):
        x = _emg_df(n=300, l=8, k=3).to_numpy()
        res = cv_rank_selection(
            x, ranks=(1, 2, 3, 4, 5), n_repeats=3, max_iter=400, tol=1e-7
        )
        assert res.test_error.shape == (3, 5)
        # held-out error should drop sharply up to the true rank
        assert res.best_rank >= 3
        means = res.mean_test_error
        assert means[2] < means[0]


def _convolutive_data(t=240, k=2, d=8, m=6, seed=5):
    """Data generated exactly from the time-varying model."""
    rng = np.random.default_rng(seed)
    c = np.zeros((t, k))
    for ki in range(k):
        for start in rng.choice(t - d, size=6, replace=False):
            c[start, ki] = rng.uniform(0.5, 2.0)
    s = rng.uniform(0, 1, size=(k, d, m))
    x = np.zeros((t, m))
    for ti in range(t):
        for di in range(d):
            if ti - di >= 0:
                x[ti] += c[ti - di] @ s[:, di, :]
    return x


class TestTimeVaryingStability:
    def test_masked_fit_with_full_mask_equals_unmasked(self):
        from muscle_synergies_tpu.models import fit_cnmf, fit_cnmf_masked
        from muscle_synergies_tpu.models.cnmf import init_cnmf

        x = _convolutive_data()
        c0, s0 = init_cnmf(x, 2, 8, seed=1)
        import jax.numpy as jnp

        full = fit_cnmf(jnp.asarray(x), jnp.asarray(c0), jnp.asarray(s0),
                        max_iter=100, tol=1e-5)
        masked = fit_cnmf_masked(
            jnp.asarray(x), jnp.ones_like(jnp.asarray(x)),
            jnp.asarray(c0), jnp.asarray(s0), max_iter=100, tol=1e-5,
        )
        assert int(masked.n_iter) == int(full.n_iter)
        np.testing.assert_allclose(np.asarray(masked.c),
                                   np.asarray(full.c), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(masked.s),
                                   np.asarray(full.s), rtol=1e-10)

    def test_masked_fit_recovers_heldout(self):
        from muscle_synergies_tpu.models import fit_cnmf_masked
        from muscle_synergies_tpu.models.cnmf import (
            cnmf_reconstruct,
            init_cnmf,
        )

        x = _convolutive_data()
        rng = np.random.default_rng(0)
        mask = (rng.random(x.shape) >= 0.15).astype(float)
        c0, s0 = init_cnmf(x * mask, 2, 8, seed=2)
        import jax.numpy as jnp

        state = fit_cnmf_masked(
            jnp.asarray(x), jnp.asarray(mask),
            jnp.asarray(c0), jnp.asarray(s0), max_iter=800, tol=1e-8,
        )
        rec = np.asarray(cnmf_reconstruct(state.c, state.s))
        err = np.linalg.norm((1 - mask) * (x - rec)) / np.linalg.norm(x)
        assert err < 0.08

    def test_cv_picks_true_synergy_count(self):
        from muscle_synergies_tpu.models import (
            cv_time_varying_rank_selection,
        )

        x = _convolutive_data(k=2)
        res = cv_time_varying_rank_selection(
            x, ranks=(1, 2, 3), n_lags=8, n_repeats=3, max_iter=300,
            tol=1e-6,
        )
        assert res.test_error.shape == (3, 3)
        means = res.mean_test_error
        assert means[1] < means[0]  # rank 2 beats rank 1 clearly
        assert res.best_rank >= 2

    def test_cv_rank_padding_stays_zero(self):
        from muscle_synergies_tpu.models import fit_cnmf_masked
        from muscle_synergies_tpu.models.cnmf import init_cnmf

        x = _convolutive_data(k=2)
        import jax.numpy as jnp

        c0, s0 = init_cnmf(x, 1, 8, seed=3)
        c0p = np.concatenate([c0, np.zeros((x.shape[0], 2))], axis=1)
        s0p = np.concatenate([s0, np.zeros((2, 8, x.shape[1]))], axis=0)
        state = fit_cnmf_masked(
            jnp.asarray(x), jnp.ones_like(jnp.asarray(x)),
            jnp.asarray(c0p), jnp.asarray(s0p), max_iter=60, tol=1e-6,
        )
        np.testing.assert_array_equal(np.asarray(state.c)[:, 1:], 0.0)
        np.testing.assert_array_equal(np.asarray(state.s)[1:], 0.0)

    def test_block_bootstrap_preserves_blocks(self):
        from muscle_synergies_tpu.models.stability import (
            _block_bootstrap_indices,
        )

        rng = np.random.default_rng(7)
        idx = _block_bootstrap_indices(100, 10, 5, rng)
        assert idx.shape == (5, 100)
        assert idx.min() >= 0 and idx.max() < 100
        # within each block, indices are consecutive
        diffs = np.diff(idx.reshape(5, 10, 10), axis=2)
        np.testing.assert_array_equal(diffs, 1)

    def test_shifted_cosine_tolerates_lag_shift(self):
        from muscle_synergies_tpu.models.stability import _shifted_cosine

        rng = np.random.default_rng(9)
        a = rng.random((8, 6))
        b = np.roll(a, 2, axis=0)
        b[:2] = 0.0  # a genuinely shifted pattern, not a circular roll
        assert _shifted_cosine(a, b, max_shift=0) < 0.99
        assert _shifted_cosine(a, b, max_shift=2) > 0.999

    def test_bootstrap_stability_on_model_data(self):
        from muscle_synergies_tpu.models import (
            bootstrap_time_varying_synergies,
        )

        x = _convolutive_data(t=300)
        res = bootstrap_time_varying_synergies(
            x, 2, 8, n_boot=8, max_iter=250, tol=1e-6, seed=0
        )
        assert res.reference_synergies.shape == (2, 8, 6)
        assert res.similarities.shape == (8, 2)
        # data generated exactly from the model: synergies should be
        # recoverable across block resamples
        assert np.all(res.mean > 0.7)

    def test_bootstrap_block_len_validation(self):
        from muscle_synergies_tpu.models import (
            bootstrap_time_varying_synergies,
        )

        x = _convolutive_data()
        with pytest.raises(ValueError, match="block_len"):
            bootstrap_time_varying_synergies(
                x, 2, 8, n_boot=2, block_len=4
            )


class TestMatchSynergies:
    """Cross-set synergy comparison (match_synergies)."""

    def test_identical_sets_match_perfectly(self):
        from muscle_synergies_tpu.models import match_synergies

        rng = np.random.default_rng(0)
        h = rng.random((3, 8))
        m = match_synergies(h, h)
        assert m.pairs == [(0, 0), (1, 1), (2, 2)]
        np.testing.assert_allclose(m.similarities, 1.0, rtol=1e-12)
        assert m.mean == pytest.approx(1.0)

    def test_permutation_and_scale_invariance(self):
        from muscle_synergies_tpu.models import match_synergies

        rng = np.random.default_rng(1)
        h = rng.random((4, 6))
        perm = [2, 0, 3, 1]
        scaled = h[perm] * rng.uniform(0.5, 3.0, (4, 1))
        m = match_synergies(h, scaled)
        # pair (i, j) means A[i] ~ B[j]; B[j] = A[perm[j]]
        assert m.pairs == sorted((perm[j], j) for j in range(4))
        np.testing.assert_allclose(m.similarities, 1.0, rtol=1e-12)

    def test_rectangular_sets(self):
        from muscle_synergies_tpu.models import match_synergies

        rng = np.random.default_rng(2)
        h = rng.random((3, 8))
        m = match_synergies(h[:2], h)
        assert len(m.pairs) == 2
        assert m.similarity_matrix.shape == (2, 3)
        np.testing.assert_allclose(m.similarities, 1.0, rtol=1e-12)

    def test_dataframe_input(self):
        import pandas as pd

        from muscle_synergies_tpu.models import match_synergies

        rng = np.random.default_rng(3)
        h = pd.DataFrame(rng.random((2, 5)))
        m = match_synergies(h, h.iloc[::-1])
        assert m.pairs == [(0, 1), (1, 0)]

    def test_time_varying_shift_tolerance(self):
        from muscle_synergies_tpu.models import match_synergies

        rng = np.random.default_rng(4)
        s = rng.random((2, 10, 6))
        shifted = np.roll(s, 2, axis=1)
        shifted[:, :2, :] = 0.0  # causal shift, zeros in
        plain = match_synergies(s, shifted, max_shift=0)
        tol = match_synergies(s, shifted)  # default D//2 = 5
        assert tol.mean > 0.999
        assert tol.mean > plain.mean

    def test_validation(self):
        from muscle_synergies_tpu.models import match_synergies

        rng = np.random.default_rng(5)
        with pytest.raises(ValueError, match="shapes differ"):
            match_synergies(rng.random((2, 5)), rng.random((2, 6)))
        with pytest.raises(ValueError, match="expected two"):
            match_synergies(rng.random(5), rng.random(5))
        with pytest.raises(ValueError, match="time-varying sets only"):
            match_synergies(
                rng.random((2, 5)), rng.random((2, 5)), max_shift=2
            )


class TestClusterSynergies:
    """Group-level N-set clustering (cluster_synergies)."""

    @staticmethod
    def _base(rng, k=4, n=8, spread=0.05):
        # near-orthogonal nonnegative patterns: one dominant muscle each
        return np.eye(k, n) + spread * rng.random((k, n))

    def test_shared_synergies_recovered(self):
        from muscle_synergies_tpu.models import cluster_synergies

        rng = np.random.default_rng(0)
        base = self._base(rng)
        sets = []
        for perm in ([2, 0, 3, 1], [1, 3, 0, 2], [0, 1, 2, 3]):
            noisy = base[perm] * rng.uniform(0.5, 3.0, (4, 1))
            noisy += 0.01 * rng.random(noisy.shape)
            sets.append(noisy)
        res = cluster_synergies(sets)
        assert res.n_clusters == 4
        np.testing.assert_array_equal(res.coverage, 1.0)
        assert list(res.shared) == [0, 1, 2, 3]
        # exactly one component per set per cluster
        np.testing.assert_array_equal(res.membership, 1)
        # each consensus is unit-norm and matches one base synergy
        np.testing.assert_allclose(
            np.linalg.norm(res.consensus, axis=1), 1.0, rtol=1e-12
        )
        unit = base / np.linalg.norm(base, axis=1, keepdims=True)
        best = (unit @ res.consensus.T).max(axis=1)
        assert (best > 0.99).all()

    def test_subject_specific_synergy(self):
        from muscle_synergies_tpu.models import cluster_synergies

        rng = np.random.default_rng(1)
        base = self._base(rng, k=4)
        shared = base[:3]
        sets = [shared, shared[::-1], np.vstack([shared, base[3:]])]
        res = cluster_synergies(sets, n_clusters=4)
        assert res.n_clusters == 4
        assert len(res.shared) == 3
        specific = [c for c in range(4) if c not in res.shared]
        assert len(specific) == 1
        np.testing.assert_array_equal(
            res.membership[specific[0]], [0, 0, 1]
        )
        assert res.coverage[specific[0]] == pytest.approx(1 / 3)

    def test_default_n_clusters_is_mean_set_size(self):
        from muscle_synergies_tpu.models import cluster_synergies

        rng = np.random.default_rng(2)
        base = self._base(rng, k=3)
        res = cluster_synergies([base, base, base])
        assert res.n_clusters == 3

    def test_labels_align_with_sets(self):
        from muscle_synergies_tpu.models import cluster_synergies

        rng = np.random.default_rng(3)
        base = self._base(rng, k=3)
        res = cluster_synergies([base[:2], base])
        assert [len(l) for l in res.labels] == [2, 3]
        # set 0's components cluster with set 1's first two
        assert list(res.labels[0]) == list(res.labels[1][:2])
        np.testing.assert_array_equal(
            res.set_index, [0, 0, 1, 1, 1]
        )

    def test_time_varying_lag_alignment(self):
        from muscle_synergies_tpu.models import cluster_synergies
        from muscle_synergies_tpu.models.stability import _shifted_cosine

        rng = np.random.default_rng(4)
        s = rng.random((2, 10, 6))
        s[0, :, :3] *= 10.0  # make the two patterns clearly distinct
        s[1, :, 3:] *= 10.0
        shifted = np.roll(s, 2, axis=1)
        shifted[:, :2, :] = 0.0
        res = cluster_synergies([s, shifted])
        assert res.n_clusters == 2
        np.testing.assert_array_equal(res.coverage, 1.0)
        np.testing.assert_allclose(
            np.linalg.norm(res.consensus.reshape(2, -1), axis=1),
            1.0,
            rtol=1e-12,
        )
        # consensus recovers each original pattern up to a lag shift;
        # the causal roll destroyed 2 of 10 lags of the second copy, so
        # the member average can't match the intact original exactly
        for i in range(2):
            sims = [
                _shifted_cosine(s[i], res.consensus[c], 5)
                for c in range(2)
            ]
            assert max(sims) > 0.95
            # and the two distinct patterns land in different clusters
            assert min(sims) < 0.5

    def test_dataframe_input(self):
        import pandas as pd

        from muscle_synergies_tpu.models import cluster_synergies

        rng = np.random.default_rng(5)
        base = self._base(rng, k=2)
        res = cluster_synergies(
            [pd.DataFrame(base), pd.DataFrame(base[::-1])]
        )
        assert res.n_clusters == 2
        np.testing.assert_array_equal(res.membership, 1)

    def test_validation(self):
        from muscle_synergies_tpu.models import cluster_synergies

        rng = np.random.default_rng(6)
        h = rng.random((2, 5))
        with pytest.raises(ValueError, match="at least two"):
            cluster_synergies([h])
        with pytest.raises(ValueError, match="expected all"):
            cluster_synergies([h, rng.random((2, 4, 3))])
        with pytest.raises(ValueError, match="shapes differ"):
            cluster_synergies([h, rng.random((2, 6))])
        with pytest.raises(ValueError, match="time-varying sets only"):
            cluster_synergies([h, h], max_shift=2)
        with pytest.raises(ValueError, match="out of range"):
            cluster_synergies([h, h], n_clusters=5)
        with pytest.raises(ValueError, match="out of range"):
            cluster_synergies([h, h], n_clusters=0)

    def test_plot_synergy_clusters(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from muscle_synergies_tpu.models import cluster_synergies
        from muscle_synergies_tpu.viz import plot_synergy_clusters

        rng = np.random.default_rng(8)
        base = self._base(rng, k=3)
        res = cluster_synergies([base, base[::-1]])
        fig = plot_synergy_clusters(
            res,
            channel_names=[f"M{j}" for j in range(8)],
            set_names=["s1", "s2"],
            show=False,
        )
        assert len(fig.axes) >= 2
        plt.close(fig)

        s = rng.random((2, 6, 4))
        s[0] *= 10.0
        tv = cluster_synergies([s, s])
        fig = plot_synergy_clusters(tv, show=False)
        # one pattern axis per cluster + the membership axis
        assert len(fig.axes) == tv.n_clusters + 1
        plt.close(fig)


class TestMeshedBootstrap:
    """bootstrap_synergies(mesh=): resamples shard over the data axis."""

    def test_meshed_matches_local(self):
        from muscle_synergies_tpu.parallel import make_mesh

        df = _emg_df(n=240, l=6, k=2)  # 240 divides the 2-way time axis
        local = bootstrap_synergies(
            df.to_numpy(), 2, n_boot=6, max_iter=200, tol=1e-6
        )
        meshed = bootstrap_synergies(
            df.to_numpy(), 2, n_boot=6, max_iter=200, tol=1e-6,
            mesh=make_mesh((4, 2)),  # n_boot=6 pads to 8
        )
        np.testing.assert_allclose(
            meshed.reference_components, local.reference_components
        )
        np.testing.assert_allclose(
            meshed.similarities, local.similarities, atol=1e-9
        )

    def test_indivisible_time_falls_back(self):
        from muscle_synergies_tpu.parallel import make_mesh

        df = _emg_df(n=241, l=6, k=2)
        with pytest.warns(UserWarning, match="time"):
            res = bootstrap_synergies(
                df.to_numpy(), 2, n_boot=4, max_iter=100,
                mesh=make_mesh((4, 2)),
            )
        assert res.similarities.shape == (4, 2)

    def test_wrong_axes_fall_back(self):
        from muscle_synergies_tpu.parallel import make_mesh
        from muscle_synergies_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

        df = _emg_df(n=240, l=6, k=2)
        with pytest.warns(UserWarning, match="lacks"):
            res = bootstrap_synergies(
                df.to_numpy(), 2, n_boot=3, max_iter=100,
                mesh=make_mesh((8, 1), axis_names=(DATA_AXIS, MODEL_AXIS)),
            )
        assert res.similarities.shape == (3, 2)

    def test_meshed_convolutive_matches_local(self):
        from muscle_synergies_tpu.models import (
            bootstrap_time_varying_synergies,
        )
        from muscle_synergies_tpu.parallel import make_mesh

        x = _convolutive_data(t=240)  # 240 divides the 2-way time axis
        local = bootstrap_time_varying_synergies(
            x, 2, 8, n_boot=5, max_iter=80, tol=1e-5
        )
        meshed = bootstrap_time_varying_synergies(
            x, 2, 8, n_boot=5, max_iter=80, tol=1e-5,
            mesh=make_mesh((4, 2)),  # n_boot=5 pads to 8
        )
        np.testing.assert_allclose(
            meshed.reference_synergies, local.reference_synergies
        )
        np.testing.assert_allclose(
            meshed.similarities, local.similarities, atol=1e-9
        )

    def test_convolutive_halo_falls_back(self):
        from muscle_synergies_tpu.models import (
            bootstrap_time_varying_synergies,
        )
        from muscle_synergies_tpu.parallel import make_mesh

        x = _convolutive_data(t=240)
        # 8-way time axis: shard = 30 < fine, but lags=40 halo > shard
        with pytest.warns(UserWarning, match="lag halo"):
            res = bootstrap_time_varying_synergies(
                x, 2, 40, n_boot=3, max_iter=40,
                mesh=make_mesh((1, 8)),
            )
        assert res.similarities.shape == (3, 2)


class TestMeshedCV:
    """CV selections: the (repeat, candidate) grid shards over the mesh."""

    def test_cv_rank_selection_meshed_matches_local(self):
        from muscle_synergies_tpu.parallel import make_mesh

        df = _emg_df(n=160, l=6, k=2)
        kwargs = dict(
            ranks=(1, 2, 3), n_repeats=2, max_iter=150, tol=1e-6, seed=0
        )
        local = cv_rank_selection(df.to_numpy(), **kwargs)
        meshed = cv_rank_selection(
            df.to_numpy(), mesh=make_mesh((4, 2)), **kwargs
        )  # 6 fits pad to 8 devices
        np.testing.assert_allclose(
            meshed.test_error, local.test_error, atol=1e-12
        )
        assert meshed.best_rank == local.best_rank

    def test_cv_time_varying_meshed_matches_local(self):
        from muscle_synergies_tpu.models import (
            cv_time_varying_rank_selection,
        )
        from muscle_synergies_tpu.parallel import make_mesh

        x = _convolutive_data(t=120)
        kwargs = dict(
            ranks=(1, 2), n_lags=6, n_repeats=2, max_iter=60, seed=0
        )
        local = cv_time_varying_rank_selection(x, **kwargs)
        meshed = cv_time_varying_rank_selection(
            x, mesh=make_mesh((4, 2)), **kwargs
        )
        np.testing.assert_allclose(
            meshed.test_error, local.test_error, atol=1e-12
        )

    def test_cv_space_by_time_meshed_matches_local(self):
        from muscle_synergies_tpu.models import cv_space_by_time_selection
        from muscle_synergies_tpu.parallel import make_mesh

        rng = np.random.default_rng(3)
        xs = np.abs(rng.standard_normal((5, 40, 5)))
        kwargs = dict(
            pairs=[(1, 1), (2, 2)], n_repeats=2, max_iter=80, seed=0
        )
        local = cv_space_by_time_selection(xs, **kwargs)
        meshed = cv_space_by_time_selection(
            xs, mesh=make_mesh((4, 2)), **kwargs
        )
        np.testing.assert_allclose(
            meshed.test_error, local.test_error, atol=1e-12
        )

    def test_cv_shared_factor_meshed_matches_local(self):
        from muscle_synergies_tpu.models import (
            cv_shared_spatial_selection,
            cv_temporal_selection,
        )
        from muscle_synergies_tpu.parallel import make_mesh

        rng = np.random.default_rng(4)
        xs = np.abs(rng.standard_normal((5, 30, 5)))
        mesh = make_mesh((4, 2))
        for fn in (cv_temporal_selection, cv_shared_spatial_selection):
            kwargs = dict(
                candidates=(1, 2), n_repeats=2, max_iter=60, seed=0
            )
            local = fn(xs, **kwargs)
            meshed = fn(xs, mesh=mesh, **kwargs)
            np.testing.assert_allclose(
                meshed.test_error, local.test_error, atol=1e-12
            )


class TestClusterSynergiesProperties:
    """Hypothesis invariances of the group-level clustering."""

    def test_scale_and_set_order_invariance(self):
        from hypothesis import given, settings, strategies as st

        from muscle_synergies_tpu.models import cluster_synergies

        @settings(max_examples=25, deadline=None)
        @given(
            seed=st.integers(0, 10_000),
            k=st.integers(2, 4),
            n_sets=st.integers(2, 4),
            scale=st.floats(0.1, 10.0),
        )
        def run(seed, k, n_sets, scale):
            rng = np.random.default_rng(seed)
            base = np.eye(k, 8) + 0.05 * rng.random((k, 8))
            sets = [
                base[rng.permutation(k)] * rng.uniform(0.5, 2.0, (k, 1))
                for _ in range(n_sets)
            ]
            ref = cluster_synergies(sets)
            # per-component positive rescaling never changes clusters
            scaled = cluster_synergies([s * scale for s in sets])
            np.testing.assert_array_equal(
                ref.membership, scaled.membership
            )
            for a, b in zip(ref.labels, scaled.labels):
                np.testing.assert_array_equal(a, b)
            # reversing the set order permutes columns of membership
            rev = cluster_synergies(sets[::-1])
            assert sorted(map(tuple, ref.membership.T)) == sorted(
                map(tuple, rev.membership.T)
            )
            # every pooled component is in exactly one cluster
            assert ref.membership.sum() == k * n_sets

        run()
