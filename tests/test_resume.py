"""Checkpoint/resume drivers for the long sweeps (models/resume.py).

Three properties per family:

1. chunked/per-candidate composition matches the one-shot call to
   float-reordering tolerance: a chunk's batch dimension changes
   XLA's batched-GEMM blocking, and resamples that have not converged
   by max_iter amplify the ~1-ulp differences (converged rows match
   exactly) — similarities pinned at 1e-6, CV error columns at 1e-12
   relative (the one-shot grid pads candidates to the grid maximum);
2. a job killed mid-sweep restarts from its completed chunks (the
   underlying solver is not called again for restored work);
3. the published artifacts are atomic npz files under the job dir.
"""

import numpy as np
import pytest

import muscle_synergies_tpu.models.resume as resume_mod
from muscle_synergies_tpu.models.resume import (
    bootstrap_space_by_time_checkpointed,
    bootstrap_synergies_checkpointed,
    bootstrap_temporal_synergies_checkpointed,
    bootstrap_time_varying_synergies_checkpointed,
    cv_rank_selection_checkpointed,
    cv_space_by_time_selection_checkpointed,
    cv_time_varying_rank_selection_checkpointed,
)
from muscle_synergies_tpu.models.stability import (
    bootstrap_space_by_time,
    bootstrap_synergies,
    bootstrap_temporal_synergies,
    bootstrap_time_varying_synergies,
    cv_rank_selection,
    cv_space_by_time_selection,
    cv_time_varying_rank_selection,
)
from muscle_synergies_tpu.utils.checkpoint import GridCheckpoint

RNG = np.random.default_rng(42)
X = RNG.uniform(0.1, 1.0, (40, 6))  # (N, L) spatial problem
XS = RNG.uniform(0.1, 1.0, (6, 20, 4))  # (B, T, L) trial stack

BOOT_KW = dict(n_boot=4, chunk_size=2, max_iter=40, seed=3)


class TestGridCheckpoint:
    def test_roundtrip(self, tmp_path):
        ckpt = GridCheckpoint(tmp_path)
        arrays = {"a": np.arange(6).reshape(2, 3), "b": np.ones(4)}
        ckpt.save("chunk_0", arrays, meta={"range": [0, 2]})
        assert ckpt.has("chunk_0") and not ckpt.has("chunk_1")
        out = ckpt.load("chunk_0")
        np.testing.assert_array_equal(out["arrays"]["a"], arrays["a"])
        np.testing.assert_array_equal(out["arrays"]["b"], arrays["b"])
        assert out["meta"] == {"range": [0, 2]}
        assert ckpt.completed_keys() == ["chunk_0"]

    def test_bad_key_rejected(self, tmp_path):
        ckpt = GridCheckpoint(tmp_path)
        with pytest.raises(ValueError, match="key"):
            ckpt.save("../escape", {"a": np.ones(1)})
        with pytest.raises(ValueError, match="reserved"):
            ckpt.save("k", {"meta": np.ones(1)})

    def test_no_tmp_leftovers(self, tmp_path):
        ckpt = GridCheckpoint(tmp_path)
        ckpt.save("k1", {"a": np.ones(3)})
        leftovers = list(tmp_path.glob("*.tmp.npz"))
        assert leftovers == []


def _count_calls(monkeypatch, name):
    """Wrap resume_mod.<name> counting invocations."""
    calls = {"n": 0}
    orig = getattr(resume_mod, name)

    def counted(*args, **kwargs):
        calls["n"] += 1
        return orig(*args, **kwargs)

    monkeypatch.setattr(resume_mod, name, counted)
    return calls


def _crash_after(monkeypatch, name, n_ok):
    """Make resume_mod.<name> raise after n_ok successful calls."""
    calls = {"n": 0}
    orig = getattr(resume_mod, name)

    def flaky(*args, **kwargs):
        if calls["n"] >= n_ok:
            raise RuntimeError("simulated crash")
        calls["n"] += 1
        return orig(*args, **kwargs)

    monkeypatch.setattr(resume_mod, name, flaky)
    return calls


class TestBootstrapSpatial:
    def test_chunked_equals_oneshot(self, tmp_path):
        full = bootstrap_synergies(
            X, 2, n_boot=4, seed=3, max_iter=40
        )
        chunked = bootstrap_synergies_checkpointed(
            X, 2, tmp_path, **BOOT_KW
        )
        np.testing.assert_allclose(
            chunked.similarities, full.similarities, rtol=0, atol=1e-6
        )
        # the reference fit sees the full (unresampled) data in both
        # paths, so it is batch-shape independent and exactly equal
        np.testing.assert_array_equal(
            chunked.reference_components, full.reference_components
        )

    def test_kill_and_restart(self, tmp_path, monkeypatch):
        full = bootstrap_synergies(X, 2, n_boot=4, seed=3, max_iter=40)
        # first attempt dies after publishing the first chunk
        _crash_after(monkeypatch, "bootstrap_synergies", 1)
        with pytest.raises(RuntimeError, match="simulated crash"):
            bootstrap_synergies_checkpointed(X, 2, tmp_path, **BOOT_KW)
        assert GridCheckpoint(tmp_path).completed_keys() == [
            "chunk_00000_00002"
        ]
        monkeypatch.undo()
        # restart: chunk 1 restores, only chunk 2 refits
        calls = _count_calls(monkeypatch, "bootstrap_synergies")
        out = bootstrap_synergies_checkpointed(X, 2, tmp_path, **BOOT_KW)
        assert calls["n"] == 1
        np.testing.assert_allclose(
            out.similarities, full.similarities, rtol=0, atol=1e-6
        )

    def test_fully_restored_run_refits_nothing_heavy(
        self, tmp_path, monkeypatch
    ):
        bootstrap_synergies_checkpointed(X, 2, tmp_path, **BOOT_KW)
        calls = _count_calls(monkeypatch, "bootstrap_synergies")
        out = bootstrap_synergies_checkpointed(X, 2, tmp_path, **BOOT_KW)
        # one 1-resample call only, to rebuild the reference components
        assert calls["n"] == 1
        assert out.similarities.shape == (4, 2)


class TestBootstrapTimeVarying:
    def test_chunked_equals_oneshot(self, tmp_path):
        full = bootstrap_time_varying_synergies(
            X[:, :4], 2, 3, n_boot=4, seed=3, max_iter=30
        )
        chunked = bootstrap_time_varying_synergies_checkpointed(
            X[:, :4], 2, 3, tmp_path,
            n_boot=4, chunk_size=2, seed=3, max_iter=30,
        )
        np.testing.assert_allclose(
            chunked.similarities, full.similarities, rtol=0, atol=1e-6
        )
        np.testing.assert_array_equal(
            chunked.reference_synergies, full.reference_synergies
        )


class TestBootstrapSpaceByTime:
    def test_chunked_equals_oneshot(self, tmp_path):
        full_w, full_s = bootstrap_space_by_time(
            XS, 2, 2, n_boot=4, seed=3, max_iter=30
        )
        ck_w, ck_s = bootstrap_space_by_time_checkpointed(
            XS, 2, 2, tmp_path,
            n_boot=4, chunk_size=2, seed=3, max_iter=30,
        )
        np.testing.assert_allclose(
            ck_w.similarities, full_w.similarities, rtol=0, atol=1e-6
        )
        np.testing.assert_allclose(
            ck_s.similarities, full_s.similarities, rtol=0, atol=1e-6
        )

    def test_restart_skips_completed(self, tmp_path, monkeypatch):
        _crash_after(monkeypatch, "bootstrap_space_by_time", 1)
        with pytest.raises(RuntimeError):
            bootstrap_space_by_time_checkpointed(
                XS, 2, 2, tmp_path,
                n_boot=4, chunk_size=2, seed=3, max_iter=30,
            )
        monkeypatch.undo()
        calls = _count_calls(monkeypatch, "bootstrap_space_by_time")
        ck_w, _ = bootstrap_space_by_time_checkpointed(
            XS, 2, 2, tmp_path,
            n_boot=4, chunk_size=2, seed=3, max_iter=30,
        )
        assert calls["n"] == 1
        assert ck_w.similarities.shape == (4, 2)


class TestBootstrapSharedFactor:
    def test_chunked_equals_oneshot(self, tmp_path):
        full = bootstrap_temporal_synergies(
            XS, 2, n_boot=4, seed=3, max_iter=30
        )
        chunked = bootstrap_temporal_synergies_checkpointed(
            XS, 2, tmp_path, n_boot=4, chunk_size=2, seed=3, max_iter=30
        )
        np.testing.assert_allclose(
            chunked.similarities, full.similarities, rtol=0, atol=1e-6
        )


class TestCVResume:
    def test_rank_selection_equals_oneshot(self, tmp_path):
        full = cv_rank_selection(
            X, [1, 2, 3], n_repeats=2, seed=5, max_iter=40
        )
        ck = cv_rank_selection_checkpointed(
            X, [1, 2, 3], tmp_path, n_repeats=2, seed=5, max_iter=40
        )
        # ulp-level: the one-shot grid zero-pads every rank to the
        # grid max, which reorders the f64 matmul reductions
        np.testing.assert_allclose(
            ck.test_error, full.test_error, rtol=1e-12
        )
        assert ck.best_rank == full.best_rank
        assert ck.ranks == full.ranks

    def test_rank_selection_resumes_per_candidate(
        self, tmp_path, monkeypatch
    ):
        # pre-complete rank 2 only
        cv_rank_selection_checkpointed(
            X, [2], tmp_path, n_repeats=2, seed=5, max_iter=40
        )
        calls = _count_calls(monkeypatch, "cv_rank_selection")
        ck = cv_rank_selection_checkpointed(
            X, [1, 2, 3], tmp_path, n_repeats=2, seed=5, max_iter=40
        )
        assert calls["n"] == 2  # ranks 1 and 3 only
        full = cv_rank_selection(
            X, [1, 2, 3], n_repeats=2, seed=5, max_iter=40
        )
        np.testing.assert_allclose(
            ck.test_error, full.test_error, rtol=1e-12
        )

    def test_time_varying_selection_equals_oneshot(self, tmp_path):
        full = cv_time_varying_rank_selection(
            X[:, :4], [1, 2], 3, n_repeats=2, seed=5, max_iter=30
        )
        ck = cv_time_varying_rank_selection_checkpointed(
            X[:, :4], [1, 2], 3, tmp_path,
            n_repeats=2, seed=5, max_iter=30,
        )
        np.testing.assert_allclose(
            ck.test_error, full.test_error, rtol=1e-12
        )
        assert ck.best_rank == full.best_rank

    def test_space_by_time_selection_equals_oneshot(self, tmp_path):
        pairs = [(1, 1), (2, 2)]
        full = cv_space_by_time_selection(
            XS, pairs, n_repeats=2, seed=5, max_iter=30
        )
        ck = cv_space_by_time_selection_checkpointed(
            XS, pairs, tmp_path, n_repeats=2, seed=5, max_iter=30
        )
        np.testing.assert_allclose(
            ck.test_error, full.test_error, rtol=1e-12
        )
        assert ck.best == full.best
