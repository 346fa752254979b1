"""Single-trial decoding from synergy coefficients (models.decode)."""

import numpy as np
import pytest

from muscle_synergies_tpu.models import decode_trials


def _separable_coeffs(n_per_class=12, seed=0):
    """Two conditions with distinct (P, Q) coefficient signatures."""
    rng = np.random.default_rng(seed)
    base_a = np.array([[1.0, 0.1], [0.1, 1.0], [0.5, 0.5]])
    base_b = np.array([[0.1, 1.0], [1.0, 0.1], [0.5, 0.5]])
    coeffs, labels = [], []
    for label, base in (("reach", base_a), ("grasp", base_b)):
        for _ in range(n_per_class):
            coeffs.append(base + 0.05 * rng.standard_normal(base.shape))
            labels.append(label)
    return np.stack(coeffs), np.asarray(labels)


class TestDecodeTrials:
    def test_separable_conditions_decode_near_perfectly(self):
        coeffs, labels = _separable_coeffs()
        res = decode_trials(coeffs, labels, n_folds=4)
        assert res.accuracy > 0.95
        assert res.chance == pytest.approx(0.5)
        assert res.fold_accuracies.shape == (4,)
        assert res.confusion.sum() == len(labels)
        assert list(res.classes) == ["grasp", "reach"]

    def test_shuffled_labels_sit_at_chance(self):
        coeffs, labels = _separable_coeffs(n_per_class=24, seed=1)
        rng = np.random.default_rng(2)
        res = decode_trials(coeffs, rng.permutation(labels), n_folds=4)
        assert res.accuracy < 0.75  # no signal left to decode

    def test_logistic_classifier_and_fold_cap(self):
        coeffs, labels = _separable_coeffs(n_per_class=3, seed=3)
        # n_folds capped at the smallest class count (3)
        res = decode_trials(
            coeffs, labels, n_folds=10, classifier="logistic"
        )
        assert res.fold_accuracies.shape == (3,)
        assert res.accuracy > 0.5

    def test_end_to_end_from_nm3f_transform(self):
        """Delis-style pipeline: modules -> coefficients -> decoding."""
        from muscle_synergies_tpu.models import NM3FModel

        rng = np.random.default_rng(4)
        t, l = 30, 6
        w = np.abs(rng.standard_normal((t, 3)))
        s = np.abs(rng.standard_normal((2, l)))
        coeffs, labels = _separable_coeffs(n_per_class=10, seed=5)
        xs = np.einsum("tp,bpq,ql->btl", w, coeffs, s)
        model = NM3FModel(3, 2, max_iter=400, tol=1e-8).fit(xs)
        learned = model.transform(xs)
        res = decode_trials(learned, labels, n_folds=5)
        assert res.accuracy > res.chance + 0.2

    def test_validation(self):
        coeffs, labels = _separable_coeffs()
        with pytest.raises(ValueError, match="n_trials"):
            decode_trials(coeffs[0, 0], labels)
        with pytest.raises(ValueError, match="labels"):
            decode_trials(coeffs, labels[:-1])
        with pytest.raises(ValueError, match="two classes"):
            decode_trials(coeffs, np.zeros(len(labels)))
        with pytest.raises(ValueError, match="at least two trials"):
            decode_trials(
                coeffs, ["a"] + ["b"] * (len(labels) - 1)
            )
        with pytest.raises(ValueError, match="classifier"):
            decode_trials(coeffs, labels, classifier="svm")

    def test_lda_with_too_few_trials_gives_clear_guidance(self):
        coeffs, labels = _separable_coeffs(n_per_class=2, seed=6)
        with pytest.raises(ValueError, match="logistic"):
            decode_trials(coeffs, labels, n_folds=2)
