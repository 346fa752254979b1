"""Pallas TPU kernels for the NMF hot loops."""

from .mu_pallas import mu_iterations_pallas

__all__ = ["mu_iterations_pallas"]
