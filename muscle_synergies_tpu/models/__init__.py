"""NMF solver suite: initialization, MU and HALS/CD solvers, selection."""

from .beta import BetaState, beta_divergence, fit_mu_beta, mu_update_beta
from .cnmf import (
    CNMFModel,
    CNMFState,
    TimeVaryingSynergyResult,
    cnmf_transform,
    find_time_varying_synergies,
    fit_cnmf,
    fit_cnmf_batch,
    tvaf,
)
from .hals import CDState, cd_pass, fit_cd
from .nm3f import (
    NM3FState,
    SpaceByTimeResult,
    find_space_by_time_synergies,
    fit_nm3f,
    init_nm3f,
    nm3f_reconstruct,
    sbt_vaf,
)
from .init import initialize_nmf, nndsvd
from .mu import EPSILON, MUState, fit_mu, frobenius_error, mu_update
from .rsvd import initialize_nmf_sklearn, randomized_svd
from .select import NMFModel, SynergyRunResult, find_synergies
from .stability import (
    BootstrapResult,
    CVResult,
    TimeVaryingBootstrapResult,
    bootstrap_synergies,
    bootstrap_time_varying_synergies,
    cv_rank_selection,
    cv_time_varying_rank_selection,
    fit_cnmf_masked,
    fit_mu_masked,
)

__all__ = [
    "initialize_nmf",
    "initialize_nmf_sklearn",
    "nndsvd",
    "randomized_svd",
    "mu_update",
    "fit_mu",
    "MUState",
    "beta_divergence",
    "mu_update_beta",
    "fit_mu_beta",
    "BetaState",
    "frobenius_error",
    "EPSILON",
    "cd_pass",
    "fit_cd",
    "CDState",
    "NMFModel",
    "SynergyRunResult",
    "find_synergies",
    "find_time_varying_synergies",
    "TimeVaryingSynergyResult",
    "CNMFState",
    "fit_cnmf",
    "fit_cnmf_batch",
    "cnmf_transform",
    "CNMFModel",
    "tvaf",
    "bootstrap_synergies",
    "BootstrapResult",
    "cv_rank_selection",
    "CVResult",
    "fit_mu_masked",
    "bootstrap_time_varying_synergies",
    "TimeVaryingBootstrapResult",
    "cv_time_varying_rank_selection",
    "fit_cnmf_masked",
    "NM3FState",
    "SpaceByTimeResult",
    "find_space_by_time_synergies",
    "fit_nm3f",
    "init_nm3f",
    "nm3f_reconstruct",
    "sbt_vaf",
]
