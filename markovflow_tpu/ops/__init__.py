from .kalman import (
    FilterElements,
    log_likelihood_sites,
    make_filter_elements,
    parallel_filter,
    parallel_smoother,
    posterior_ssm_params,
    predicted_moments,
    prior_step_arrays,
    sequential_filter,
    sequential_smoother,
)
from .scans import affine_cov_scan, affine_scan
