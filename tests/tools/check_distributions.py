"""Calibrated sampling-statistics assertions for stochastic tests.

The reusable 3-sigma moment checks the reference keeps in
``tests/tools/check_distributions.py:20-63``: a sample mean is compared
either to another sample mean or to a known true mean, normalised by the
standard error of the mean, so the tolerance scales correctly with the
number of samples.  Pick ``sigma`` so the whole suite passes with high
probability: at 3 sigma each scalar comparison fails ~0.3% of the time, so
checking 100 scalars across the suite has a ~26% chance of one spurious
failure — widen sigma (or fix the seed) accordingly.
"""
import numpy as np

__all__ = [
    "assert_samples_close_in_expectation",
    "assert_samples_close_to_mean_in_expectation",
]


def assert_samples_close_in_expectation(samples_a, samples_b, sigma=3.0):
    """Assert two sample sets (leading axis = samples) share a mean, to
    within ``sigma`` standard errors of the pooled mean estimate."""
    samples_a = np.asarray(samples_a)
    samples_b = np.asarray(samples_b)
    assert samples_a.shape == samples_b.shape, (
        samples_a.shape, samples_b.shape)
    n = samples_a.shape[0]
    diff = np.abs(samples_a.mean(axis=0) - samples_b.mean(axis=0))
    pooled_var = np.var(np.concatenate([samples_a, samples_b], axis=0),
                        axis=0)
    # std error of the DIFFERENCE of two independent n-sample means
    se = np.sqrt(2.0 * pooled_var / n)
    np.testing.assert_array_less(diff / np.maximum(se, 1e-300), sigma)


def assert_samples_close_to_mean_in_expectation(samples, true_mean,
                                                true_variance=None,
                                                sigma=3.0):
    """Assert the sample mean matches ``true_mean`` to within ``sigma``
    standard errors; uses ``true_variance`` when given, else the sample
    variance."""
    samples = np.asarray(samples)
    true_mean = np.asarray(true_mean)
    n = samples.shape[0]
    mean = samples.mean(axis=0)
    assert mean.shape == true_mean.shape, (mean.shape, true_mean.shape)
    var = np.var(samples, axis=0) if true_variance is None else np.asarray(
        true_variance)
    se = np.sqrt(var / n)
    np.testing.assert_array_less(
        np.abs(mean - true_mean) / np.maximum(se, 1e-300), sigma)
