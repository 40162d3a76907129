"""markovflow_tpu — TPU-native Markovian Gaussian processes in JAX.

A ground-up rebuild of the capabilities of secondmind-labs/markovflow
(time-series inference with Markovian GPs via state-space models) designed for
TPU: parallel-in-time associative-scan Kalman recursions, pytree modules,
pjit/shard_map batch sharding, and Pallas kernels on the hot paths.
"""
from . import config
from .gauss_markov import GaussMarkovDistribution
from .state_space_model import StateSpaceModel, state_space_model_from_covariances
from .utils.module import Module, Parameter

__version__ = "0.1.0"
