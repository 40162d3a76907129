"""markovflow_tpu — TPU-native Markovian Gaussian processes in JAX.

A ground-up rebuild of the capabilities of secondmind-labs/markovflow
(time-series inference with Markovian GPs via state-space models) designed for
TPU: parallel-in-time associative-scan Kalman recursions in time-last layout,
pytree modules, pjit/shard_map batch sharding, and chunked scans sized to the
XLA compiler.
"""
from . import config
from .base import APPROX_INF, SampleShape, ordered
from .gauss_markov import GaussMarkovDistribution
from .state_space_model import StateSpaceModel, state_space_model_from_covariances
from .utils.module import Module, Parameter

__version__ = "0.1.0"
