"""Model zoo — mirrors the reference's ``markovflow.models`` surface
(reference: markovflow/models/__init__.py)."""
from .gaussian_process_regression import GaussianProcessRegression
from .iwvi import ImportanceWeightedVI
from .models import MarkovFlowModel, MarkovFlowSparseModel
from .pep import PowerExpectationPropagation
from .sparse_pep import SparsePowerExpectationPropagation
from .sparse_variational import SparseVariationalGaussianProcess
from .sparse_variational_cvi import SparseCVIGaussianProcess
from .spatio_temporal_variational import (
    SparseSpatioTemporalKernel,
    SpatioTemporalSparseCVI,
    SpatioTemporalSparseVariational,
)
from .variational import VariationalGaussianProcess
from .variational_cvi import CVIGaussianProcess, GaussianProcessWithSitesBase

__all__ = [
    "CVIGaussianProcess",
    "GaussianProcessRegression",
    "GaussianProcessWithSitesBase",
    "ImportanceWeightedVI",
    "MarkovFlowModel",
    "MarkovFlowSparseModel",
    "PowerExpectationPropagation",
    "SparseCVIGaussianProcess",
    "SparsePowerExpectationPropagation",
    "SparseSpatioTemporalKernel",
    "SparseVariationalGaussianProcess",
    "SpatioTemporalSparseCVI",
    "SpatioTemporalSparseVariational",
    "VariationalGaussianProcess",
]
