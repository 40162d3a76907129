from .base import Likelihood, gauss_hermite
from .multistage import MultiStageLikelihood
from .multivariate_gaussian import MultivariateGaussian
from .pep import PEPGaussian, PEPScalarLikelihood
from .scalar import Bernoulli, Gaussian, Poisson, StudentT, inv_probit
