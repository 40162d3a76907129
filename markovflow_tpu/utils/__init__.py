from .bijectors import (
    Bijector,
    FillTriangular,
    Identity,
    Ordered,
    Positive,
    fill_triangular,
    fill_triangular_inverse,
    ordered,
    positive,
    triangular,
)
from .linalg import (
    add_jitter,
    augment_matrix,
    augment_square_matrix,
    batched_kron,
    block_diag,
    cholesky_or_zero,
    mvn_logpdf,
    safe_cholesky,
    solve_from_chol,
    symmetrize,
    tlt,
    to_delta_time,
)
from .module import (
    Module,
    Parameter,
    apply_updates,
    trainable_mask,
    zero_untrainable,
)
