from .whdr import (  # noqa: F401
    whdr, whdr_batch, whdr_hinge, whdr_hinge_batch,
    comparisons_to_pixel_indices, MAX_EVALUATED_COMPARISONS,
)
from .losses import boundary_loss, lambert_loss  # noqa: F401
