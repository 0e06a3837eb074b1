from gsjax.model.gaussians import (  # noqa: F401
    GaussianAux,
    GaussianParams,
    AdamState,
)
