from .cutoffs import (cosine_cutoff, polynomial_cutoff, meam_cutoff,  # noqa
                      deepmd_cutoff, tersoff_cutoff)
from .pairs import pair_vectors, pair_distances, safe_norm  # noqa: F401
from .safe import safe_pow  # noqa: F401
