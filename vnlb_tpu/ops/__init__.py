from . import (agg, bayes, color, eigh, flat, flow, gather, linalg, mask,  # noqa: F401
               search, search_dense, spectral)
