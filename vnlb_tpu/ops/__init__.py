from . import agg, bayes, color, flat, gather, mask, search  # noqa: F401
