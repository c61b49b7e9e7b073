from .explore_gp import plot_patch_group  # noqa: F401
