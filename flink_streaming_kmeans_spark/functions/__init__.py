from .vector import dot64, l2_norm, dsum, davg  # noqa: F401
