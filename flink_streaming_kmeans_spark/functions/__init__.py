from .vector import dot64, l2_norm, dsum, davg, client_ntz  # noqa: F401
