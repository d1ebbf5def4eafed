from . import rope, norms, sampling, attention  # noqa: F401
