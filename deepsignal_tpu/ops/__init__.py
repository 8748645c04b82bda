from . import bilstm  # noqa: F401
