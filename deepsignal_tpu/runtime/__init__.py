from . import caller  # noqa: F401
