from .lstm import lstm_layer_pallas  # noqa: F401
