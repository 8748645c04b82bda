from .lstm import (bilstm_encoder_fused, bilstm_encoder_pallas,  # noqa: F401
                   lstm_layer_pallas)
