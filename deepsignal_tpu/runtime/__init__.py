"""Runtime: streaming pipeline (host-only) + calling engine (jax).

``caller`` is imported lazily: featurize workers spawn with this package on
their import chain and must not pay the jax import (seconds per worker) nor
touch the accelerator transport.
"""


def __getattr__(name):
    if name == "caller":
        from . import caller
        return caller
    if name == "pipeline":
        from . import pipeline
        return pipeline
    raise AttributeError(name)
