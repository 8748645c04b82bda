"""Build script for the optional native extension.

``python setup.py build_ext --inplace`` builds ``deepsignal_tpu._fastparse``
(feature-TSV block parser).  The package works without it — feature_codec
falls back to the numpy parser.
"""

import numpy
from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "deepsignal_tpu._fastparse",
            sources=["deepsignal_tpu/native/fastparse.cpp"],
            include_dirs=[numpy.get_include()],
            extra_compile_args=["-O3", "-std=c++17"],
            language="c++",
        ),
        Extension(
            "deepsignal_tpu._featkernel",
            sources=["deepsignal_tpu/native/featkernel.cpp"],
            include_dirs=[numpy.get_include()],
            extra_compile_args=["-O3", "-std=c++17"],
            language="c++",
        ),
    ],
)
