"""Build the native minacalc extension: python setup.py build_ext --inplace
(ref packaging: MinaCalc-1.0 setup.py, -std=c++17)."""

from setuptools import Extension, setup

setup(
    name="minacalc",
    version="1.0",
    ext_modules=[
        Extension(
            "minacalc",
            sources=["minacalc.cpp"],
            extra_compile_args=["-std=c++17", "-O2"],
        )
    ],
)
