from setuptools import setup, Extension

setup(name="minacalc_refdbg", ext_modules=[Extension(
    "minacalc_refdbg",
    sources=["refdbg.cpp", "MinaCalc/MinaCalc.cpp"],
    include_dirs=["."],
    undef_macros=["NDEBUG"],
    extra_compile_args=["-std=c++17", "-O2"],
)])
