import numpy
from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "bayesian_inference_tpu.io._fast_tables",
            sources=["src/bayesian_inference_tpu/io/_fast_tables.c"],
            include_dirs=[numpy.get_include()],
            extra_compile_args=["-O3"],
        )
    ]
)
