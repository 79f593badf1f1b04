"""Package installation for unicycler_tpu.

The native traceback decoder (unicycler_tpu/native/cigar_decode.cpp) is
built lazily at first use with g++ via ctypes, so no compilation happens
at install time (the reference compiles its C++ in setup.py,
ref setup.py:85-111; here the compute path is JAX/Pallas and only a small
host-side helper is native).
"""

from setuptools import find_packages, setup

setup(
    name='unicycler_tpu',
    version='0.1.0',
    description='TPU-native hybrid bacterial genome assembly framework',
    packages=find_packages(exclude=['tests']),
    package_data={'unicycler_tpu': ['native/*.cpp']},
    python_requires='>=3.10',
    install_requires=['numpy', 'jax'],
    entry_points={
        'console_scripts':
            ['unicycler_tpu = unicycler_tpu.pipeline.main:main'],
    },
)
