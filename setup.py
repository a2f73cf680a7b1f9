from setuptools import setup, find_packages

setup(
    name='nnest_tpu',
    version='0.1.0',
    description=('TPU-native neural nested sampling and MCMC '
                 '(JAX/XLA rebuild of nnest)'),
    packages=find_packages(include=['nnest_tpu', 'nnest_tpu.*']),
    package_data={'nnest_tpu.runtime': ['src/*.cpp']},
    python_requires='>=3.10',
    install_requires=[
        'jax',
        'numpy',
        'optax',
        'scipy',
    ],
    extras_require={
        'plots': ['matplotlib', 'getdist'],
        'tensorboard': ['torch'],
        'test': ['pytest'],
    },
    license='MIT',
)
