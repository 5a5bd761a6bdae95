"""Packaging (reference setup.py:1-31 — pip package graphgym==0.3.1;
ours ships the TPU-native framework + the C++ host runtime source)."""

from setuptools import find_packages, setup

setup(
    name="graphgym_tpu",
    version="0.1.0",
    description="TPU-native GNN message-passing framework "
                "(GraphGym + ID-GNN capabilities, JAX/XLA/Pallas)",
    packages=find_packages(exclude=("tests",)),
    package_data={"graphgym_tpu.native": ["graph_native.cpp"]},
    python_requires=">=3.10",
    install_requires=[
        "jax", "flax", "optax", "numpy", "pyyaml",
    ],
    extras_require={
        "data": ["networkx"],
        "viz": ["matplotlib", "tensorboardX"],
    },
)
