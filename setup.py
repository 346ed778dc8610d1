from setuptools import setup, find_packages

setup(
    name="g3py_tpu",
    version="0.1.0",
    description="TPU-native generalized graphical Gaussian processes (JAX/XLA/Pallas)",
    packages=find_packages(exclude=("tests",)),
    python_requires=">=3.10",
    install_requires=["jax", "numpy", "scipy", "pandas"],
)
