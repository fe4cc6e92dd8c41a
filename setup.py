"""Package install for helen_tpu.

The native stitch library builds on demand at first import (g++); no build
step is needed at install time (the reference by contrast drives CMake from
setup.py, setup.py:20-90). Console script mirrors the reference's `helen`
entry point (reference setup.py:152-159).
"""
from setuptools import find_packages, setup

with open("helen_tpu/version.py") as f:
    exec(f.read())

setup(
    name="helen_tpu",
    version=__version__,  # noqa: F821
    description="TPU-native assembly polishing framework (HELEN-compatible)",
    packages=find_packages(include=["helen_tpu", "helen_tpu.*"]),
    include_package_data=True,
    data_files=[("helen_tpu_native", ["native/helen_stitch.cpp"])],
    python_requires=">=3.10",
    install_requires=["jax", "numpy", "h5py", "optax"],
    entry_points={
        "console_scripts": [
            "helen_tpu = helen_tpu.cli:main",
            # the reference also ships a `marginpolish` wrapper script
            # (reference setup.py:152-159); prefixed here so a real
            # marginPolish install keeps its name
            "helen_tpu-marginpolish = helen_tpu.marginpolish:main",
        ]
    },
)
