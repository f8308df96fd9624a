"""Package build for snvc_tpu (reference setup.py:24-80 analog).

The compute path is pure JAX (no extension build at install time); the two
native host components (KITTI evaluator, data loader) compile on demand at
first use via g++ (snvc_tpu/eval/kitti_ap.py, snvc_tpu/data/native_loader.py).
``python setup.py build_native`` prebuilds them.
"""

import subprocess
import sys
from pathlib import Path

from setuptools import Command, find_packages, setup

ROOT = Path(__file__).parent


class BuildNative(Command):
    description = "prebuild the native evaluator and data loader"
    user_options = []

    def initialize_options(self):
        pass

    def finalize_options(self):
        pass

    def run(self):
        cpp = ROOT / "cpp"
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-o", str(cpp / "kitti_eval"),
             str(cpp / "kitti_eval.cpp")],
            check=True,
        )
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o",
             str(cpp / "libsnvc_loader.so"), str(cpp / "dataloader.cpp"),
             "-lpng", "-lz", "-lpthread"],
            check=True,
        )


def git_version():
    try:
        h = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, cwd=ROOT,
        ).stdout.strip()
        return f"0.1.0+{h}" if h else "0.1.0"
    except Exception:
        return "0.1.0"


setup(
    name="snvc_tpu",
    version=git_version(),
    packages=find_packages(include=["snvc_tpu", "snvc_tpu.*"]),
    python_requires=">=3.10",
    install_requires=["jax", "flax", "optax", "orbax-checkpoint", "numpy"],
    cmdclass={"build_native": BuildNative},
)
