"""Build the native helper shared object with plain g++ (no pybind11)."""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "graphnative.cpp")
_OUT = os.path.join(_DIR, "libgraphnative.so")


def build(force: bool = False) -> str:
    if force or not os.path.exists(_OUT) or (
        os.path.getmtime(_SRC) > os.path.getmtime(_OUT)
    ):
        subprocess.run(
            [
                "g++",
                "-O3",
                "-march=native",
                "-shared",
                "-fPIC",
                "-pthread",
                "-std=c++17",
                _SRC,
                "-o",
                _OUT,
            ],
            check=True,
            capture_output=True,
        )
    return _OUT


if __name__ == "__main__":
    print(build(force=True))
