"""Small filesystem/CLI helpers (reference ``experiments/utils.py``)."""

from __future__ import annotations

import argparse
import os
import shutil


def create_directory(directory: str) -> None:
    os.makedirs(directory, exist_ok=True)


def remove_directory(directory: str) -> None:
    if os.path.exists(directory):
        shutil.rmtree(directory)


def str2bool(value: str | bool) -> bool:
    if isinstance(value, bool):
        return value
    if value.lower() in ("true", "1"):
        return True
    if value.lower() in ("false", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")
