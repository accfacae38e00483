"""Path helpers (reference: src/foho/configs/paths.py:8-14)."""

from __future__ import annotations

import os


def package_root() -> str:
    """Root of the installed followmyhold_tpu package."""
    return os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def repo_root() -> str:
    """Root of the repository checkout (parent of the package)."""
    return os.path.abspath(os.path.join(package_root(), ".."))


def assets_root() -> str:
    """Directory for model assets (weights, MANO pickles, regressors).

    Override with FOHO_TPU_ASSETS. Missing assets degrade to synthetic
    initialization so the pipeline stays runnable without downloads.
    """
    return os.environ.get("FOHO_TPU_ASSETS", os.path.join(repo_root(), "assets"))
