"""Packaging metadata stays in sync with the source tree: every real
subpackage must be declared in pyproject.toml's [tool.setuptools].packages
(a missing entry ships a wheel with silently absent modules — the
`nemotron_tpu.losses` package was once missing, breaking pip-installed
training/TDT)."""

import os
import pkgutil

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_subpackages_declared():
    tomllib = pytest.importorskip("tomllib")
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        declared = set(tomllib.load(f)["tool"]["setuptools"]["packages"])
    actual = {"nemotron_tpu", "cli"} | {
        "nemotron_tpu." + m.name
        for m in pkgutil.iter_modules([os.path.join(REPO, "nemotron_tpu")])
        if m.ispkg}
    missing = actual - declared
    assert not missing, f"subpackages not declared in pyproject: {missing}"


def test_console_scripts_resolve():
    import importlib

    tomllib = pytest.importorskip("tomllib")
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    for target in scripts.values():
        mod, _, attr = target.partition(":")
        obj = importlib.import_module(mod)
        assert callable(getattr(obj, attr))
