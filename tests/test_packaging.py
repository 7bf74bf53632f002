"""Packaging metadata stays in sync with the code.

Every console script declared in pyproject.toml must resolve to an importable
callable, and the dynamic version attribute must exist — so a CLI rename or
module move can't silently ship a broken entry point.
"""

import importlib
import os
import tomllib

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pyproject():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as fh:
        return tomllib.load(fh)


def test_version_attr():
    import ic_gan_tpu

    proj = _pyproject()
    attr = proj["tool"]["setuptools"]["dynamic"]["version"]["attr"]
    assert attr == "ic_gan_tpu.__version__"
    assert isinstance(ic_gan_tpu.__version__, str) and ic_gan_tpu.__version__


@pytest.mark.parametrize(
    "name,target",
    sorted(_pyproject()["project"]["scripts"].items()),
)
def test_console_script_resolves(name, target):
    mod_name, func_name = target.split(":")
    mod = importlib.import_module(mod_name)
    fn = getattr(mod, func_name)
    assert callable(fn), target


def test_native_source_ships_with_wheel():
    proj = _pyproject()
    pkg_data = proj["tool"]["setuptools"]["package-data"]["ic_gan_tpu.native"]
    assert "*.cpp" in pkg_data
    assert os.path.exists(
        os.path.join(ROOT, "ic_gan_tpu", "native", "fastloader.cpp")
    )
