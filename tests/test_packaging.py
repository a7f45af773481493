"""Packaging metadata stays truthful (pyproject.toml).

The framework ships as a pip-installable package with a console entry
point (`popnet-tpu`) replacing the reference's loose entry scripts
(main_evaluate_mp_human_3D.py, main_visualize_*.py, train_*.py). This
test pins the metadata against the tree so the entry point, package
discovery, and native package-data never drift from reality.
"""

import os
import tomllib

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pyproject():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_entry_point_resolves(pyproject):
    target = pyproject["project"]["scripts"]["popnet-tpu"]
    mod_name, func_name = target.split(":")
    import importlib

    mod = importlib.import_module(mod_name)
    assert callable(getattr(mod, func_name))


def test_entry_point_runs_help(pyproject, capsys):
    target = pyproject["project"]["scripts"]["popnet-tpu"]
    mod_name, func_name = target.split(":")
    import importlib

    main = getattr(importlib.import_module(mod_name), func_name)
    with pytest.raises(SystemExit) as e:
        main(["--help"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    for cmd in ("train", "evaluate", "benchmark", "visualize-gt",
                "visualize-pred", "generate-augset"):
        assert cmd in out


def test_package_data_files_exist(pyproject):
    data = pyproject["tool"]["setuptools"]["package-data"]
    for pkg, patterns in data.items():
        pkg_dir = os.path.join(ROOT, *pkg.split("."))
        for pattern in patterns:
            assert os.path.exists(os.path.join(pkg_dir, pattern)), (pkg, pattern)


def test_declared_dependencies_importable(pyproject):
    import importlib

    mod_for_dist = {
        "orbax-checkpoint": "orbax.checkpoint",
        "opencv-python-headless": "cv2",
    }
    for dep in pyproject["project"]["dependencies"]:
        importlib.import_module(mod_for_dist.get(dep, dep))
