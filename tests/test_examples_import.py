"""Guard the CLI drivers against import-time bitrot (they only run under
``__main__``, so importing is cheap)."""

import importlib.util
import pathlib
import sys

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"
sys.path.insert(0, str(EXAMPLES))


@pytest.mark.parametrize(
    "name", ["pmg", "cg", "mat_free", "amg", "vector_update", "scaling",
             "heat", "wave", "modes", "nonlinear", "convdiff",
             "unstructured", "_common"]
)
def test_example_imports(name):
    spec = importlib.util.spec_from_file_location(name, EXAMPLES / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert hasattr(mod, "main") or name == "_common"
