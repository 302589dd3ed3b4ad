"""Examples must at least stay importable/compilable — they're documentation
that executes, and a bitrotted example is worse than none. (Full execution
is covered manually; compiling catches signature/module renames.)"""

from __future__ import annotations

import pathlib
import py_compile

import pytest

EXAMPLES = sorted((pathlib.Path(__file__).parents[1] / "examples").glob("*.py"))


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_compiles(path):
    py_compile.compile(str(path), doraise=True)


def test_examples_exist():
    assert len(EXAMPLES) == 10
