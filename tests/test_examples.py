"""The checked-in examples must keep running (API-rot guard).

Each example supports ``--small`` and self-checks its own semantics
(generate verifies decode against the full forward on CPU;
serve_continuous asserts every queued request completes). Heavy
examples (train, int8 serve) are exercised indirectly by the op/model
tests; the two serving-loop examples run here end to end.
"""

import os
import runpy
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = [os.path.join(_ROOT, "examples", f)
            for f in ("generate.py", "serve_continuous.py")]


@pytest.mark.parametrize("path", EXAMPLES)
def test_example_runs_small(path, monkeypatch):
    monkeypatch.setattr(sys, "argv", [path.split("/")[-1], "--small"])
    runpy.run_path(path, run_name="__main__")
