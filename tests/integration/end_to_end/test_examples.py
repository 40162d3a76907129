"""Execute every docs example as a test
(pattern: reference tests/integration/end_to_end/test_notebooks.py:36-84 —
the examples double as the de facto end-to-end suite; each contains its own
assertions)."""
import pathlib
import runpy

import pytest

EXAMPLES_DIR = (pathlib.Path(__file__).resolve().parents[3] / "docs"
                / "examples")
EXAMPLES = sorted(EXAMPLES_DIR.glob("*.py"))


@pytest.mark.parametrize("example", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(example):
    runpy.run_path(str(example), run_name="__main__")
