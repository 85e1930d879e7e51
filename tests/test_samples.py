"""Execute the sample scripts end-to-end (in-process, headless).

Same insurance as tests/test_notebooks.py: the samples are documentation,
and API drift must fail CI rather than a reader.  Scripts run via runpy in
this process (CPU harness from conftest), so they share the warm JAX
backend instead of paying a fresh startup each.
"""
import runpy
import sys
from pathlib import Path

import pytest

_SAMPLES = Path(__file__).parent.parent / "samples" / "python"

_SCRIPTS = [
    "creating_storage_instances.py",
    "intrinsic_and_trinomial.py",
    "extension_points.py",
    "async_calc_service.py",
    "multifactor_storage.py",
]


@pytest.mark.parametrize("name", _SCRIPTS)
def test_sample_script_runs(name, capsys):
    sys.path.insert(0, str(_SAMPLES))
    try:
        runpy.run_path(str(_SAMPLES / name), run_name="__main__")
    finally:
        sys.path.remove(str(_SAMPLES))
    out = capsys.readouterr().out
    assert out.strip(), f"{name} produced no output"
