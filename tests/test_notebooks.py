"""Execute the sample notebooks' code cells end-to-end (headless).

The notebooks are flagship documentation; cell rot (e.g. an API default
change breaking a downstream cell) must fail CI, not a reader.  Cells are
executed in order in a shared namespace with matplotlib stubbed out.
"""
import json
import sys
from pathlib import Path

import pytest

_SAMPLES = Path(__file__).parent.parent / "samples" / "python"


def _run_notebook(name: str):
    nb = json.loads((_SAMPLES / name).read_text())
    ns: dict = {}
    for i, cell in enumerate(nb["cells"]):
        if cell["cell_type"] != "code":
            continue
        src = "".join(cell["source"])
        try:
            exec(compile(src, f"{name}:cell{i}", "exec"), ns)  # noqa: S102
        except ModuleNotFoundError as exc:
            if "matplotlib" in str(exc):
                continue  # chart cells are optional extras
            raise
    return ns


@pytest.mark.parametrize(
    "name", ["creating_storage_instances.ipynb", "multifactor_storage.ipynb"]
)
def test_notebook_executes(name):
    ns = _run_notebook(name)
    assert ns  # at least one cell ran


def test_multifactor_notebook_results_consistent():
    ns = _run_notebook("multifactor_storage.ipynb")
    results = ns["results"]
    assert results.npv > results.intrinsic_npv > 0
    # value_from_sims round trip reproduces the panel run's NPV.
    assert abs(ns["revalued"].npv - ns["with_panels"].npv) <= max(
        1e-6 * abs(ns["with_panels"].npv), 1e-6
    )
    # generic basis within MC error of the monomial run.
    z = abs(ns["gen_results"].npv - results.npv) / results.val_sim_standard_error
    assert z < 4.0
