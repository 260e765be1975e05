"""Execute the quickstart notebook end-to-end (CI-level notebook check).

Reference analog: the reference never executes its notebook in CI
(SURVEY.md §4); its tests exercise the same workflow through
``RandomDataset`` + ``fast_dev_run``. This test goes further and runs
``notebooks/00_quickstart.ipynb`` itself with nbclient on the fake
8-device CPU mesh — every cell must execute cleanly.
"""

import os
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

NOTEBOOK = Path(__file__).resolve().parents[1] / "notebooks" / "00_quickstart.ipynb"


def test_quickstart_notebook_executes(tmp_path):
    import nbformat
    from nbclient import NotebookClient

    nb = nbformat.read(NOTEBOOK, as_version=4)
    for cell in nb.cells:  # silence missing-id warnings for older nbformat
        if "id" not in cell:
            cell["id"] = os.urandom(4).hex()
    env = {
        **os.environ,
        "PYTHONPATH": str(NOTEBOOK.parents[1]),
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    }
    client = NotebookClient(
        nb,
        timeout=900,
        kernel_name="python3",
        resources={"metadata": {"path": str(tmp_path)}},
    )
    # the kernel inherits the env of this process; force the CPU mesh the
    # same way conftest does for the suite
    os.environ.update(
        {k: env[k] for k in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    )
    client.execute()
    errors = [
        out
        for cell in nb.cells
        if cell.cell_type == "code"
        for out in cell.get("outputs", [])
        if out.get("output_type") == "error"
    ]
    assert not errors, f"notebook raised: {errors[0].get('evalue')}"
