"""Generate the notebook surface from the tutorial sources.

The reference's user surface is Jupyter notebooks with rendered outputs
(/root/reference/README.md:20-30; e.g. notebooks/04-Random-Fields-Fixed
.ipynb).  The rebuild's tutorials are CI-replayed ``examples/tut*.py``
scripts; this tool derives ``notebooks/*.ipynb`` from them — same code,
notebook form, executed outputs and inline plots — so the two surfaces
cannot drift: the .ipynb code cells are a pure function of the .py
source, and ``tests/test_examples.py::TestNotebooks`` rebuilds them and
compares cell-for-cell.

Usage::

    python tools/make_notebooks.py              # build + execute flagships
    python tools/make_notebooks.py --no-exec    # build only (fast)
    python tools/make_notebooks.py tut01_gaussian_processes ...
"""

import ast
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: every tutorial ships as a notebook (round 4 started with the five
#: VERDICT flagships — 01/04/09/10/19 — then extended to the full set)
FLAGSHIPS = [
    "tut00_introduction",
    "tut01_gaussian_processes",
    "tut02_hyperparameters",
    "tut03_kernels",
    "tut04_random_fields",
    "tut05_pushforward",
    "tut06_copulas",
    "tut07_multi_output",
    "tut08_graphical_models",
    "tut09_large_scale",
    "tut10_serving",
    "tut11_distributed_training",
    "tut12_likelihoods",
    "tut13_time_series",
    "tut14_spatiotemporal",
    "tut15_grids",
    "tut16_ski",
    "tut17_deep_kernels",
    "tut18_bayesian_optimization",
    "tut19_multioutput_50k",
]

_BOOTSTRAP = """\
# Headless/CI bootstrap: repo + examples on the path, a virtual 8-device
# CPU mesh for the sharded paths (delete the jax lines on a real TPU
# host), Agg plots.
import os, sys
sys.path.insert(0, os.path.abspath(".."))
sys.path.insert(0, os.path.abspath("../examples"))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
import matplotlib
matplotlib.use("Agg")\
"""


def _split_source(path):
    """(docstring, body) with the module docstring and EVERY top-level
    ``if __name__ == "__main__"`` block stripped from the body (some
    tutorials carry a direct-run path bootstrap at the top — e.g.
    tut19 — which the notebook bootstrap cell replaces)."""
    src = open(path).read()
    tree = ast.parse(src)
    doc = ast.get_docstring(tree) or ""
    lines = src.splitlines()
    body_start = 0
    if (tree.body and isinstance(tree.body[0], ast.Expr)
            and isinstance(tree.body[0].value, ast.Constant)):
        body_start = tree.body[0].end_lineno
    drop = set()
    for node in tree.body:
        if (isinstance(node, ast.If) and isinstance(node.test, ast.Compare)
                and isinstance(node.test.left, ast.Name)
                and node.test.left.id == "__name__"):
            drop.update(range(node.lineno - 1, node.end_lineno))
    kept = [ln for i, ln in enumerate(lines)
            if i >= body_start and i not in drop]
    body = re.sub(r"\n{3,}", "\n\n", "\n".join(kept)).strip("\n")
    return doc, body


def build_notebook(tut_name):
    """Pure construction of the notebook node for one tutorial —
    deterministic in the .py source (the CI sync test relies on it)."""
    import nbformat

    path = os.path.join(REPO, "examples", tut_name + ".py")
    doc, body = _split_source(path)
    title = doc.splitlines()[0] if doc else tut_name
    rest = "\n".join(doc.splitlines()[1:]).strip()

    nb = nbformat.v4.new_notebook()
    nb.metadata["kernelspec"] = {"name": "python3",
                                 "display_name": "Python 3",
                                 "language": "python"}
    nb.metadata["language_info"] = {"name": "python"}
    cells = [
        nbformat.v4.new_markdown_cell(f"# {title}\n\n{rest}"),
        nbformat.v4.new_code_cell(_BOOTSTRAP),
        nbformat.v4.new_code_cell(body),
        nbformat.v4.new_code_cell(
            "out = main(quick=True, plot=True)\n"
            "out if not isinstance(out, dict) else "
            "{k: out[k] for k in list(out)[:6]}"),
        nbformat.v4.new_code_cell(
            "# rendered figures (written by the tutorial via save_fig)\n"
            "import glob\n"
            "from IPython.display import Image, display\n"
            f"for p in sorted(glob.glob('../examples/output/"
            f"{tut_name.split('_')[0]}*.png')):\n"
            "    display(Image(p))"),
    ]
    nb.cells = cells
    for i, c in enumerate(nb.cells):
        # deterministic ids: the committed .ipynb must be a pure function
        # of the .py source for the CI sync test
        c["id"] = f"{tut_name}-{i}"
    return nb


def execute(nb, timeout=1800):
    from nbclient import NotebookClient

    client = NotebookClient(nb, timeout=timeout, kernel_name="python3",
                            resources={"metadata": {"path": os.path.join(
                                REPO, "notebooks")}})
    client.execute()
    return nb


def main(argv):
    import nbformat

    names = [a for a in argv if not a.startswith("-")] or FLAGSHIPS
    no_exec = "--no-exec" in argv
    outdir = os.path.join(REPO, "notebooks")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        nb = build_notebook(name)
        if not no_exec:
            print(f"executing {name} ...", flush=True)
            execute(nb)
        dest = os.path.join(outdir, name + ".ipynb")
        nbformat.write(nb, dest)
        print("wrote", dest, flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
