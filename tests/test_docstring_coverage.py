"""Docstring-coverage gate (reference: docstr-coverage + darglint in
``/root/reference/tox.ini:47-63``).

AST-based so it runs in environments without lint tooling: every module,
public class, and public function/method in ``stonkgs_tpu`` must carry a
docstring.  Private names (leading underscore), dunders other than
``__init__``-bearing classes, and trivial overrides are exempt.
"""

import ast
import os

import stonkgs_tpu

PKG_ROOT = os.path.dirname(stonkgs_tpu.__file__)

# names that are self-describing one-liner passthroughs; keep this list
# SHORT — it is the gate's escape hatch, not a dumping ground
ALLOWED_UNDOCUMENTED = {
    "main",          # click entry points documented via help=
    "cli",           # click group callbacks
    "tree",          # TrainState.tree — trivial accessor
    "replace",       # dataclass-replace passthroughs
    "batch_size",    # PretrainingConfig.batch_size property (derived)
}


def _iter_py_files():
    for dirpath, _dirnames, filenames in os.walk(PKG_ROOT):
        for fn in filenames:
            if fn.endswith(".py"):
                yield os.path.join(dirpath, fn)


def _missing_in_file(path):
    with open(path, encoding="utf-8") as f:
        tree = ast.parse(f.read(), filename=path)
    rel = os.path.relpath(path, os.path.dirname(PKG_ROOT))
    missing = []
    if ast.get_docstring(tree) is None and os.path.basename(path) != "__init__.py":
        missing.append(f"{rel}: module")

    def walk(node, prefix=""):
        for child in ast.iter_child_nodes(node):
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef,
                                  ast.ClassDef)):
                name = child.name
                public = not name.startswith("_")
                if (public and name not in ALLOWED_UNDOCUMENTED
                        and ast.get_docstring(child) is None):
                    # single-statement delegating bodies are tolerated
                    trivial = (
                        isinstance(child, (ast.FunctionDef,
                                           ast.AsyncFunctionDef))
                        and len(child.body) == 1
                        and isinstance(child.body[0], (ast.Return, ast.Expr,
                                                       ast.Raise))
                    )
                    if not trivial:
                        missing.append(f"{rel}: {prefix}{name}")
                # recurse into classes (methods are public API); closures
                # nested in functions are implementation detail, like
                # docstr-coverage's default
                if isinstance(child, ast.ClassDef):
                    walk(child, prefix=f"{prefix}{name}.")

    walk(tree)
    return missing


def test_docstring_coverage():
    """Every public module/class/function in the package is documented."""
    missing = []
    for path in _iter_py_files():
        missing.extend(_missing_in_file(path))
    assert not missing, (
        f"{len(missing)} public definitions lack docstrings:\n  "
        + "\n  ".join(sorted(missing)))
