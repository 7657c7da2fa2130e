"""Consistency: every public module/class/function carries a docstring
(mirrors reference tests/consistency/test_docstrings.py)."""

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parents[2] / "speechbrain_tpu"

# private helpers and re-export shims are exempt
EXEMPT_PREFIXES = ("_",)


def _iter_py_files():
    for path in sorted(PKG.rglob("*.py")):
        yield path


def _missing_docstrings(path):
    tree = ast.parse(path.read_text(encoding="utf-8"))
    missing = []
    if ast.get_docstring(tree) is None:
        missing.append(f"{path}: module docstring")
    for node in ast.walk(tree):
        if isinstance(node, (ast.ClassDef, ast.FunctionDef,
                             ast.AsyncFunctionDef)):
            if node.name.startswith(EXEMPT_PREFIXES):
                continue
            # property setters / overloads / nested defs inside functions
            # are skipped: only top-level + class-level defs are checked
            if ast.get_docstring(node) is None:
                missing.append(f"{path}:{node.lineno}: {node.name}")
    return missing


def test_module_docstrings():
    missing = []
    for path in _iter_py_files():
        tree = ast.parse(path.read_text(encoding="utf-8"))
        if ast.get_docstring(tree) is None:
            missing.append(str(path.relative_to(PKG)))
    assert not missing, f"modules without docstrings: {missing}"


def test_class_docstrings():
    missing = []
    for path in _iter_py_files():
        tree = ast.parse(path.read_text(encoding="utf-8"))
        for node in tree.body:
            if isinstance(node, ast.ClassDef) and not node.name.startswith(
                EXEMPT_PREFIXES
            ):
                if ast.get_docstring(node) is None:
                    missing.append(
                        f"{path.relative_to(PKG)}:{node.lineno} {node.name}"
                    )
    assert not missing, f"classes without docstrings: {missing}"


def test_function_docstrings():
    missing = []
    for path in _iter_py_files():
        tree = ast.parse(path.read_text(encoding="utf-8"))
        for node in tree.body:
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef)
            ) and not node.name.startswith(EXEMPT_PREFIXES):
                if ast.get_docstring(node) is None:
                    missing.append(
                        f"{path.relative_to(PKG)}:{node.lineno} {node.name}"
                    )
    assert not missing, f"functions without docstrings: {missing}"


def test_reference_citations_present():
    """Spot-check that parity docstrings cite the reference layout."""
    cited = 0
    total = 0
    for path in _iter_py_files():
        if path.name == "__init__.py":
            continue
        total += 1
        text = path.read_text(encoding="utf-8")
        if "reference" in text[:2000].lower():
            cited += 1
    # most non-init modules should cite their reference counterpart
    assert cited / max(total, 1) > 0.75, (cited, total)
