"""Suite self-checks. A module-level redefinition SILENTLY replaces the
earlier test (caught live in r17: a new interval-join family reused an
existing family's name and deleted its DuckDB-oracle variant from
collection — the count dropped by one with zero warnings)."""

from __future__ import annotations

import ast
import glob
import os
from collections import Counter

HERE = os.path.dirname(os.path.abspath(__file__))


def test_no_duplicate_definition_names_in_test_modules():
    offenders = []
    for path in sorted(glob.glob(os.path.join(HERE, "test_*.py"))):
        tree = ast.parse(open(path).read())

        def walk(node, scope):
            names = Counter(
                n.name
                for n in ast.iter_child_nodes(node)
                if isinstance(
                    n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
                )
            )
            offenders.extend(
                f"{os.path.basename(path)}{scope}::{name} x{c}"
                for name, c in names.items()
                if c > 1
            )
            for n in ast.iter_child_nodes(node):
                if isinstance(n, ast.ClassDef):
                    walk(n, f"{scope}::{n.name}")

        walk(tree, "")
    assert not offenders, offenders
