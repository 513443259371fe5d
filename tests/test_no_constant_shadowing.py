"""Module-level constant redefinitions in queries.py silently rebind
earlier queries' parameters (Python globals: last assignment wins at
import, earlier functions read the new value at call time). This has
bitten twice (`_B` bootstrap replicates; `_EMB_DIM` 4 -> 64). Fail at
test time instead of at the correctness gate."""

import ast


def test_no_duplicate_module_constants():
    src = open("pliers_spark/queries.py").read()
    tree = ast.parse(src)
    seen = {}
    dups = []
    for node in tree.body:  # module level only — function bodies are fine
        targets = []
        if isinstance(node, ast.Assign):
            targets = [t for t in node.targets if isinstance(t, ast.Name)]
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            targets = [node.target]
        for t in targets:
            if t.id in seen:
                dups.append((t.id, seen[t.id], node.lineno))
            else:
                seen[t.id] = node.lineno
    assert not dups, f"module-level names assigned twice: {dups}"


def test_no_duplicate_query_function_names():
    """Two `def q_foo` with the same name would shadow silently (the
    @query decorator already guards the registry NAME, but a reused
    function name with a new registry name hides the old function)."""
    src = open("pliers_spark/queries.py").read()
    tree = ast.parse(src)
    seen = {}
    dups = []
    for node in tree.body:
        if isinstance(node, ast.FunctionDef):
            if node.name in seen:
                dups.append((node.name, seen[node.name], node.lineno))
            else:
                seen[node.name] = node.lineno
    assert not dups, f"module-level functions defined twice: {dups}"
