"""Audit option-surface parity: for every public function name shared with
the reference, diff the keyword-parameter names. Missing kwargs = options a
reference user would reach for and not find. Pure-AST, no imports."""
import ast
import os
import sys
from collections import defaultdict

REF = "/root/reference/spateo"
OURS = "/root/repo/spateo_tpu"


def collect(root):
    fns = {}
    for dirpath, _, files in os.walk(root):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            try:
                tree = ast.parse(open(path, encoding="utf-8", errors="replace").read())
            except SyntaxError:
                continue
            for node in ast.walk(tree):
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and not node.name.startswith("_"):
                    args = [a.arg for a in node.args.args + node.args.kwonlyargs]
                    has_var_kw = node.args.kwarg is not None
                    rel = os.path.relpath(path, root)
                    key = node.name
                    # prefer first seen; collisions noted
                    if key not in fns:
                        fns[key] = (set(args), has_var_kw, rel, len(args))
    return fns


ref = collect(REF)
ours = collect(OURS)

rows = []
for name, (rargs, rkw, rrel, rn) in ref.items():
    if name not in ours:
        continue
    oargs, okw, orel, on = ours[name]
    missing = rargs - oargs - {"self"}
    # ignore torch/device-specific params that have no TPU meaning
    noise = {"device", "dtype", "verbose", "nn_init", "batch_size", "inplace"}
    missing = {m for m in missing if m not in noise}
    if len(missing) >= 3 and not okw:
        rows.append((len(missing), name, rrel, sorted(missing)))

rows.sort(reverse=True)
print(f"{len(rows)} shared functions missing >=3 reference kwargs (and no **kwargs):")
for n, name, rel, missing in rows[:40]:
    print(f"  {name} ({rel}): -{n}: {', '.join(missing[:12])}")
