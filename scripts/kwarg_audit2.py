"""Kwarg-surface parity v2: match functions by BEST candidate across all
same-named definitions on both sides (minimal missing set), skipping
deprecated/vendored-backend reference modules. Reports only genuine gaps —
a reference kwarg that NO same-named function of ours accepts."""
import ast
import os
from collections import defaultdict

REF = "/root/reference/spateo"
OURS = "/root/repo/spateo_tpu"

SKIP_REF_SUBSTR = (
    "deprecated",
    "backend_ot",
    "backend.py",
    "external/MERFISHVI",
    "external/CAST",
    "external/STAGATE",
    "_old",
)


def collect(root, skip=()):
    fns = defaultdict(list)  # name -> [(argset, has_varkw, relpath)]
    for dirpath, _, files in os.walk(root):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, root)
            if any(s in rel for s in skip):
                continue
            try:
                tree = ast.parse(open(path, encoding="utf-8", errors="replace").read())
            except SyntaxError:
                continue
            for node in ast.walk(tree):
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and not node.name.startswith("_"):
                    args = {a.arg for a in node.args.args + node.args.kwonlyargs} - {"self", "cls"}
                    fns[node.name].append((args, node.args.kwarg is not None, rel))
    return fns


ref = collect(REF, SKIP_REF_SUBSTR)
ours = collect(OURS)

NOISE = {"device", "dtype", "nn_init", "type_as", "nx", "n_jobs", "processes", "n_threads", "gpu", "cpu", "use_gpu"}

rows = []
for name, rdefs in ref.items():
    if name not in ours:
        continue
    odefs = ours[name]
    best = None
    for rargs, rkw, rrel in rdefs:
        # best our-side candidate for this reference def
        cand = min(odefs, key=lambda o: len(rargs - o[0]))
        oargs, okw, orel = cand
        missing = {m for m in (rargs - oargs) if m not in NOISE}
        if okw:
            missing = set()
        item = (len(missing), name, rrel, orel, sorted(missing))
        if best is None or item[0] < best[0]:
            best = item
    if best and best[0] >= 2:
        rows.append(best)

rows.sort(reverse=True)
print(f"{len(rows)} shared functions missing >=2 reference kwargs (best-candidate match):")
for n, name, rrel, orel, missing in rows[:60]:
    print(f"  {name}  ref={rrel}  ours={orel}  -{n}: {', '.join(missing[:14])}")
