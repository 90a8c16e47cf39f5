"""Audit DEFAULT-value parity: for shared public functions, compare default
values of same-named parameters. A silently different default changes user
results without any API error."""
import ast
import os

REF = "/root/reference/spateo"
OURS = "/root/repo/spateo_tpu"

SKIP_DIRS = {"deprecated", "external"}


def collect(root):
    fns = {}
    for dirpath, dirs, files in os.walk(root):
        if any(s in dirpath for s in ("deprecated",)):
            continue
        for fn in files:
            if not fn.endswith(".py") or "deprecated" in fn:
                continue
            path = os.path.join(dirpath, fn)
            try:
                tree = ast.parse(open(path, encoding="utf-8", errors="replace").read())
            except SyntaxError:
                continue
            for node in ast.walk(tree):
                if isinstance(node, ast.FunctionDef) and not node.name.startswith("_"):
                    args = node.args
                    defaults = {}
                    pos = args.args
                    for a, d in zip(pos[len(pos) - len(args.defaults):], args.defaults):
                        try:
                            defaults[a.arg] = ast.literal_eval(d)
                        except Exception:
                            pass
                    for a, d in zip(args.kwonlyargs, args.kw_defaults):
                        if d is None:
                            continue
                        try:
                            defaults[a.arg] = ast.literal_eval(d)
                        except Exception:
                            pass
                    if node.name not in fns:
                        fns[node.name] = (defaults, os.path.relpath(path, root))
    return fns


ref = collect(REF)
ours = collect(OURS)
rows = []
for name, (rdef, rrel) in ref.items():
    if name not in ours:
        continue
    odef, orel = ours[name]
    diffs = []
    for p, rv in rdef.items():
        if p in odef and odef[p] != rv and not (odef[p] is None and rv is None):
            # ignore float/int equivalence
            try:
                if float(odef[p]) == float(rv):
                    continue
            except Exception:
                pass
            diffs.append((p, rv, odef[p]))
    if diffs:
        rows.append((len(diffs), name, rrel, diffs))

rows.sort(reverse=True)
print(f"{len(rows)} shared functions with differing defaults:")
for n, name, rel, diffs in rows[:50]:
    ds = "; ".join(f"{p}: ref={rv!r} ours={ov!r}" for p, rv, ov in diffs[:5])
    print(f"  {name} ({rel}): {ds}")
