"""Diff keyword-parameter surfaces of same-named plotting functions vs the
reference. Prints, per function, the reference kwargs our version lacks.

AST-based (no imports needed). Reference tree is read-only input.
"""
import ast
import sys
from pathlib import Path

REF = Path("/root/reference/spateo")
OURS = Path("/root/repo/spateo_tpu")

# our module -> reference module
PAIRS = [
    ("plotting/align.py", "plotting/static/align.py"),
    ("plotting/scatters.py", "plotting/static/scatters.py"),
    ("plotting/utils.py", "plotting/static/utils.py"),
    ("plotting/networks.py", "plotting/static/networks.py"),
    ("plotting/glm.py", "plotting/static/glm.py"),
    ("plotting/space.py", "plotting/static/space.py"),
    ("plotting/geo.py", "plotting/static/geo.py"),
    ("plotting/agg.py", "plotting/static/agg.py"),
    ("plotting/bbs.py", "plotting/static/bbs.py"),
    ("plotting/lisa.py", "plotting/static/lisa.py"),
    ("plotting/contour.py", "plotting/static/contour.py"),
    ("plotting/polarity.py", "plotting/static/polarity.py"),
    ("plotting/dotplot.py", "plotting/static/dotplot.py"),
    ("plotting/interactions.py", "plotting/static/interactions.py"),
    ("plotting/colorlabel.py", "plotting/static/colorlabel.py"),
    ("plotting/three_d_plot/three_dims_plots.py", "plotting/static/three_d_plot/three_dims_plots.py"),
    ("plotting/three_d_plot/pairwise_align_plots.py", "plotting/static/three_d_plot/pairwise_align_plots.py"),
]


def fn_params(path):
    try:
        tree = ast.parse(path.read_text())
    except Exception as e:
        print(f"  !! parse error {path}: {e}")
        return {}
    out = {}
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            a = node.args
            names = [x.arg for x in a.posonlyargs + a.args + a.kwonlyargs]
            has_kw = a.kwarg is not None
            out.setdefault(node.name, (set(names), has_kw))
    return out


total_missing = 0
for ours_rel, ref_rel in PAIRS:
    op, rp = OURS / ours_rel, REF / ref_rel
    if not op.exists() or not rp.exists():
        print(f"== {ours_rel}: MISSING FILE ({op.exists()}, {rp.exists()})")
        continue
    o, r = fn_params(op), fn_params(rp)
    lines = []
    for name, (rparams, _) in sorted(r.items()):
        if name.startswith("_"):
            continue
        if name not in o:
            lines.append(f"  {name}: FUNCTION ABSENT")
            continue
        oparams, okw = o[name]
        missing = sorted(rparams - oparams - {"self"})
        if missing and not okw:
            lines.append(f"  {name}: missing kwargs (no **kw): {missing}")
        elif missing:
            lines.append(f"  {name}: absorbed by **kw (verify behavior): {missing}")
    if lines:
        print(f"== {ours_rel} (ref {ref_rel})")
        for l in lines:
            print(l)
        total_missing += len(lines)
print(f"\ntotal flagged: {total_missing}")
