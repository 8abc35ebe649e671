"""Convert jupytext percent-format scripts to .ipynb notebooks.

The tutorials under examples/ are maintained as percent-format .py (diffable,
runnable, testable); this 60-line converter materializes the .ipynb twins the
reference ships (soft_intro_vae_tutorial/*.ipynb) without a jupytext
dependency. Usage:

    python tools/py2nb.py examples/tutorial_2d_toy.py [more.py ...]

Writes <name>.ipynb next to each input.
"""

from __future__ import annotations

import json
import re
import sys

CELL_RE = re.compile(r"^# %%(\s*\[markdown\])?\s*$")


def parse_cells(src: str):
    """Split percent-format source into (kind, text) cells."""
    cells = []
    kind, buf = None, []

    def flush():
        if kind is None:
            return
        text = "\n".join(buf).strip("\n")
        if text.strip():
            cells.append((kind, text))

    for line in src.splitlines():
        m = CELL_RE.match(line)
        if m:
            flush()
            kind, buf = ("markdown" if m.group(1) else "code"), []
        elif kind is not None:
            buf.append(line)
        # preamble before the first marker is dropped (shebang/encoding only)
    flush()
    return cells


def to_notebook(cells):
    nb_cells = []
    for kind, text in cells:
        if kind == "markdown":
            # strip the leading "# " comment prefix percent-format uses
            lines = [re.sub(r"^#( |$)", "", ln) for ln in text.splitlines()]
            source = "\n".join(lines)
        else:
            source = text
        nb_cells.append({
            "cell_type": kind,
            "metadata": {},
            "source": [ln + "\n" for ln in source.splitlines()][:-1]
                      + [source.splitlines()[-1]] if source else [],
            **({"outputs": [], "execution_count": None} if kind == "code" else {}),
        })
    return {
        "cells": nb_cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python", "version": "3"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def main(paths):
    for p in paths:
        with open(p) as f:
            src = f.read()
        cells = parse_cells(src)
        if not cells:
            print(f"{p}: no percent cells found, skipped", file=sys.stderr)
            continue
        out = p[:-3] + ".ipynb" if p.endswith(".py") else p + ".ipynb"
        with open(out, "w") as f:
            json.dump(to_notebook(cells), f, indent=1)
        print(f"{p} -> {out} ({len(cells)} cells)")


if __name__ == "__main__":
    main(sys.argv[1:])
