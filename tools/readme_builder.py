#!/usr/bin/env python
"""Build a recipe-inventory README table from tests/recipes/recipes.csv
(the reference's tools/readme_builder.py generates recipe tables from
its test CSVs the same way).

Run: python tools/readme_builder.py [--csv tests/recipes/recipes.csv]
Prints a GitHub-flavoured markdown table of every registered recipe.
"""

import argparse
import csv
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def build_table(csv_path):
    rows = []
    with open(csv_path, encoding="utf-8") as f:
        for row in csv.DictReader(f):
            dataset = row["recipe_dir"].split("/")[1]
            task = "/".join(row["recipe_dir"].split("/")[2:]) or "-"
            runnable = not row["test_debug_flags"].startswith("SKIP")
            rows.append((dataset, task, row["script"], runnable))
    rows.sort()
    lines = [
        "| Dataset | Task | Script | Debug-runnable |",
        "|---|---|---|---|",
    ]
    for dataset, task, script, runnable in rows:
        mark = "yes" if runnable else "no"
        lines.append(f"| {dataset} | {task} | `{script}` | {mark} |")
    return "\n".join(lines)


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--csv", default=str(REPO / "tests" / "recipes" / "recipes.csv")
    )
    args = ap.parse_args()
    print(build_table(args.csv))
