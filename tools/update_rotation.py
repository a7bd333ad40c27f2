"""Regenerate the rotation plan (run once per round, before the driver gate).

Loads the registry in raw decoration order (plan application disabled),
derives the driver-window order from the committed CORRECTNESS_r*.json
history plus the git diff since the last round-marker commit, and writes
``ting_data_etl_spark/_rotation_plan.json`` — which ``registry.load_all``
applies on every subsequent import. See ``ting_data_etl_spark.rotation``
for the rules and ``tests/test_rotation.py`` for the enforced invariants.

Usage: python tools/update_rotation.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["TING_ROTATION_PLAN_DISABLE"] = "1"  # raw decoration order

from ting_data_etl_spark import registry, rotation  # noqa: E402


def _git(*args: str) -> str:
    proc = subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=False
    )
    if proc.returncode != 0:
        # a swallowed git failure yields an empty changed-file set, which
        # silently under-rotates exactly the modules that changed
        raise RuntimeError(
            f"git {' '.join(args)} failed ({proc.returncode}): "
            f"{proc.stderr.strip()[:500]}"
        )
    return proc.stdout


def changed_since_round_marker() -> set[str]:
    """Files changed since the driver's last 'round N:' commit (+ dirty)."""
    base = None
    for line in _git("log", "--format=%H\x1f%s", "-200").splitlines():
        sha, _, subject = line.partition("\x1f")
        if subject.startswith("round ") and ":" in subject:
            base = sha
            break
    changed: set[str] = set()
    if base:
        for f in _git("diff", "--name-only", f"{base}..HEAD").splitlines():
            if f.strip():
                changed.add(os.path.join(REPO, f.strip()))
    for line in _git("status", "--porcelain").splitlines():
        f = line[3:].strip().split(" -> ")[-1]
        if f:
            changed.add(os.path.join(REPO, f))
    return changed


def main() -> int:
    registry.load_all()
    plan = rotation.compute_plan(
        dict(registry.QUERIES), REPO, changed_since_round_marker()
    )
    with open(rotation.PLAN_PATH, "w") as f:
        json.dump(plan, f, indent=1, sort_keys=True)
        f.write("\n")
    n_due = len(plan["due"])
    print(
        f"rotation plan for round {plan['round']}: {len(plan['order'])} queries, "
        f"{n_due} due (budget {plan['budget']})"
    )
    if n_due > plan["budget"]:
        print(
            f"WARNING: {n_due} due queries exceed the {plan['budget']}-row "
            "budget; overflow is front-of-line next round"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
