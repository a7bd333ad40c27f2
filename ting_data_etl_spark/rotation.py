"""Driver-budget rotation derived from the committed correctness history.

The correctness driver checks registered queries in registration order under
a finite budget (~50 rows per round), while the registry carries ~100
queries. Earlier rounds rotated stable queries out of the window by
hand-maintained ``defer=True`` flags plus prose in ``registry.load_all`` —
this module replaces that with a DERIVED plan (round-5 verdict, next-round
item #3): ``tools/update_rotation.py`` recomputes the plan each round from
the committed ``CORRECTNESS_r*.json`` artifacts and the git diff since the
last round marker, and ``registry.load_all`` reorders the registry to match.

Rules (mirrored by the invariants test in ``tests/test_rotation.py``):

* a query is DUE for a driver row — ordered to the front, oldest last-row
  first — when any of:
  - it has never had a driver row, or its latest driver row FAILED;
  - it lacks two consecutive green driver rows (new or flaky queries must
    earn rotation);
  - its last driver row is more than its EARNED staleness bound old
    (``MAX_ROW_AGE`` rounds; ``MAX_ROW_AGE_TENURED`` once the last
    ``TENURE_ROWS`` driver rows are all green — the r13 growth decision,
    see the constants below): every query re-enters the window on a
    bounded cadence;
  - the module that registers it changed since the last round marker
    (direct-module rule; cross-cutting changes to shared loaders are
    caught by the staleness bound within MAX_ROW_AGE rounds, and by the
    committed full local sweeps every round).
* all other queries are FRESH and fill the order behind the due set,
  oldest driver row first, so the budget's slack cycles through them.

The plan file commits the module hashes it derived the decision from, so
the test fails loudly when code changes without a plan regeneration.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import re
import sys

DRIVER_BUDGET = 50  # rows the driver's correctness gate records per round
# Max rounds a query may go without a driver row. Raised 2 -> 3 at r12
# (VERDICT r11 #1): age-2 forces due at age 3, i.e. steady-state demand of
# N/3 rows/round, which the 50-row budget only covers to N=150 — the
# registry hit 149 at r11 and grows every round. Age-3 (due at 4) covers
# N=200 with the same budget; the simulated worst gap is 4, pinned by
# tests/test_rotation.py::test_driver_cadence_bounded.
MAX_ROW_AGE = 3
# THE GROWTH DECISION (r13, VERDICT r12 #5): the registry passed 157 against
# the flat-cadence N=200 ceiling, and freezing growth or raising the
# driver's budget are not ours to choose (new operators are mandated; the
# budget is the driver's). Instead the cadence is TIERED BY EARNED
# STABILITY: a query whose last TENURE_ROWS driver rows are ALL green (and
# whose module is unchanged — the direct-module rule still forces due) is
# "tenured" and rotates on MAX_ROW_AGE_TENURED instead. Rationale: a row
# with a 3-green streak only goes stale via cross-cutting drift in shared
# loaders, which the committed FULL local sweeps (run every round at three
# scale factors) still cover every round — the driver row is the
# independent re-check, not the only check. Steady-state demand when all
# queries are tenured is N/(MAX_ROW_AGE_TENURED+1) ≤ budget, i.e. a design
# ceiling of 300 queries. Pinned by tests/test_rotation.py: worst simulated
# gap MAX_ROW_AGE_TENURED + 1 at the current registry size, and + 2 at the
# full-utilization ceiling (demand == budget there, so a cohort collision
# spills exactly one round before the queue re-staggers).
MAX_ROW_AGE_TENURED = 5
TENURE_ROWS = 3
PLAN_PATH = os.path.join(os.path.dirname(__file__), "_rotation_plan.json")

# THE SPEC-SURFACE SAFETY VALVE (r14, VERDICT r13 #5; hardened r15,
# VERDICT r14 #1): with the tenured cadence, a SURVEY §2 reference-parity
# query can legally go MAX_ROW_AGE_TENURED rounds without a driver row
# while recently-changed extension modules hog the budget — the r13 sample
# had ZERO §2 rows, and the r14 sample (84 due > 50 budget, so zero slack)
# held only 2. Cumulative history plus the committed full local sweeps
# still cover the surface, but the spec queries ARE the contract, so each
# driver sample reserves a floor of them:
#
# * slack-funded promotion (r14): when the due list leaves slack, the
#   stalest spec-surface queries are promoted to the front of the fresh
#   tail until the head-window holds at least SPEC_FLOOR of them.
# * deferral-funded promotion (r15): when the due list overflows the
#   budget, the floor is reserved by DEFERRING the newest-tenured
#   non-spec due rows past the window — these have the longest remaining
#   age slack (a tenured row due via the direct-module rule with a recent
#   green row loses nothing by waiting one round; its staleness bound is
#   guarded by the eligibility cutoff below). Failure-due rows, rows
#   without a tenured streak, and rows whose deferral would push them past
#   the tenured staleness bound are never deferred.
SPEC_PREFIXES = ("flagship", "job_", "prim_", "sink_", "e2e_", "csv_")
SPEC_FLOOR = 8


def is_spec(name: str) -> bool:
    """True for SURVEY §2 spec-surface queries (reference-parity names)."""
    return name.startswith(SPEC_PREFIXES)


def _apply_spec_floor(
    due_names: list[str],
    fresh_names: list[str],
    budget: int = DRIVER_BUDGET,
    deferrable: list[str] | None = None,
) -> tuple[list[str], list[str], list[str]]:
    """(full order, promoted names, deferred names) under the spec floor.

    ``deferrable`` is the ordered (best-to-defer-first: newest tenured
    last-row first) list of due names the caller certifies may wait one
    round — tenured, green-streak, non-spec, and within the staleness
    bound even after a one-round deferral. When the slack the due list
    leaves cannot fund the floor, up to the shortfall is funded by moving
    deferrable due rows from inside the head window to just past it, and
    promoting one stalest fresh spec row into each vacated slot. Failure
    and staleness priority is preserved: only caller-certified rows move,
    and they re-enter next round at the front of the due order (their
    last row is now the oldest unserved)."""
    deferrable = deferrable or []
    slack = max(0, budget - len(due_names))
    spec_in_window = sum(1 for n in due_names[:budget] if is_spec(n))
    need = max(0, SPEC_FLOOR - spec_in_window)
    overflow_due = due_names[budget:]
    # promotion pool: overflow-due spec rows first (they are DUE — a
    # strictly stronger claim on a window slot than any fresh row), then
    # the stalest fresh spec rows
    avail_spec = [n for n in overflow_due if is_spec(n)] + [
        n for n in fresh_names if is_spec(n)
    ]
    n_slack = min(need, slack, len(avail_spec))
    window = set(due_names[:budget])
    defer_ok = [n for n in deferrable if n in window and not is_spec(n)]
    n_defer = min(need - n_slack, len(defer_ok), len(avail_spec) - n_slack)
    deferred = defer_ok[:n_defer]
    promoted = avail_spec[: n_slack + n_defer]
    dset = set(deferred)
    pset = set(promoted)
    window_due = [n for n in due_names[:budget] if n not in dset]
    order = (
        window_due
        + promoted
        + deferred
        + [n for n in overflow_due if n not in pset]
        + [n for n in fresh_names if n not in pset]
    )
    return order, promoted, deferred


def correctness_history(repo_root: str) -> tuple[dict[str, dict[int, str]], int]:
    """Per-query driver-row history: name -> {round: 'green'|'fail'}.

    A row is green when the driver's full hash check passed OR the query is
    a sanctioned rows-only entry (``err == 'no_oracle'``) — either way the
    driver looked at it that round.
    """
    hist: dict[str, dict[int, str]] = {}
    rounds: list[int] = []
    for p in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(p) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(data, dict):
            continue
        rounds.append(rnd)
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            ok = bool(row.get("hash_match")) or row.get("err") == "no_oracle"
            hist.setdefault(name, {})[rnd] = "green" if ok else "fail"
    return hist, (max(rounds) if rounds else 0)


def module_file(fn) -> str | None:
    """Absolute path of the module file that defines *fn* (None if unknown)."""
    mod = sys.modules.get(getattr(fn, "__module__", ""))
    f = getattr(mod, "__file__", None)
    return os.path.abspath(f) if f else None


def file_md5(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.md5(f.read()).hexdigest()


def is_due(history: dict[int, str], current_round: int, mod_changed: bool) -> bool:
    """Apply the due rules to one query's driver-row history."""
    rows = sorted(history)
    if not rows:
        return True  # never had a driver row
    if history[rows[-1]] == "fail":
        return True
    if len(rows) < 2 or history[rows[-2]] != "green":
        return True  # hasn't earned rotation: needs 2 consecutive greens
    if current_round - rows[-1] > max_row_age_for(history):
        return True  # staleness bound (tiered by earned stability)
    return mod_changed


def deferrable_for_floor(
    due: list[tuple[int, str]],
    hist: dict[str, dict[int, str]],
    current_round: int,
) -> list[str]:
    """Due rows the spec floor may defer one round, best-first.

    Eligible: non-spec, tenured (last TENURE_ROWS driver rows green — which
    implies the row is due via staleness or the direct-module rule, never a
    failure), and young enough that a one-round deferral still lands within
    the tenured staleness bound (age after deferral ≤ MAX_ROW_AGE_TENURED).
    Ordered newest-last-row first (longest remaining slack), name tiebreak
    for determinism. A deferred row does NOT re-enter the due set on its
    own next round (the module-changed trigger is consumed when the next
    round's diff base advances past the change — the r15 review finding),
    so :func:`compute_plan` CARRIES the deferred names forward explicitly:
    they are forced due in the next round's plan, where their old last-row
    puts them at the front of the due order and at the tail of the
    newest-first deferral eligibility — re-deferral is last-resort and the
    staleness cutoff above hard-stops it.
    """
    out: list[tuple[int, str]] = []
    for last, name in due:
        if is_spec(name):
            continue
        h = hist.get(name, {})
        if max_row_age_for(h) != MAX_ROW_AGE_TENURED:
            continue
        if (current_round + 1) - last > MAX_ROW_AGE_TENURED:
            continue  # deferral would breach the earned staleness bound
        out.append((last, name))
    out.sort(key=lambda t: (-t[0], t[1]))
    return [n for _, n in out]


def max_row_age_for(history: dict[int, str]) -> int:
    """The staleness bound this query has EARNED: tenured rows (last
    TENURE_ROWS driver rows all green) rotate on the slower cadence —
    derived from history alone, never a hand-maintained list."""
    rows = sorted(history)
    if len(rows) >= TENURE_ROWS and all(
        history[r] == "green" for r in rows[-TENURE_ROWS:]
    ):
        return MAX_ROW_AGE_TENURED
    return MAX_ROW_AGE


def compute_plan(
    queries: dict, repo_root: str, changed_files: set[str]
) -> dict:
    """Derive the full registration order + evidence for the coming round."""
    hist, last_round = correctness_history(repo_root)
    current_round = last_round + 1
    # CARRIED DUE (r15 review): a row the PREVIOUS round's floor deferred
    # never got its driver row, and its module-changed trigger is consumed
    # once the diff base advances past the change — so the plan itself
    # carries the debt. A prior plan from an EARLIER round contributes its
    # deferred list; a prior plan from THIS round (within-round
    # regenerations) re-contributes the carry it already recorded, so the
    # debt survives every per-commit regeneration until the driver pays it.
    prior = load_plan()
    carry: set[str] = set()
    if prior:
        if prior.get("round") == current_round:
            carry = set(prior.get("carried_due", []))
        elif prior.get("round", 0) < current_round:
            carry = set(prior.get("deferred_for_floor", []))
    carry &= set(queries)
    # repo-relative paths (git diff --name-only output) resolve against
    # repo_root, NOT the caller's CWD — abspath alone silently disabled
    # the changed-module rule when run from a subdirectory
    changed_abs = {
        os.path.abspath(c if os.path.isabs(c) else os.path.join(repo_root, c))
        for c in changed_files
    }
    due: list[tuple[int, str]] = []
    fresh: list[tuple[int, str]] = []
    module_of: dict[str, str] = {}
    module_hash: dict[str, str] = {}
    for name, fn in queries.items():
        mf = module_file(fn)
        rel = os.path.relpath(mf, repo_root) if mf else None
        module_of[name] = rel
        if mf and rel not in module_hash:
            module_hash[rel] = file_md5(mf)
        h = hist.get(name, {})
        last_row = max(h) if h else 0
        if name in carry or is_due(
            h, current_round, mf in changed_abs if mf else True
        ):
            due.append((last_row, name))
        else:
            fresh.append((last_row, name))
    due.sort()
    fresh.sort()
    deferrable = deferrable_for_floor(due, hist, current_round)
    order, promoted, deferred = _apply_spec_floor(
        [n for _, n in due], [n for _, n in fresh], DRIVER_BUDGET, deferrable
    )
    return {
        "round": current_round,
        "budget": DRIVER_BUDGET,
        "max_row_age": MAX_ROW_AGE,
        "max_row_age_tenured": MAX_ROW_AGE_TENURED,
        "tenure_rows": TENURE_ROWS,
        "spec_floor": SPEC_FLOOR,
        "promoted_spec": promoted,
        "deferred_for_floor": deferred,
        "deferrable": deferrable,
        "carried_due": sorted(carry),
        "due": [n for _, n in due],
        "fresh": [n for _, n in fresh],
        "order": order,
        "module_of": module_of,
        "module_hash": module_hash,
    }


def simulate_max_gap(
    hist: dict[str, dict[int, str]],
    names: list[str],
    start_round: int,
    horizon: int,
    budget: int = DRIVER_BUDGET,
    track: set[str] | None = None,
) -> int:
    """Worst inter-row gap any query sees under the current policy.

    Replays the plan derivation forward ``horizon`` rounds from the real
    committed history, assuming every driver row comes back green and no
    module changes (the steady state the cadence question is about): each
    simulated round derives the order exactly like :func:`compute_plan`
    (due first, oldest-last-row first, name tiebreak) and grants the first
    ``budget`` queries a green row. Returns the maximum number of rounds
    any query waits between consecutive driver rows, counting the wait
    from its last REAL row into the simulation — the rotation-cadence
    number the r9 verdict asked to bound (next-round item #6). *track*
    restricts the measurement to a subset (e.g. the spec surface) while
    the whole registry still competes for the budget.
    """
    sim = {n: dict(hist.get(n, {})) for n in names}
    carried: set[str] = set()
    for rnd in range(start_round, start_round + horizon):
        due: list[tuple[int, str]] = []
        fresh: list[tuple[int, str]] = []
        for n in names:
            h = sim[n]
            last = max(h) if h else 0
            # carried rows are forced due, mirroring compute_plan's
            # deferral-debt carry (r15 review)
            (due if n in carried or is_due(h, rnd, False) else fresh).append(
                (last, n)
            )
        due.sort()
        fresh.sort()
        deferrable = deferrable_for_floor(due, sim, rnd)
        order, _, deferred = _apply_spec_floor(
            [n for _, n in due], [n for _, n in fresh], budget, deferrable
        )
        carried = set(deferred)
        for n in order[:budget]:
            sim[n][rnd] = "green"
    max_gap = 0
    end_round = start_round + horizon - 1
    for n in names if track is None else [n for n in names if n in track]:
        rows = sorted(sim[n])
        for prev, cur in zip(rows, rows[1:]):
            # only gaps that END inside the simulated window count — a
            # historic gap is already adjudicated by past verdicts
            if cur >= start_round:
                max_gap = max(max_gap, cur - prev)
        # open tail gap: a query last served early in the window (or never)
        # and not served again would otherwise be invisible to the bound.
        # Clamped to the simulated window (consistent with the pair-gap
        # rule above): a last REAL row predating start_round is history
        # already adjudicated by past verdicts, not a simulated wait.
        if rows:
            max_gap = max(max_gap, end_round - max(rows[-1], start_round - 1))
        else:
            max_gap = max(max_gap, horizon)
    return max_gap


def load_plan() -> dict | None:
    if not os.path.exists(PLAN_PATH):
        return None
    try:
        with open(PLAN_PATH) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
