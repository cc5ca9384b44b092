"""bench.py's regression adjudication path: the shared regression rule
(boot-normalized 25% + noise floor) and the committed-baseline policy
(isolated min carries forward so a cleared flag cannot re-flag next
round off its own inflated in-run sample)."""

from __future__ import annotations

from bench import commit_baseline, regressed


def test_regression_rule():
    # no prior -> never regressed
    assert not regressed(5.0, None, 0.15, 1.0)
    assert not regressed(5.0, 0.0, 0.15, 1.0)
    # clear regression: 1.0 -> 2.0, beyond 25% and noise
    assert regressed(2.0, 1.0, 0.15, 1.0)
    # within the 25% band
    assert not regressed(1.2, 1.0, 0.15, 1.0)
    # beyond 25% but inside the noise floor (tiny absolute delta)
    assert not regressed(0.05, 0.02, 0.15, 1.0)
    # boot factor normalizes a slow host out of the comparison
    assert not regressed(2.0, 1.0, 0.15, 2.1)
    assert regressed(4.0, 1.0, 0.15, 2.0)
    # FAST boots clamp to raw comparison: a flat raw time is never a
    # regression just because the sentinels sped up...
    assert not regressed(1.0, 1.0, 0.15, 0.7)
    # ...but raw growth on a fast boot still flags
    assert regressed(1.6, 1.0, 0.15, 0.7)
    # measured spread wider than the delta -> noise, not regression
    assert not regressed(2.0, 1.0, 1.5, 1.0)


def test_commit_baseline_carries_isolated_min_forward():
    timings = {"a": 2.0, "b": 1.0, "c": 3.0}
    isolated = {"a": 1.1, "c": 3.4}  # a cleared in isolation; c did not improve
    out = commit_baseline(timings, isolated)
    # cleared flag: the isolated (reproducible) min is committed
    assert out["a"] == 1.1
    # isolation never WORSENS the committed baseline
    assert out["c"] == 3.0
    # un-flagged queries keep their in-run time
    assert out["b"] == 1.0
    # inputs are not mutated
    assert timings["a"] == 2.0


def test_tail_rotation_covers_everything_deterministically():
    from bench import TAIL_PER_ROUND, tail_rotation

    names = [f"q{i:03d}" for i in range(137)]
    benched = {f"q{i:03d}" for i in range(0, 137, 5)}  # 28 "headline" names
    tail = sorted(set(names) - benched)

    # deterministic: same inputs -> same sample
    assert tail_rotation(names, benched, 3) == tail_rotation(names, benched, 3)
    # never samples a headline/baseline query, always <= k names
    for r in range(1, 10):
        s = tail_rotation(names, benched, r)
        assert not set(s) & benched
        assert len(s) == min(TAIL_PER_ROUND, len(tail))
    # full coverage within ceil(|tail|/k) consecutive rounds
    import math

    need = math.ceil(len(tail) / TAIL_PER_ROUND)
    covered = set()
    for r in range(1, need + 1):
        covered |= set(tail_rotation(names, benched, r))
    assert covered == set(tail)
    # a tail smaller than k is fully sampled every round
    assert tail_rotation(["a", "b"], [], 7) == ["a", "b"]
    # empty tail is fine
    assert tail_rotation(list(benched), benched, 1) == []
