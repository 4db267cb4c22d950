"""bench.slope_estimate — the chain-slope estimator's failure modes.

Both regressions below were observed live on the tunneled TPU in round 2:
a negative-slope round slipping through a tiny absolute floor (reported
2e16 voxel-updates/s), and a deflated-difference round winning the
min-of-slopes (a 0.56 ms "step" on a ~40 ms binary)."""

from bench import slope_estimate

K_LO, K_HI = 2, 12


def est(samples):
    return slope_estimate(samples, K_LO, K_HI)


def test_clean_rounds_recover_the_true_slope():
    # overhead 0.6 s, true step 40 ms, no noise
    s = [(0.6 + K_LO * 0.04, 0.6 + K_HI * 0.04)] * 3
    assert abs(est(s) - 0.04) < 1e-9


def test_one_sided_noise_is_rejected_by_the_min():
    base = (0.6 + K_LO * 0.04, 0.6 + K_HI * 0.04)
    noisy = [(base[0] + 1.7, base[1] + 0.3), (base[0] + 0.2, base[1] + 2.4), base]
    assert abs(est(noisy) - 0.04) < 1e-9


def test_deflated_difference_round_cannot_win():
    """A round whose t_lo was inflated by congestion yields a tiny (or
    negative) slope; it must not become the reported value."""
    good = (0.6 + K_LO * 0.04, 0.6 + K_HI * 0.04)
    garbage = (good[1] - 0.005, good[1])  # slope 0.5 ms/step
    inverted = (good[1] + 0.3, good[1])  # negative slope
    assert abs(est([good, garbage, inverted]) - 0.04) < 1e-9


def test_all_rounds_failing_yields_whole_chain_upper_bound():
    # every round congested into near-equal lo/hi timings
    t = 2.0
    s = [(t - 0.001, t), (t, t + 0.002)]
    got = est(s)
    assert abs(got - (t / K_HI)) < 1e-9  # safe upper bound, not garbage


def test_quiet_round_may_improve_on_a_mixed_anchor():
    # anchor built from mins of unequal windows overestimates; a coherent
    # quiet round inside the credibility band wins
    quiet = (0.5 + K_LO * 0.04, 0.5 + K_HI * 0.04)  # slope 0.040
    mixed = (0.5 + K_LO * 0.04 - 0.1, 2.0)  # deflates t_lo_min
    got = est([quiet, mixed])
    assert abs(got - 0.04) < 1e-9


# ---------------------------------------------------------------------------
# QUIET_REF.json — the artifact-derived congestion reference (VERDICT r3
# weak 6: a hand-edited constant turns genuine regressions into "congested
# window" and burns the wall budget instead of reporting them).
# ---------------------------------------------------------------------------

from bench import QUIET_STEP_FALLBACK_S, load_quiet_ref, update_quiet_ref


def test_quiet_ref_missing_file_falls_back(tmp_path):
    p = str(tmp_path / "QUIET_REF.json")
    assert load_quiet_ref((64, 256), p) == QUIET_STEP_FALLBACK_S


def test_quiet_ref_roundtrip_and_monotone(tmp_path):
    p = str(tmp_path / "QUIET_REF.json")
    assert update_quiet_ref(0.012, (64, 256), p)
    assert load_quiet_ref((64, 256), p) == 0.012
    # a slower later run must NOT raise the recorded best
    assert not update_quiet_ref(0.02, (64, 256), p)
    assert load_quiet_ref((64, 256), p) == 0.012
    # a faster one lowers it
    assert update_quiet_ref(0.009, (64, 256), p)
    assert load_quiet_ref((64, 256), p) == 0.009


def test_quiet_ref_is_per_domain(tmp_path):
    """A fallback-domain run neither uses nor poisons the main reference."""
    p = str(tmp_path / "QUIET_REF.json")
    update_quiet_ref(0.012, (64, 256), p)
    assert load_quiet_ref((32, 128), p) == QUIET_STEP_FALLBACK_S


def test_quiet_ref_rejects_garbage(tmp_path):
    p = str(tmp_path / "QUIET_REF.json")
    assert not update_quiet_ref(0.0, (64, 256), p)  # measurement failure
    assert not update_quiet_ref(99.0, (64, 256), p)
    with open(p, "w") as f:
        f.write("not json")
    assert load_quiet_ref((64, 256), p) == QUIET_STEP_FALLBACK_S


def test_regression_is_reported_not_masked(tmp_path):
    """The detector condition derives from the artifact: with a recorded
    12 ms best, a genuine 2x regression (24 ms quiet measurement) is NOT
    below 1.3x the reference — the run samples to its wall budget and then
    REPORTS 24 ms (with congested=true in the JSON), rather than treating
    a hand-raised constant as the new normal."""
    p = str(tmp_path / "QUIET_REF.json")
    update_quiet_ref(0.012, (64, 256), p)
    ref = load_quiet_ref((64, 256), p)
    assert not (0.024 < 1.3 * ref)  # detector keeps sampling
    assert not update_quiet_ref(0.024, (64, 256), p)  # and never adopts it
