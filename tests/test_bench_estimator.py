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
