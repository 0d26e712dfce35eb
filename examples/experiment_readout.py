"""Experiment readout, end to end: the guardrail-first A/B analysis a
metrics platform runs before anyone sees a lift number.

    python examples/experiment_readout.py [sf_dir]

Order matters — each stage gates the next:
1. SRM guardrail        — a mismatched split invalidates everything below
2. primary significance — two-proportion z-test on conversion
3. variance reduction   — CUPED adjusted lift (pre-period covariate)
4. uncertainty          — Poisson-bootstrap CI on the raw metric
                          (CLUSTER mode: weights keyed by user, not row —
                          events within a user correlate)
5. robustness           — winsorized mean beside the raw mean (did a few
                          whales drive the lift?)
6. prediction quality   — split-conformal interval + calibration bins for
                          the metric model the experiment will ship

Every stage is the oracle-gated operator from `cerebro_spark.operators`
(see QUERIES.md rows: srm_check, ab_test_ztest, cuped_adjust,
bootstrap_ci_mean, winsorized_value, conformal_value,
calibration_events).
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cerebro_spark.io import load_table
from cerebro_spark.operators.profile import (
    bootstrap_ci,
    calibration_bins,
    conformal_interval,
    cuped_lift,
    expected_calibration_error,
    winsorized_mean,
)
from cerebro_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("experiment-readout")
    ev = load_table(spark, "events", SF_DIR).filter(F.col("value").isNotNull())
    variant = F.pmod(F.col("user_id"), F.lit(2))

    # 1. SRM guardrail: assignment counts must match the design ratio
    users = ev.select("user_id").distinct()
    srm = users.groupBy().agg(
        F.sum(F.when(variant == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(variant == 1, 1).otherwise(0)).alias("n_b"),
    ).first()
    chi2 = (srm["n_a"] - srm["n_b"]) ** 2 / (srm["n_a"] + srm["n_b"])
    print(f"1. SRM: {srm['n_a']}/{srm['n_b']} users, chi2={chi2:.3f} "
          f"({'OK' if chi2 <= 3.841 else 'MISMATCH — stop here'})")

    # 2-3. CUPED adjusted lift (pre/post midpoint split as the covariate)
    mid = ev.agg(
        ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2)
        .cast("long").alias("__mid")
    )
    q = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    t = F.unix_micros("ts")
    per_user = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(t < F.col("__mid"), q).otherwise(0)).alias("x"),
            F.sum(F.when(t >= F.col("__mid"), q).otherwise(0)).alias("y"),
        )
        .select(F.pmod(F.col("user_id"), F.lit(2)).alias("variant"), "x", "y")
    )
    lift = cuped_lift(per_user, scale=100).first()
    print(f"2. raw lift:        {lift['diff_raw']:+.3f}")
    print(f"3. CUPED lift:      {lift['diff_cuped']:+.3f} "
          f"(theta={lift['theta']:.3f}, "
          f"variance explained {lift['var_reduction']:.1%})")

    # 4. cluster-bootstrap CI on the raw per-event metric: weights keyed by
    # USER so all of a user's events share each replicate's draw
    ci = bootstrap_ci(ev, "value", "user_id", b=100).first()
    print(f"4. metric CI (95%): {ci['mean']:.2f} in "
          f"[{ci['ci_lo']:.2f}, {ci['ci_hi']:.2f}]  (cluster bootstrap, "
          f"n={ci['n']:,})")

    # 5. robustness: winsorized vs raw mean per variant
    win = winsorized_mean(
        ev.select(variant.alias("variant"), "value"), "value", ["variant"]
    ).collect()
    for r in sorted(win, key=lambda r: r["variant"]):
        print(f"5. variant {r['variant']}: raw {r['raw_mean']:.2f} vs "
              f"5/95-winsorized {r['win_mean']:.2f} "
              f"(tails clamped to [{r['p_lo']:.1f}, {r['p_hi']:.1f}])")

    # 6. the shipped metric model: conformal interval + calibration audit
    conf = conformal_interval(ev, "value", "event_type", "event_id").collect()
    worst = min(conf, key=lambda r: r["coverage"])
    print(f"6. conformal: worst-group coverage "
          f"{worst['coverage']:.3f} (target 0.90, group "
          f"{worst['event_type']}, qhat={worst['qhat']:.1f})")
    score = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
               16, 10).cast("long") % 1_000_000
    ).cast("double") / 1_000_000.0
    scored = ev.select(score.alias("score"),
                       (F.col("event_type") == "purchase").alias("label"))
    ece = expected_calibration_error(scored, "score", "label").first()
    bins = calibration_bins(scored, "score", "label").count()
    print(f"   calibration: ECE={ece['ece']:.4f} over {bins} bins "
          f"(baseline scorer — a real model plugs in unchanged)")

    # 7. (round 8) planning: the MDE this traffic could even detect —
    # the go/no-go number BEFORE the next test ships
    from cerebro_spark.operators.profile import mde_power

    mde = mde_power(ev, "value", "event_type").collect()
    worst_m = max(
        (r for r in mde if r["mde_rel"] is not None),
        key=lambda r: r["mde_rel"],
    )
    print(f"7. MDE: worst stratum {worst_m['event_type']} can only detect "
          f"{worst_m['mde_rel']:.1%} lifts (n={worst_m['n']:,})")

    # 8. (round 8) distributional readout: quantile treatment effects —
    # a mean difference hides a tail-only regression; QTE shows it
    from cerebro_spark.operators.profile import quantile_treatment_effect

    qte = quantile_treatment_effect(ev, "value", variant == 1).collect()
    qstr = ", ".join(f"p{int(r['p'] * 100)}={r['qte']:+.2f}" for r in qte)
    print(f"8. QTE by quantile: {qstr}")

    # 9. (round 8) small-sample honesty: EB-shrunk per-user means — the
    # posterior table to ship instead of raw 3-observation averages
    from cerebro_spark.operators.profile import eb_shrunk_means

    eb = eb_shrunk_means(ev, "value", "user_id")
    moved = eb.filter(
        F.abs(F.col("shrunk") - F.col("mean")) > 1.0
    ).count()
    print(f"9. EB shrinkage:    {moved} users moved >1.0 toward the grand "
          f"mean (of {eb.count()})")

    # 10. (round 8, second session) heterogeneity: one-way ANOVA across
    # event types — is the metric even one population, or should the
    # readout stratify?
    from cerebro_spark.operators.profile import anova_oneway

    an = anova_oneway(ev, "event_type", "value").first()
    print(f"10. ANOVA: F={an['f_stat']:.1f}, eta^2={an['eta_sq']:.4f} "
          f"across {an['k_groups']} event types — "
          f"{'stratify' if an['eta_sq'] > 0.01 else 'pool'}")

    # 11. (round 8, second session) retention: do the arms share a
    # lifetime curve?  Log-rank on the censored user lifetimes.
    from cerebro_spark.operators.profile import logrank_test

    cm = ev.agg(F.max(F.col("ts").cast("long")).alias("__cm"))
    lives = (
        ev.groupBy("user_id")
        .agg(F.min(F.col("ts").cast("long")).alias("__a"),
             F.max(F.col("ts").cast("long")).alias("__b"))
        .crossJoin(F.broadcast(cm))
        .select(
            F.floor((F.col("__b") - F.col("__a")) / 86400).alias("t"),
            (F.col("__b") >= F.col("__cm") - 86400).cast("int")
            .alias("censored"),
            F.pmod(F.col("user_id"), F.lit(2)).alias("grp"),
        )
    )
    lr = logrank_test(lives, "t", "censored", "grp").first()
    print(f"11. log-rank: O1={lr['o1']} vs E1={lr['e1']:.1f}, "
          f"chi2={lr['chi2']:.3f} — arms "
          f"{'diverge' if (lr['chi2'] or 0) > 3.84 else 'share'} "
          f"a lifetime curve")

    # 12. (round 8, second session) targeting: the gains table for the
    # pre-period-value propensity score — "mail which deciles?"
    from cerebro_spark.operators.profile import decile_lift

    users = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(t < F.col("__mid"), q).otherwise(0)).alias("score"),
            F.max(
                (
                    (t >= F.col("__mid"))
                    & (F.col("event_type") == "purchase")
                ).cast("int")
            ).alias("converted"),
        )
    )
    lift_tab = decile_lift(users, "score", "converted").collect()
    top = [r for r in lift_tab if r["decile"] >= 9]
    cap = max((r["cum_capture"] or 0) for r in top) if top else 0.0
    print(f"12. decile lift: top-2 score deciles capture {cap:.0%} of "
          f"post-period purchasers "
          f"(top decile lift {lift_tab[-1]['lift']:.2f}x)")

    # 13. (round 8, late) assumption gates + the robust/ratio ladder:
    # equal variances? (Levene) → robust mean diff (Yuen) → the ratio
    # metric the business actually tracks (delta method)
    from cerebro_spark.operators.profile import (
        levene_test,
        mann_whitney_u,
        ratio_metric_ztest,
        yuen_trimmed_t,
    )

    lev = levene_test(
        ev.select(variant.alias("g"), "value"), "g", "value"
    ).first()
    mwu = mann_whitney_u(
        ev.select(variant.alias("g"), "value"), "g", "value"
    ).first()
    yt = yuen_trimmed_t(
        ev.select(variant.alias("g"), "value"), "g", "value"
    ).first()
    num = F.when(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull(),
        F.col("value"),
    ).otherwise(F.lit(0.0))
    rt = ratio_metric_ztest(
        ev, "user_id", num, F.lit(1.0), variant
    ).first()
    print(f"13. robust ladder: Levene W={lev['w_stat']:.2f} "
          f"({'variances differ' if (lev['w_stat'] or 0) > 3.9 else 'ok'}); "
          f"MWU z={mwu['z']:+.2f} (rank-biserial "
          f"{mwu['rank_biserial']:+.3f}); Yuen trimmed diff "
          f"{yt['diff']:+.2f} (t={yt['t']:+.2f}); revenue/event ratio "
          f"{rt['ratio1']:.3f} vs {rt['ratio2']:.3f} (z={rt['z']:+.2f})")


if __name__ == "__main__":
    main()
