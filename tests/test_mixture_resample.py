"""Temperature resampling: oracle match plus the rebalancing property —
the dominant group is downsampled, minority groups are kept whole, and
the realized kept counts track the quantized rates."""

from __future__ import annotations

from parallel_map_reduce_word_counter_for_one_machine_spark import registry

from .oracle import assert_matches_oracle

registry.load_all()


def test_oracle_match(spark, sf_correct):
    assert_matches_oracle(
        spark,
        sf_correct,
        "mixture_temperature_resample",
        registry.QUERIES["mixture_temperature_resample"],
        registry.ORACLES["mixture_temperature_resample"],
    )


def test_flattens_toward_uniform(spark, sf_correct):
    rows = {
        r.lang: r
        for r in registry.QUERIES["mixture_temperature_resample"](
            spark, sf_correct
        ).collect()
    }
    dominant = max(rows.values(), key=lambda r: r.n_tokens)
    minority = min(rows.values(), key=lambda r: r.n_tokens)
    # The largest group is genuinely downsampled; the smallest is capped
    # at rate 1 (kept whole — upsampling is the loader's repeat factor).
    assert dominant.rate_e6 < 1_000_000 and dominant.thresh < 256
    assert minority.rate_e6 == 1_000_000 and minority.thresh == 256
    assert minority.n_kept == minority.n_docs
    assert dominant.n_kept < dominant.n_docs
    # Realized keep fraction tracks the 1/256-quantized rate (binomial
    # tolerance wide enough to be deterministic-corpus-safe).
    frac = dominant.n_kept / dominant.n_docs
    assert abs(frac - dominant.thresh / 256) < 0.12
