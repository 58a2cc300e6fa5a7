"""CI-sized slice of tools/fuzz_parity.py: one seed, the queries whose
semantics are most data-dependent (division/rounding at sign
boundaries, overflow, tokenization of degenerate text, tie-breaking).
The full 86-query fuzz across several seeds runs via
`python tools/fuzz_parity.py`.
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools"),
)

# the hazard-sensitive subset: negative-epoch windows, >2^31 json,
# sign-boundary bins, degenerate-text tokenization, duplicate groups,
# quantile/tercile ties, LWW ordering
FUZZ_SUBSET = [
    "rate_anomalies",
    "json_props_agg",
    "hist_quantiles",
    "length_quantiles",
    "perplexity_buckets",
    "quality_classifier",
    "bloom_membership",
    "dedup_exact",
    "bpe_merge_pairs",
    "text_token_counts",
    "mtail_gauge_lww",
    "tumbling_window_counts",
    # round-8 hazard classes: the planted co-occurring pre-1970
    # cross-user pair (stream watermark epoch-0 artifact), negative-
    # epoch window/cohort/island arithmetic, duplicate-(user, ts)
    # ordering ties in the lag/asof/island operators
    "band_join_counts",
    "band_join_stream",
    "asof_join_last_touch",
    "state_intervals",
    "cusum_changepoints",
    "sliding_window_counts",
]


def test_fuzz_subset_seed_42(spark):
    import check_parity
    import fuzz_parity

    outdir = os.path.join(
        tempfile.gettempdir(), f"fuzz_sf_{os.getuid()}_pytest42"
    )
    shutil.rmtree(outdir, ignore_errors=True)
    fuzz_parity.gen_tables(42, outdir)
    n_pass, n_fail, n_weak = check_parity.run(
        outdir, only=FUZZ_SUBSET, spark=spark, label="fuzz42:"
    )
    assert (n_pass, n_fail) == (len(FUZZ_SUBSET), 0)
