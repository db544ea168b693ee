"""Bloom-prefiltered semi-join (J13): soundness (no false negatives)
and selectivity (discards ~all non-matching rows before the join)."""

from __future__ import annotations
def test_bloom_prefilter_is_selective_and_sound(spark, sf_dir):
    """The bloom pass must keep every true match (no false negatives —
    guaranteed by construction, verified anyway) and discard most
    non-matching rows (the point of the runtime filter)."""
    from chess_pos_db_spark.operators import joins as J
    from chess_pos_db_spark.tables import t as load
    import pyspark.sql.functions as F

    li = load(spark, sf_dir, "lineitem")
    hi = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > J._BLOOM_BUILD_MIN_PRICE
    )
    m_bits = J._bloom_bits_for(hi.count())
    words = J.bloom_build_words(hi, "o_orderkey", m_bits)
    kept = li.filter(F.expr(J.bloom_might_contain("l_orderkey", words, m_bits)))
    true_matches = li.join(
        hi, li.l_orderkey == hi.o_orderkey, "left_semi"
    ).count()
    exact_after = kept.join(
        hi, kept.l_orderkey == hi.o_orderkey, "left_semi"
    ).count()
    assert exact_after == true_matches  # no false negatives
    total, kept_n = li.count(), kept.count()
    nonmatch = total - true_matches
    fp = kept_n - true_matches
    # discard >= 90% of non-matching rows
    assert fp <= 0.1 * nonmatch, (fp, nonmatch)
