"""Keep module doctests honest: run them for the pure-Python helpers
whose examples document tuning math (no SparkSession involved).
"""

import doctest

import ecom_churn_lakehouse_spark.dedup.minhash as minhash_mod


def test_minhash_doctests():
    result = doctest.testmod(minhash_mod)
    assert result.failed == 0, f"{result.failed} doctest failures in dedup.minhash"
    assert result.attempted >= 2
