"""Unit tests for naming functions F1-F5 (SURVEY §2.8)."""

from parquet_merger_spark.functions.naming import (
    find_common_prefix,
    find_common_substring,
    find_common_suffix,
    generate_batch_name,
    sanitize_filename,
)


def test_common_prefix():
    assert find_common_prefix(["part_001", "part_002", "part_100"]) == "part_"
    assert find_common_prefix(["abc"]) == "abc"
    assert find_common_prefix(["abc", "xyz"]) == ""
    assert find_common_prefix([]) == ""


def test_common_suffix():
    assert find_common_suffix(["daily_2024", "weekly_2024"]) == "ly_2024"
    assert find_common_suffix(["a_x", "b_x"]) == "_x"
    assert find_common_suffix(["abc", "xyz"]) == ""


def test_common_substring():
    assert find_common_substring(["xx_data_01", "yy_data_02"]) == "_data_0"
    assert find_common_substring(["ab", "ab"]) is None  # length < 3
    assert find_common_substring(["123456", "345"]) is None  # <2 alphabetic
    assert find_common_substring(["abcdef", "zzz"]) is None


def test_batch_name_single():
    assert generate_batch_name(["only_file"], 7) == "only_file"


def test_batch_name_prefix_trimming():
    assert generate_batch_name(["part_001", "part_002"], 0) == "part"
    assert generate_batch_name(["sales-2024-01", "sales-2024-02"], 0) == "sales"


def test_batch_name_suffix_fallback():
    # No usable prefix; common suffix "_daily" leading-trimmed.
    assert generate_batch_name(["a_report_daily", "b_report_daily"], 0) == "report_daily"


def test_batch_name_substring_fallback():
    # substring path returns the match untrimmed (reference keeps '_core_')
    assert generate_batch_name(["1_core_9", "2_core_8", "3_core_7"], 0) == "_core_"


def test_batch_name_final_fallback():
    assert generate_batch_name(["aa", "bb"], 3) == "batch_3"


def test_sanitize_filename():
    assert sanitize_filename("my file (1).parquet") == "my_file__1_.parquet"
    assert sanitize_filename("ok_name-1.2") == "ok_name-1.2"
    assert sanitize_filename("naïve☃") == "naïve_"  # unicode alnum kept


def test_sanitize_filename_col(spark):
    from parquet_merger_spark.functions.strings import sanitize_filename_col

    names = ["my file (1).parquet", "ok_name-1.2", "a/b:c"]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = [r[0] for r in df.select(sanitize_filename_col("name")).collect()]
    assert got == [sanitize_filename(n) for n in names]
