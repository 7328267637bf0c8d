"""Unit tests for schema compatibility/intersection (SURVEY §1.4, FIXTURES §B)."""

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from parquet_merger_spark.plans.schema import (
    check_schema_mismatch,
    find_common_columns,
    schemas_compatible,
)


def s(*fields):
    return StructType([StructField(n, t, nullable) for n, t, nullable in fields])


BASE = s(("key", LongType(), True), ("name", StringType(), True), ("val", DoubleType(), True))


def test_identical_schemas_compatible():
    assert schemas_compatible(BASE, BASE)


def test_nullability_ignored():
    other = s(("key", LongType(), False), ("name", StringType(), False), ("val", DoubleType(), True))
    assert schemas_compatible(BASE, other)


def test_order_matters():
    reordered = s(("name", StringType(), True), ("key", LongType(), True), ("val", DoubleType(), True))
    assert not schemas_compatible(BASE, reordered)


def test_type_exactness_no_widening():
    narrower = s(("key", IntegerType(), True), ("name", StringType(), True), ("val", DoubleType(), True))
    assert not schemas_compatible(BASE, narrower)


def test_extra_column_incompatible():
    wider = s(*[(f.name, f.dataType, True) for f in BASE.fields], ("extra", StringType(), True))
    assert not schemas_compatible(BASE, wider)


def test_common_columns_order_follows_first_schema():
    second = s(("val", DoubleType(), True), ("key", LongType(), True), ("name", StringType(), True))
    assert find_common_columns([BASE, second]) == ["key", "name", "val"]


def test_common_columns_drops_type_conflicts():
    conflicted = s(("key", IntegerType(), True), ("name", StringType(), True), ("val", DoubleType(), True))
    assert find_common_columns([BASE, conflicted]) == ["name", "val"]


def test_common_columns_intersection_not_union():
    subset = s(("key", LongType(), True), ("name", StringType(), True))
    assert find_common_columns([BASE, subset]) == ["key", "name"]
    assert find_common_columns([subset, BASE]) == ["key", "name"]


def test_common_columns_empty_intersection():
    disjoint = s(("other", StringType(), True))
    assert find_common_columns([BASE, disjoint]) == []


def test_mismatch_detection():
    assert not check_schema_mismatch([BASE])
    assert not check_schema_mismatch([BASE, BASE])
    assert check_schema_mismatch([BASE, None])
    assert check_schema_mismatch([None])
    reordered = s(("name", StringType(), True), ("key", LongType(), True), ("val", DoubleType(), True))
    assert check_schema_mismatch([BASE, reordered])


def test_common_columns_property_random_schemas():
    """Property: result ⊆ first schema, order-preserving, type-exact."""
    import random

    rng = random.Random(42)
    types = [LongType(), IntegerType(), StringType(), DoubleType()]
    for _ in range(50):
        pool = [f"c{i}" for i in range(8)]
        schemas = []
        for _ in range(rng.randint(1, 4)):
            cols = rng.sample(pool, rng.randint(1, 8))
            schemas.append(s(*[(c, rng.choice(types), True) for c in cols]))
        common = find_common_columns(schemas)
        first_names = [f.name for f in schemas[0].fields]
        assert [c for c in first_names if c in common] == common
        first_types = {f.name: f.dataType for f in schemas[0].fields}
        for c in common:
            for other in schemas[1:]:
                ts = {f.name: f.dataType for f in other.fields}
                assert ts[c] == first_types[c]
