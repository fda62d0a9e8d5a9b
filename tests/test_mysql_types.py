"""Port of the reference's only executable contract:
``src/test/scala/com/booking/sql/DataTypeParserSpec.scala:7-57`` — same
inputs, same expected parses — plus the mapping table ``Schema.scala:71-85``.
Pure-Python tests; no SparkSession needed.
"""

import pytest

from pyspark.sql.types import (
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    TimestampType,
)

from hbase_snapshotter_spark.functions import (
    MySQLDataType,
    mysql_to_spark_type,
    parse_mysql_type,
)


def test_returns_a_type():
    assert isinstance(parse_mysql_type("INT"), MySQLDataType)


def test_typename():
    assert parse_mysql_type("INT").typename == "INT"


ENUM9 = (
    "enum('ok','cancelled_by_hotel','cancelled_by_guest','fraudulent',"
    "'test','no_show','unknown','overbooking','cancelled_by_booking')"
)


def test_enum_typename():
    assert parse_mysql_type(ENUM9).typename == "ENUM"


def test_enum_values():
    assert parse_mysql_type(ENUM9).enumeration == [
        "ok", "cancelled_by_hotel", "cancelled_by_guest", "fraudulent",
        "test", "no_show", "unknown", "overbooking", "cancelled_by_booking",
    ]


def test_set_typename():
    assert parse_mysql_type("set('one', '', 'two')").typename == "SET"


def test_set_values_including_empty_string():
    assert parse_mysql_type("set('one', '', 'two')").enumeration == ["one", "", "two"]


def test_precision():
    assert parse_mysql_type("DOUBLE(10)").precision == (10, None)


def test_precision_and_scale():
    assert parse_mysql_type("DOUBLE(10, 2)").precision == (10, 2)


def test_unsigned_qualifier():
    t = parse_mysql_type("int(10) unsigned")
    assert t.typename == "INT"
    assert t.precision == (10, None)
    assert t.qualifiers == ["UNSIGNED"]


def test_character_set_and_collate_attributes():
    t = parse_mysql_type('INTEGER CHARACTER SET "utf-8" COLLATE \'latin1_bin\'')
    assert t.attributes == {"CHARACTER SET": "utf-8", "COLLATE": "latin1_bin"}


# ---- mapping table (Schema.scala:71-85), compat mode ----

@pytest.mark.parametrize("ddl,expected", [
    ("TINYINT", IntegerType()),
    ("SMALLINT", IntegerType()),
    ("MEDIUMINT", IntegerType()),
    ("INT", IntegerType()),
    ("INTEGER", IntegerType()),
    ("int(10) unsigned", LongType()),          # unsigned promotion, Schema.scala:75
    ("BIGINT", DoubleType()),
    ("DECIMAL(10,2)", DoubleType()),
    ("NUMERIC", DoubleType()),
    ("FLOAT", DoubleType()),
    ("DOUBLE", DoubleType()),
    ("REAL", DoubleType()),
    ("TIMESTAMP", TimestampType()),
    ("DATE", StringType()),                    # deliberate gap, Schema.scala:79-80
    ("VARCHAR(255)", StringType()),
    ("TEXT", StringType()),
    ("JSON", StringType()),
    ("BIT", StringType()),
    (ENUM9, StringType()),
])
def test_compat_mapping(ddl, expected):
    assert mysql_to_spark_type(ddl) == expected


@pytest.mark.parametrize("ddl,expected", [
    ("DECIMAL(10,2)", DecimalType(10, 2)),
    ("BIGINT", LongType()),
    ("BIGINT UNSIGNED", DecimalType(20, 0)),
    ("FLOAT", FloatType()),
    ("DATE", DateType()),
    ("DATETIME", TimestampType()),
])
def test_strict_mapping(ddl, expected):
    assert mysql_to_spark_type(ddl, mode="strict") == expected


def test_case_insensitive_and_longest_match():
    assert parse_mysql_type("integer").typename == "INTEGER"
    assert parse_mysql_type("set('a')").typename == "SET"
    assert parse_mysql_type("smallint").typename == "SMALLINT"
