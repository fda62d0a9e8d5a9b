"""Property-based tests (hypothesis) for the MySQL DDL type parser —
round-trip and total-function properties beyond the ported spec cases."""

from hypothesis import given, settings, strategies as st

from pyspark.sql.types import DataType

from hbase_snapshotter_spark.functions.mysql_types import (
    TYPENAMES,
    MySQLTypeParseError,
    mysql_to_spark_type,
    parse_mysql_type,
)

typenames = st.sampled_from([t for t in TYPENAMES if t not in ("ENUM", "SET")])
enum_values = st.lists(
    st.text(alphabet=st.characters(blacklist_characters="'\"", min_codepoint=32,
                                   max_codepoint=126), max_size=12),
    min_size=1, max_size=6,
)


@st.composite
def ddl_strings(draw):
    name = draw(typenames)
    s = name if draw(st.booleans()) else name.lower()
    if draw(st.booleans()):
        p = draw(st.integers(0, 65))
        if draw(st.booleans()):
            s += f"({p}, {draw(st.integers(0, 30))})"
        else:
            s += f"({p})"
    for q in ("UNSIGNED", "ZEROFILL"):
        if draw(st.booleans()):
            s += f" {q.lower() if draw(st.booleans()) else q}"
    return name, s


@given(ddl_strings())
@settings(max_examples=200, deadline=None)
def test_parse_any_generated_ddl(case):
    name, ddl = case
    t = parse_mysql_type(ddl)
    assert t.typename == name
    assert isinstance(mysql_to_spark_type(t), DataType)
    assert isinstance(mysql_to_spark_type(t, mode="strict"), DataType)


@given(enum_values)
@settings(max_examples=100, deadline=None)
def test_enum_value_roundtrip(values):
    ddl = "enum(" + ",".join(f"'{v}'" for v in values) + ")"
    assert parse_mysql_type(ddl).enumeration == values


@given(st.text(max_size=30))
@settings(max_examples=200, deadline=None)
def test_parser_is_total(garbage):
    """Arbitrary input either parses or raises MySQLTypeParseError —
    never a different exception (parity with the reference's parser
    failure contract)."""
    try:
        parse_mysql_type(garbage)
    except MySQLTypeParseError:
        pass
