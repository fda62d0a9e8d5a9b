from hbase_snapshotter_spark.functions.mysql_types import (  # noqa: F401
    MySQLDataType,
    parse_mysql_type,
    mysql_to_spark_type,
)
