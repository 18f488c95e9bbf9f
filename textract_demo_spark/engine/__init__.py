"""Spark pipeline layer: vectorized extraction UDFs, native-SQL field
rules, review-override join, IcebergLike table commits, metrics."""
